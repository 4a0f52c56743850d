"""Byte-level BPE tokenization bridge (text → ``array<int>`` → text).

The engine's token operators consume pre-tokenized ``array<int>``
sequences (the north-star table shape, BASELINE.json ``input_hint``);
this module PRODUCES them from raw text at corpus scale — the
byte-pair-encoding of Sennrich et al. 2016 with the GPT-2-style
byte-level base alphabet, so every string round-trips losslessly
(``decode(encode(s)) == s`` exactly, for any UTF-8 text).

Tokenization is defined over the engine's standard normalized form
(``operators.text.words`` — trim, whitespace-split, lowercase — joined
by single spaces), and every word is represented as ``b" " + utf8``
bytes (the space carries the boundary, GPT-2 style), so merges never
cross word boundaries and decode is a plain byte concat.

Reference scope: the reference validates record payloads
(``core/validator.py``) and has no tokenizer; this is part of the
beyond-reference token-pipeline surface.

Scale shape (100 TB):

* :func:`train_bpe`'s only distributed stage is the word-frequency
  aggregate (explode → map-side-combined groupBy → top-``vocab_words``
  — the ``unigram_lm`` shape). The merge loop runs on the driver over
  the collected bounded (word, freq) table — the classic algorithm
  operates on this table, never the corpus — with incremental
  pair-count maintenance (only words containing the merged pair are
  touched per round).
* :func:`apply_bpe` / :func:`decode_bpe` are Arrow-batched pandas UDFs
  with the merge table shipped read-only in the closure; zero shuffle.
  A per-batch word→ids memo exploits the Zipf distribution: each
  DISTINCT word is merged once per batch, not once per occurrence.
"""

from __future__ import annotations

import json
from collections import Counter, defaultdict
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words

__all__ = ["BpeModel", "train_bpe", "apply_bpe", "decode_bpe"]


@dataclass(frozen=True)
class BpeModel:
    """Learned merge list. Id space: ``0..255`` are raw bytes;
    ``256 + i`` is the token produced by ``merges[i]`` (a pair of
    already-assigned ids), so the model is fully determined by the
    merge order and decodes by unrolling."""

    merges: tuple[tuple[int, int], ...]

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def ranks(self) -> dict[tuple[int, int], int]:
        return {pair: i for i, pair in enumerate(self.merges)}

    def token_bytes(self) -> list[bytes]:
        tb = [bytes([i]) for i in range(256)]
        for a, b in self.merges:
            tb.append(tb[a] + tb[b])
        return tb

    def to_json(self) -> str:
        return json.dumps({"merges": [list(p) for p in self.merges]})

    @classmethod
    def from_json(cls, s: str) -> "BpeModel":
        return cls(merges=tuple(tuple(p) for p in json.loads(s)["merges"]))


def _merge_ids(ids: list[int], a: int, b: int, new_id: int) -> list[int]:
    """Replace every non-overlapping (a, b) occurrence left-to-right."""
    out: list[int] = []
    i, n = 0, len(ids)
    while i < n:
        if i < n - 1 and ids[i] == a and ids[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(ids[i])
            i += 1
    return out


def _encode_bytes(bts: bytes, ranks: dict[tuple[int, int], int]) -> list[int]:
    """Classic BPE apply: repeatedly merge the lowest-rank adjacent pair."""
    ids = list(bts)
    while len(ids) >= 2:
        best_rank = None
        best_pair = None
        for i in range(len(ids) - 1):
            r = ranks.get((ids[i], ids[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (ids[i], ids[i + 1])
        if best_pair is None:
            break
        ids = _merge_ids(ids, best_pair[0], best_pair[1], 256 + best_rank)
    return ids


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 512,
    vocab_words: int = 65536,
    min_pair_count: int = 2,
) -> BpeModel:
    """Learn ``num_merges`` byte-level merges from the corpus.

    Deterministic under any partitioning: the word-frequency table is
    collected ordered by ``(freq DESC, word ASC)`` and capped at
    ``vocab_words`` (classic BPE trains on the word-frequency table —
    truncating the Zipf tail changes counts negligibly and bounds the
    driver); each round merges the (count, then lexicographically
    smallest) pair and stops early when the best count falls below
    ``min_pair_count``.
    """
    freq_rows = (
        df.select(F.explode(words(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__f"))
        .orderBy(F.col("__f").desc(), F.col("__w"))
        .limit(vocab_words)
        .collect()
    )
    # word reprs as mutable id lists; incremental pair-count index
    table: list[tuple[list[int], int]] = [
        (list(b" " + r["__w"].encode("utf-8")), r["__f"]) for r in freq_rows
    ]
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[int, int], set[int]] = defaultdict(set)
    for wi, (ids, f) in enumerate(table):
        for i in range(len(ids) - 1):
            p = (ids[i], ids[i + 1])
            pair_counts[p] += f
            pair_words[p].add(wi)

    merges: list[tuple[int, int]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        if best_count < min_pair_count:
            break
        best = min(p for p, c in pair_counts.items() if c == best_count)
        new_id = 256 + len(merges)
        merges.append(best)
        for wi in list(pair_words[best]):
            ids, f = table[wi]
            for i in range(len(ids) - 1):
                p = (ids[i], ids[i + 1])
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(wi)
            ids = _merge_ids(ids, best[0], best[1], new_id)
            table[wi] = (ids, f)
            for i in range(len(ids) - 1):
                p = (ids[i], ids[i + 1])
                pair_counts[p] += f
                pair_words[p].add(wi)
    return BpeModel(merges=tuple(merges))


def apply_bpe(
    df: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    out_col: str = "tokens",
    *,
    normalize: bool = True,
) -> DataFrame:
    """Append ``out_col`` = BPE token ids of ``text_col``.

    With ``normalize=True`` the text first passes through the engine's
    standard normalization IN SPARK (``array_join(words(text), ' ')``)
    so the Python side never re-implements Java's lower/split semantics
    — the UDF receives space-joined words and splits on the single
    space. NULL text stays NULL (the line_dedup NULL-preservation
    convention)."""
    ranks = model.ranks()

    @F.pandas_udf("array<int>")
    def _enc(s: pd.Series) -> pd.Series:
        memo: dict[str, list[int]] = {}

        def enc_one(t):
            if t is None:
                return None
            if not t:
                return []
            out: list[int] = []
            for w in t.split(" "):
                ids = memo.get(w)
                if ids is None:
                    ids = _encode_bytes(b" " + w.encode("utf-8"), ranks)
                    memo[w] = ids
                out.extend(ids)
            return out

        return s.map(enc_one)

    src = F.array_join(words(text_col), " ") if normalize else F.col(text_col)
    # array_join(NULL) is NULL only for a NULL array — words() maps NULL
    # text to NULL, so nullness is preserved through normalization
    return df.withColumn(out_col, _enc(src))


def decode_bpe(
    df: DataFrame,
    model: BpeModel,
    tokens_col: str = "tokens",
    out_col: str = "text_decoded",
) -> DataFrame:
    """Append ``out_col`` = the exact normalized text the ids encode
    (byte concat, one leading boundary space stripped). NULL tokens →
    NULL; ids outside the model's vocab raise (a decode of foreign ids
    is a caller bug, not data to pass through silently)."""
    tb = model.token_bytes()
    n_vocab = len(tb)

    @F.pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        def dec_one(ids):
            if ids is None:
                return None
            # ids arrive as a numpy array via Arrow — no bare truthiness
            if len(ids) and (min(ids) < 0 or max(ids) >= n_vocab):
                # negative ids would silently wrap via Python indexing
                # (tb[-1] is the LAST merge) — a foreign sentinel like a
                # -1/-100 pad must fail loudly, as the contract promises
                raise ValueError(
                    f"decode_bpe: id outside [0, {n_vocab}) in {ids[:8]}..."
                )
            raw = b"".join(tb[i] for i in ids)
            t = raw.decode("utf-8")
            return t[1:] if t.startswith(" ") else t

        return s.map(dec_one)

    return df.withColumn(out_col, _dec(F.col(tokens_col)))
