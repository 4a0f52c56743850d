"""BPE bridge: closed-form merge order, lossless round-trip, determinism,
and composition with the structural token validator."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandera_unified_validator_spark.operators.bpe import (
    BpeModel,
    _encode_bytes,
    apply_bpe,
    decode_bpe,
    train_bpe,
)
from pandera_unified_validator_spark.operators.token_ops import (
    token_sequence_flags,
)


def test_train_bpe_closed_form_merge_order(spark):
    # corpus: "aa" x5, "ab" x3 — word reprs " aa"=[32,97,97], " ab"=[32,97,98]
    # pair counts: (32,97)=8, (97,97)=5, (97,98)=3 -> merge0=(32,97)->256
    #   (left-to-right merge consumes the first 97 of " aa")
    # then [256,97]x5 / [256,98]x3: (256,97)=5 -> merge1->257
    # then [257]x5 / [256,98]x3: (256,98)=3 -> merge2->258; no pairs left,
    # the 4th requested merge stops early
    df = spark.createDataFrame(
        [("aa " * 5 + "ab " * 3,)], "text string"
    )
    m = train_bpe(df, "text", num_merges=4, min_pair_count=1)
    assert m.merges == ((32, 97), (256, 97), (256, 98))
    assert m.vocab_size == 259
    # encode uses the same greedy lowest-rank semantics
    assert _encode_bytes(b" aa", m.ranks()) == [257]
    assert _encode_bytes(b" ab", m.ranks()) == [258]
    assert _encode_bytes(b" aab", m.ranks()) == [257, 98]
    # json round-trip preserves the model exactly
    assert BpeModel.from_json(m.to_json()) == m


def test_train_bpe_deterministic_under_partitioning(spark):
    rows = [(f"alpha beta gamma delta w{i % 7} text here",) for i in range(200)]
    a = train_bpe(
        spark.createDataFrame(rows, "text string").repartition(3), num_merges=50
    )
    b = train_bpe(
        spark.createDataFrame(rows, "text string").repartition(17), num_merges=50
    )
    assert a.merges == b.merges


def test_apply_decode_roundtrip_spark(spark):
    texts = [
        "Hello World  hello",
        "naïve café — ümlauts und 日本語 テスト",
        "  leading and trailing   ",
        "",
        None,
        "a" * 500,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    model = train_bpe(df, "text", num_merges=64, min_pair_count=1)
    enc = apply_bpe(df, model, "text", "tokens")
    dec = decode_bpe(enc, model, "tokens", "dec")
    from pandera_unified_validator_spark.operators.text import words

    got = (
        dec.withColumn("norm", F.array_join(words("text"), " "))
        .select("id", "tokens", "dec", "norm")
        .collect()
    )
    by_id = {r["id"]: r for r in got}
    for i, t in enumerate(texts):
        r = by_id[i]
        if t is None:
            assert r["tokens"] is None and r["dec"] is None
        else:
            assert r["dec"] == r["norm"], (t, r["dec"], r["norm"])
    # composition: the produced sequences pass the structural validator
    flagged = token_sequence_flags(
        enc.filter(F.col("text").isNotNull()),
        n_tok_col=None,
        vocab_size=model.vocab_size,
    )
    assert flagged.filter(~F.col("seq_ok")).count() == 0


def test_decode_rejects_foreign_ids(spark):
    # negative sentinels (-1 / -100 pads) must fail loudly, not wrap via
    # Python negative indexing into the last merge's bytes
    m = BpeModel(merges=((32, 97),))
    df = spark.createDataFrame([([32, -1],), ([999],)], "tokens array<int>")
    with pytest.raises(Exception, match="outside"):
        decode_bpe(df.limit(1), m, "tokens").collect()
    with pytest.raises(Exception, match="outside"):
        decode_bpe(df, m, "tokens").collect()


def test_zero_merges_is_raw_bytes_and_merges_monotone(spark):
    df = spark.createDataFrame([("the cat sat on the mat the cat",)], "text string")
    m0 = BpeModel(merges=())
    n0 = (
        apply_bpe(df, m0, "text")
        .select(F.size("tokens").alias("n"))
        .collect()[0]["n"]
    )
    # raw bytes: every word costs len(utf8)+1 (the boundary space)
    norm = "the cat sat on the mat the cat"
    assert n0 == sum(len(w.encode()) + 1 for w in norm.split(" "))
    prev = n0
    for k in (2, 8, 32):
        mk = train_bpe(df, num_merges=k, min_pair_count=1)
        nk = (
            apply_bpe(df, mk, "text")
            .select(F.size("tokens").alias("n"))
            .collect()[0]["n"]
        )
        assert nk <= prev
        prev = nk


def test_apply_bpe_under_structured_streaming(spark, tmp_path):
    # the bridge is a stateless Arrow projection, so it must run unchanged
    # under a file-source stream — the continuous-tokenization shape
    src = tmp_path / "bpe_stream_in"
    df = spark.createDataFrame(
        [(f"d{i}", f"stream doc number {i} with shared words") for i in range(40)],
        "doc_id string, text string",
    )
    df.write.mode("overwrite").parquet(str(src))
    model = train_bpe(df, "text", num_merges=32)
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src) + "/*.parquet")
    enc = apply_bpe(stream, model, "text", "tokens").select(
        "doc_id", F.size("tokens").alias("n")
    )
    q = (
        enc.writeStream.format("memory")
        .queryName("puv_bpe_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"]: r["n"] for r in spark.table("puv_bpe_stream").collect()}
    want = {
        r["doc_id"]: r["n"]
        for r in apply_bpe(df, model, "text", "tokens")
        .select("doc_id", F.size("tokens").alias("n"))
        .collect()
    }
    assert got == want and len(got) == 40


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
    ),
    st.integers(0, 40),
)
def test_encode_bytes_roundtrip_property(text, k):
    # pure-python property: any learned prefix of merges decodes back to
    # the exact byte sequence (no Spark session per example)
    words_ = [w for w in text.strip().split() if w]
    norm = " ".join(w.lower() for w in words_)
    # toy "training": merges from the text's own pair stats
    from collections import Counter

    ids_all = []
    for w in norm.split(" ") if norm else []:
        ids_all.append(list(b" " + w.encode("utf-8")))
    merges = []
    for _ in range(k):
        c = Counter()
        for ids in ids_all:
            for i in range(len(ids) - 1):
                c[(ids[i], ids[i + 1])] += 1
        if not c:
            break
        best_count = max(c.values())
        best = min(p for p, n in c.items() if n == best_count)
        from pandera_unified_validator_spark.operators.bpe import _merge_ids

        nid = 256 + len(merges)
        merges.append(best)
        ids_all = [_merge_ids(ids, best[0], best[1], nid) for ids in ids_all]
    model = BpeModel(merges=tuple(merges))
    ranks = model.ranks()
    tb = model.token_bytes()
    for w in norm.split(" ") if norm else []:
        ids = _encode_bytes(b" " + w.encode("utf-8"), ranks)
        assert all(0 <= i < model.vocab_size for i in ids)
        assert b"".join(tb[i] for i in ids) == b" " + w.encode("utf-8")
