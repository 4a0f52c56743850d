"""Deterministic, engine-portable corpus sampling.

No reference analogue (SURVEY.md §2.8 scope fence) — but a training-data
pipeline at 10^12 rows cannot use ``rand()``-based sampling for anything it
ever needs to reproduce: Spark's ``rand``/``sample`` seed per *partition*,
so the selected rows change whenever partitioning changes (repartition, AQE,
task retry, a different cluster), and no other engine can replay them.

Hash-threshold sampling fixes all of that: a row is selected iff
``uniform_hash(seed, key) < fraction``, where the hash depends only on the
ROW CONTENT (its key), never on physical placement. Properties that matter:

* **stable** — the same rows are selected on every run, any partitioning,
  any cluster size, and after appends (old rows keep their verdict: the
  basis of incremental reprocessing and consistent train/eval splits);
* **replayable anywhere** — the hash is ``md5("{seed}|" + key)``'s first 8
  hex digits as an integer, computable bit-identically by DuckDB/Postgres/
  anything (this repo's DuckDB oracle replays it);
* **scalable** — a pure filter expression: no shuffle, no state, composes
  under column pruning; md5 is JVM-side codegen;
* **nested** — for one seed, the fraction-0.1 sample is a SUBSET of the
  fraction-0.3 sample (thresholds on the same hash), so a growing training
  mix only ever ADDS rows.

NULL keys are never selected (their hash is NULL, and ``NULL < t`` is not
true) — nullability is a validation concern, not a sampling one.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sample_hash", "deterministic_sample", "stratified_sample"]

_HASH_SPAN = 1 << 32  # first 8 md5 hex digits → uniform on [0, 2^32)


def sample_hash(key: Column | str, seed: int = 42) -> Column:
    """Uniform 32-bit hash of (seed, key) — ``md5`` so any SQL engine can
    replay it. NULL key → NULL."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    return int(fraction * _HASH_SPAN)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows, selected by content hash of ``key_col``
    (see module docstring for why not ``df.sample``). Exactly reproducible;
    different ``seed`` values give independent samples of the same data."""
    return df.where(sample_hash(key_col, seed) < F.lit(_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 50% of web, 100% of books, drop the rest): one codegen CASE
    picks each row's threshold from ``fractions[strata_col]``
    (``default_fraction`` otherwise), compared against the same content
    hash. Single pass, no shuffle; a NULL stratum takes the default."""
    thr: Column = F.lit(_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_threshold(frac))).otherwise(thr)
    return df.where(sample_hash(key_col, seed) < thr)
