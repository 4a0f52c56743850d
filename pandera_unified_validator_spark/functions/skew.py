"""Skew mitigation utilities (north rule: "skew on hot sources handled by
salted repartitioning and AQE").

AQE's skew-join/partition-coalescing handles most runtime skew; explicit
salting is for the cases AQE cannot fix — a groupBy on a hot key (70% of a
10^12-row table sharing ``source='web'`` lands on one reducer) — by
two-phase aggregation over a salted key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_repartition", "salted_group_count"]

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int, deterministic_by: str | None = None) -> DataFrame:
    """Add a salt column in [0, buckets). ``deterministic_by`` derives the
    salt from a column hash (reproducible runs, e.g. for tests/resume);
    otherwise it spreads by partition+position via monotonically_increasing_id.
    """
    if deterministic_by is not None:
        salt = F.pmod(F.xxhash64(deterministic_by), F.lit(buckets)).cast("int")
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")
    return df.withColumn(SALT_COL, salt)


def salted_repartition(
    df: DataFrame,
    key: str,
    buckets: int,
    num_partitions: int | None = None,
    salt_by: str | None = None,
) -> DataFrame:
    """Hash-repartition on (key, salt) so one hot key spreads over ``buckets``
    partitions instead of melting one reducer. The salt must NOT derive from
    ``key`` (a hot key would map to one salt); it comes from ``salt_by``
    (e.g. the row's primary key — deterministic) or row position."""
    salted = with_salt(df, buckets, deterministic_by=salt_by)
    args = ([num_partitions] if num_partitions else []) + [F.col(key), F.col(SALT_COL)]
    return salted.repartition(*args)


def salted_group_count(df: DataFrame, key: str, buckets: int = 64) -> DataFrame:
    """Two-phase count per key: groupBy(key, salt) partial → groupBy(key)
    final. The first shuffle spreads the hot key over ``buckets`` reducers;
    the second moves only (distinct keys × buckets) pre-aggregated rows.
    Equivalent result to ``df.groupBy(key).count()``."""
    salted = with_salt(df, buckets)
    partial = salted.groupBy(key, SALT_COL).agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("count"))
