"""Deterministic hash-threshold sampling tests."""

from pyspark.sql import functions as F

from pandera_unified_validator_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)


def _ids(df):
    return {r["id"] for r in df.select("id").collect()}


def test_deterministic_and_partition_invariant(spark):
    base = spark.range(10000).withColumn("id", F.col("id").cast("long"))
    a = _ids(deterministic_sample(base.repartition(3), "id", 0.3))
    b = _ids(deterministic_sample(base.repartition(17), "id", 0.3))
    assert a == b                                   # placement-independent
    assert 0.25 < len(a) / 10000 < 0.35             # ~fraction
    c = _ids(deterministic_sample(base, "id", 0.3, seed=7))
    assert c != a                                   # seeds independent


def test_samples_are_nested(spark):
    base = spark.range(5000)
    small = _ids(deterministic_sample(base, "id", 0.1))
    big = _ids(deterministic_sample(base, "id", 0.4))
    assert small <= big and len(small) < len(big)


def test_null_keys_never_selected(spark):
    df = spark.createDataFrame([(None,), ("k1",), ("k2",)], "k string")
    out = deterministic_sample(df, "k", 1.0).collect()
    assert len(out) == 2 and all(r["k"] is not None for r in out)


def test_stratified_sample(spark):
    df = spark.range(6000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "books")
        .otherwise("junk")
        .alias("source"),
    )
    out = stratified_sample(df, "source", {"web": 1.0, "books": 0.5}, "id")
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["web"] == 2000                        # fraction 1.0 keeps all
    assert "junk" not in by                         # default 0.0 drops
    assert 800 < by["books"] < 1200                 # ~half
    # stratified selection agrees with the flat sampler per stratum
    flat = _ids(deterministic_sample(df.filter("source = 'books'"), "id", 0.5))
    strat = _ids(out.filter("source = 'books'"))
    assert flat == strat
