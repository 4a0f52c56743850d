"""Packed-binary token codec tests: round-trip fidelity and the mapInArrow
stats kernel vs the plain array<int32> oracle (F.size/array_min/array_max)."""

from pyspark.sql import functions as F

from pandera_unified_validator_spark.functions.packed import (
    pack_tokens_udf,
    packed_n_tok,
    packed_token_stats,
    unpack_tokens_udf,
)
from pandera_unified_validator_spark.tokens import token_table


def _packed(spark, n=3000):
    df = token_table(spark, n, dirty=True, num_partitions=4)
    pack = pack_tokens_udf()
    return df.select(
        "doc_id", "tokens", pack(F.col("tokens")).alias("tokens_bin")
    )


def test_pack_unpack_roundtrip(spark):
    p = _packed(spark)
    unpack = unpack_tokens_udf()
    bad = p.select(
        (F.col("tokens") != unpack(F.col("tokens_bin"))).alias("diff")
    ).filter("diff").count()
    assert bad == 0
    # codegen n_tok from blob length matches array size
    mism = p.filter(packed_n_tok("tokens_bin") != F.size("tokens")).count()
    assert mism == 0


def test_packed_token_stats_matches_array_oracle(spark):
    # join key must be unique: the dirty table injects duplicate doc_ids,
    # so key rows by a deterministic hash of position-independent content +
    # an explicit unique rid
    p = _packed(spark).withColumn(
        "rid", F.xxhash64("doc_id", F.coalesce(F.hex(F.col("tokens_bin")), F.lit("")))
    )
    # inject edge rows: NULL blob and empty blob
    extra = spark.createDataFrame(
        [("nullrow", None, None, -1), ("emptyrow", [], b"", -2)],
        "doc_id string, tokens array<int>, tokens_bin binary, rid long",
    )
    p = p.unionByName(extra).dropDuplicates(["rid"])

    stats = packed_token_stats(p, "tokens_bin", id_col="rid")
    oracle = p.select(
        "rid",
        "doc_id",
        F.size("tokens").alias("n_arr"),
        F.array_min("tokens").alias("mn"),
        F.array_max("tokens").alias("mx"),
    )
    j = stats.join(oracle, "rid")
    # n: equal where blob non-null (size() yields -1 for NULL array)
    assert j.filter(
        (F.col("n_tok_bin").isNotNull())
        & (F.col("n_tok_bin") != F.greatest(F.col("n_arr"), F.lit(0)))
    ).count() == 0
    assert j.filter(
        F.col("min_tok").isNotNull() & (F.col("min_tok") != F.col("mn"))
    ).count() == 0
    assert j.filter(
        F.col("max_tok").isNotNull() & (F.col("max_tok") != F.col("mx"))
    ).count() == 0
    row = {r["rid"]: r for r in stats.filter("rid in (-1, -2)").collect()}
    assert row[-1]["n_tok_bin"] is None
    assert row[-2]["n_tok_bin"] == 0
    assert row[-2]["min_tok"] is None and row[-2]["max_tok"] is None
