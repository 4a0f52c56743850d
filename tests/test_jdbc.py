"""S5 (DB cursor / JDBC) — LIVE integration test against embedded Apache
Derby (bundled with pyspark's jars; no server process needed, the engine
runs inside the driver/executor JVM, which local-mode tasks share).

Upgrades S5 from signature-level to a tested path: write a table out over
JDBC, read it back through ``read_jdbc``'s range-partitioned scan, and
assert both the data round-trip and that the scan really was split into
the requested number of partitions (the reference drained its DB cursor
single-threaded, core/streaming.py:284-327 — partitioned parallel read is
the Spark-side point).
"""

import pytest
from pyspark.sql import functions as F

from pandera_unified_validator_spark.sources.readers import read_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("derby")
    # keep derby.log out of the repo root
    spark._jvm.System.setProperty("derby.stream.error.file", str(tmp / "derby.log"))
    return f"jdbc:derby:{tmp}/puvdb;create=true"


def test_jdbc_roundtrip_range_partitioned(spark, derby_url):
    src = spark.range(0, 200).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7).cast("int").alias("n_tok"),
    )
    (
        src.coalesce(1)  # one writer connection; embedded Derby is single-db
        .write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "seqs")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    back = read_jdbc(
        spark,
        derby_url,
        "seqs",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=200,
        properties={"driver": DERBY_DRIVER},
    )
    assert back.rdd.getNumPartitions() == 4
    got = sorted((r["id"], r["doc_id"], r["n_tok"]) for r in back.collect())
    exp = sorted((r["id"], r["doc_id"], r["n_tok"]) for r in src.collect())
    assert got == exp


def test_jdbc_pushdown_filter(spark, derby_url):
    """Catalyst pushes the filter into the JDBC source (PushedFilters) — the
    DB does the filtering, not Spark."""
    back = read_jdbc(
        spark, derby_url, "seqs", properties={"driver": DERBY_DRIVER}
    ).filter(F.col("n_tok") > 3)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_tok" in plan
    assert back.count() == sum(1 for i in range(200) if i % 7 > 3)
