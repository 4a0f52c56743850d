"""SparkSession factory with scale-appropriate defaults.

Local mode here mirrors a multi-executor cluster's behavior via partitioning;
the same config block ships to ``spark-submit --py-files`` unchanged (the
master/shuffle-partition knobs come from the cluster there).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "pandera_unified_validator_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # shuffle partitions ≈ cores in local mode; a real cluster sets this to
    # 2-3× total executor cores (or relies on AQE coalescing from a high cap).
    n_shuffle = shuffle_partitions or (
        int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() else cpus
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("PUV_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # throughput GC: G1 (the JVM default) collapses under 32 allocation-
        # heavy executor threads in one JVM (array-column decode + HOFs were
        # 4-6x slower at local[32] than local[8]); ParallelGC restores linear
        # scaling for this batch-analytics profile.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # operator caches hold short-lived, registry-budgeted scratch whose
        # hot columns are high-entropy hashes (gram/minhash/bucket longs) —
        # columnar compression of those is pure CPU overhead (round 7 A/B:
        # quality_classifier 9.0->7.8s, dsir_select 8.3->6.4s at sf1.0; the
        # optimization guide makes the same call for high-entropy shuffle
        # payloads). Memory-tight deployments can re-enable via extra_conf.
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        # accept subset-key co-partitioning for joins (round 7): two sides
        # hash-partitioned on a FUNCTIONAL SUBSET of the join keys (e.g.
        # materialize_packed_bins' shard, derived from the id) can join and
        # feed a same-subset aggregate with ZERO extra exchanges. The
        # default (true) re-shuffles both sides on the full key set, which
        # put the token payload through a second exchange. Scale-safe: the
        # relaxation only applies when a side is already hash-partitioned
        # on a join-key subset, which in this engine is always a
        # deliberately derived, well-spread key.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
