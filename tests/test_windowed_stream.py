"""Watermarked windowed streaming validation test (memory sink drains a
parquet-backed stream synchronously)."""

import datetime as dt

from pyspark.sql import functions as F

from pandera_unified_validator_spark import SchemaBuilder, SparkValidator
from pandera_unified_validator_spark.streaming.structured import (
    windowed_error_rates,
)


def test_windowed_error_rates(spark, tmp_path):
    src = str(tmp_path / "winsrc")
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # window 0: 4 valid; window 1: 2 valid + 2 invalid (value=-1)
    for i in range(4):
        rows.append((base + dt.timedelta(minutes=1, seconds=i), 1.0))
    for i in range(2):
        rows.append((base + dt.timedelta(minutes=6, seconds=i), 2.0))
    for i in range(2):
        rows.append((base + dt.timedelta(minutes=6, seconds=30 + i), -1.0))
    spark.createDataFrame(rows, "ts timestamp, value double").write.parquet(src)

    schema = SchemaBuilder("s").column("value", "float", ge=0.0).build()
    stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
    out = windowed_error_rates(stream, SparkValidator(schema), "ts", window="5 minutes")
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["window"]["start"].minute: (r["n_rows"], r["n_invalid"], r["value__ge"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert got[0] == (4, 0, 0)
    assert got[5] == (4, 2, 2)


def test_streaming_skips_unique_check(spark, tmp_path):
    src = str(tmp_path / "uniqsrc")
    spark.createDataFrame([(1, 1.0), (1, 2.0)], "id int, value double").write.parquet(src)
    schema = (
        SchemaBuilder("s")
        .column("id", "int", unique=True)
        .column("value", "float", ge=0.0)
        .build()
    )
    stream = spark.readStream.schema("id int, value double").parquet(src)
    v = SparkValidator(schema)
    annotated, checks, _ = v.annotate(stream)
    names = [c.name for c in checks]
    assert "value__ge" in names and "id__unique" not in names
    # batch path still has it
    batch = spark.read.parquet(src)
    _, bchecks, _ = v.annotate(batch)
    assert "id__unique" in [c.name for c in bchecks]


def test_stateful_error_monitor(spark, tmp_path):
    """applyInPandasWithState: per-key running totals persist across
    micro-batches; the breaker flag trips once the cumulative error rate
    crosses the threshold and stays tripped."""
    from pandera_unified_validator_spark.streaming.structured import (
        stateful_error_monitor,
    )

    src = str(tmp_path / "statesrc")
    # file 1: clean batch for both keys; file 2: key 'b' goes 100% bad
    spark.createDataFrame(
        [("a", 1.0)] * 5 + [("b", 1.0)] * 5, "k string, value double"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("a", 2.0)] * 5 + [("b", -1.0)] * 15, "k string, value double"
    ).coalesce(1).write.mode("append").parquet(src)

    schema = SchemaBuilder("s").column("value", "float", ge=0.0).build()
    stream = (
        spark.readStream.schema("k string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_error_monitor(
        stream, SparkValidator(schema), "k", error_threshold=0.5, min_rows=10
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM state_out").collect()
    # final state per key = max total_rows row (batch order is not guaranteed,
    # but totals are order-independent after the drain)
    final = {}
    for r in rows:
        if r["key"] not in final or r["total_rows"] > final[r["key"]]["total_rows"]:
            final[r["key"]] = r
    assert final["a"]["total_rows"] == 10 and final["a"]["total_invalid"] == 0
    assert final["a"]["tripped"] is False
    assert final["b"]["total_rows"] == 20 and final["b"]["total_invalid"] == 15
    assert final["b"]["tripped"] is True
    assert final["b"]["error_rate"] == 0.75


def test_cross_batch_unique_monitor(spark, tmp_path):
    """Bloom-filter stateful uniqueness monitor: keys repeated in a LATER
    micro-batch are flagged as probable dups (state survives across
    batches), within-batch repeats are flagged too, and fresh keys are
    never flagged (one-sided error)."""
    from pandera_unified_validator_spark.streaming.structured import (
        cross_batch_unique_monitor,
    )

    src = str(tmp_path / "uniqsrc")
    spark.createDataFrame(
        [(f"k{i}",) for i in range(10)], "k string"
    ).coalesce(1).write.mode("append").parquet(src)
    import time as _t
    _t.sleep(1.1)  # distinct mtimes -> deterministic batch order
    spark.createDataFrame(
        [(f"k{i}",) for i in range(5, 10)] + [("k100",), ("k100",)], "k string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = cross_batch_unique_monitor(stream, "k", n_buckets=4, bloom_bits=1 << 16)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("uniq_out")
        .option("checkpointLocation", str(tmp_path / "uq_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM uniq_out").collect()
    final = {}
    for r in rows:
        if r["bucket"] not in final or r["total_rows"] > final[r["bucket"]]["total_rows"]:
            final[r["bucket"]] = r
    assert sum(r["total_rows"] for r in final.values()) == 17
    # 5 cross-batch repeats (k5..k9) + 1 within-batch repeat (second k100)
    assert sum(r["total_probable_dups"] for r in final.values()) == 6
    assert all(0.0 <= r["fill_ratio"] < 0.01 for r in final.values())
    assert all(r["saturated"] is False for r in final.values())
    # flagged keys name the offenders (union over batches per bucket)
    flagged = set()
    for r in rows:
        flagged.update(r["flagged"])
    assert flagged == {"k5", "k6", "k7", "k8", "k9", "k100"}


def test_cross_batch_monitor_saturation_flag(spark, tmp_path):
    """A stream that outgrows its filter must SAY so: overfilling a tiny
    64-bit filter with hundreds of distinct keys drives fill_ratio toward
    1.0, so the estimated FP rate fill^probes crosses the threshold and
    ``saturated`` flips TRUE (the round-4 monitor reported fill_ratio but
    degraded toward flagging everything silently)."""
    from pandera_unified_validator_spark.streaming.structured import (
        cross_batch_unique_monitor,
    )

    src = str(tmp_path / "satsrc")
    spark.createDataFrame(
        [(f"key{i}",) for i in range(400)], "k string"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    out = cross_batch_unique_monitor(stream, "k", n_buckets=1, bloom_bits=64)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("sat_out")
        .option("checkpointLocation", str(tmp_path / "sat_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sat_out").collect()
    assert rows and all(r["saturated"] is True for r in rows)
    assert all(r["fill_ratio"] > 0.65 for r in rows)


def test_bloom_config_sizing():
    """bloom_config applies the standard formulas, rounds bits up to a
    power of two (double-hash stride requirement), and its configs keep
    the estimated FP near the request."""
    import math

    from pandera_unified_validator_spark.streaming.structured import bloom_config

    cfg = bloom_config(1_600_000, fp_rate=0.01, n_buckets=16)
    assert cfg["n_buckets"] == 16
    assert cfg["bloom_bits"] & (cfg["bloom_bits"] - 1) == 0  # power of two
    per_shard = 100_000
    assert cfg["bloom_bits"] >= -per_shard * math.log(0.01) / math.log(2) ** 2
    # k ≈ (m/n)·ln2 probes; realized FP (1-e^{-kn/m})^k must be ≤ target
    k, m = cfg["n_probes"], cfg["bloom_bits"]
    fp = (1 - math.exp(-k * per_shard / m)) ** k
    assert fp <= 0.01
    import pytest

    with pytest.raises(ValueError):
        bloom_config(0)
    with pytest.raises(ValueError):
        bloom_config(10, fp_rate=1.5)


def test_windowed_validation_drops_late_data(spark, tmp_path):
    """Watermark semantics end-to-end: once the watermark passes a window's
    end, a late event for that window is DROPPED — the closed window's
    emitted counts exclude it (append mode only emits closed windows)."""
    from pandera_unified_validator_spark.streaming.structured import (
        windowed_error_rates,
    )

    src = str(tmp_path / "late_src")
    # batch 1: three in-window events + one far-future event that advances
    # the max event time to 100s (watermark -> 90s, closing window [0,10))
    spark.createDataFrame(
        [(0.0, 1.0), (3.0, -1.0), (5.0, 2.0), (100.0, 1.0)],
        "sec double, value double",
    ).selectExpr("timestamp_seconds(sec) AS ts", "value").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    schema = SchemaBuilder("s").column("value", "float", ge=0.0).build()
    stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
    out = windowed_error_rates(
        stream, SparkValidator(schema), "ts",
        window="10 seconds", watermark="10 seconds",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .start()
    )
    q.processAllAvailable()          # batch 1 only: watermark advances to 90s
    # the LATE event arrives in a strictly later batch
    spark.createDataFrame(
        [(4.0, -9.0)], "sec double, value double"
    ).selectExpr("timestamp_seconds(sec) AS ts", "value").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT window.start AS ws, n_rows, n_invalid FROM late_out"
    ).collect()
    emitted = {int(r["ws"].timestamp()): (r["n_rows"], r["n_invalid"]) for r in rows}
    # only [0,10) closed; its counts are batch 1's three events — the late
    # value=-9.0 would have made n_invalid 2 if it had leaked in
    assert emitted == {0: (3, 1)}


def test_bloom_config_feeds_monitor_kwargs(spark, tmp_path):
    """bloom_config output plugs straight into cross_batch_unique_monitor
    (the documented usage) — keys and value domains line up."""
    from pandera_unified_validator_spark.streaming.structured import (
        bloom_config,
        cross_batch_unique_monitor,
    )

    src = str(tmp_path / "bc_src")
    spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string").coalesce(
        1
    ).write.parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    out = cross_batch_unique_monitor(stream, "k", **bloom_config(10_000, 0.01, 4))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("bc_out")
        .option("checkpointLocation", str(tmp_path / "bc_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM bc_out").collect()
    assert sum(r["batch_rows"] for r in rows) == 50
    assert all(r["probable_dups"] == 0 and r["saturated"] is False for r in rows)
