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
