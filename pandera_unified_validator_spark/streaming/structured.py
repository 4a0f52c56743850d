"""Structured Streaming validation (S4: async record stream,
reference ``core/streaming.py:255-282``).

The reference buffered an async dict iterator into pandas chunks; the Spark
shape is ``readStream → foreachBatch(validate)``: each micro-batch runs the
same one-pass check plan, verdicts accumulate into ``ValidationMetrics`` on
the driver, and violation rows can be teed to a sink for quarantine.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.validator import FLAG_PREFIX, SparkValidator
from ..utils.reporting import ValidationMetrics

__all__ = [
    "StreamingValidationSink",
    "validate_stream",
    "windowed_error_rates",
    "stateful_error_monitor",
]


class StreamingValidationSink:
    """foreachBatch target: validates each micro-batch, accumulates metrics.

    ``violations_path`` (optional) appends failing rows + labels as parquet —
    the quarantine pattern for a training-data ingest pipeline.
    """

    def __init__(
        self,
        validator: SparkValidator,
        violations_path: str | None = None,
        on_batch: Callable[[int, ValidationMetrics], None] | None = None,
    ) -> None:
        self.validator = validator
        self.violations_path = violations_path
        self.on_batch = on_batch
        self.metrics = ValidationMetrics()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        res = self.validator.validate(batch_df)
        fails = {c.name: c.n_failed for c in res.report.checks if c.n_failed}
        self.metrics.update(
            res.report.n_rows - res.report.n_invalid_rows,
            res.report.n_invalid_rows,
            fails,
        )
        if self.violations_path and res.report.n_invalid_rows:
            (
                res.violations()
                .withColumn("failed_checks", F.concat_ws(",", F.array_sort("failed_checks")))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(self.violations_path)
            )
        if self.on_batch:
            self.on_batch(batch_id, self.metrics)


def windowed_error_rates(
    stream_df: DataFrame,
    validator: SparkValidator,
    ts_col: str,
    *,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-event-time-window validation quality: watermarked tumbling/sliding
    windows aggregating row-pass/fail counts per check — the streaming
    analogue of the per-partition verdict (late data handled by the
    watermark; output is append-safe once windows close).

    Returns a streaming DataFrame (window, n_rows, n_invalid, error_rate,
    <one fail-count column per check>). Caller attaches a sink.
    """
    annotated, checks, _ = validator.annotate(stream_df)
    flag_names = [c.name for c in checks]
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((~F.col("__puv_row_ok")).cast("long")).alias("n_invalid"),
    ] + [
        F.sum((~F.col(FLAG_PREFIX + n)).cast("long")).alias(n) for n in flag_names
    ]
    return (
        annotated.withWatermark(ts_col, watermark)
        .groupBy(win.alias("window"))
        .agg(*aggs)
        .withColumn("error_rate", F.col("n_invalid") / F.col("n_rows"))
    )


def stateful_error_monitor(
    stream_df: DataFrame,
    validator: SparkValidator,
    key_col: str,
    *,
    error_threshold: float = 0.2,
    min_rows: int = 100,
) -> DataFrame:
    """Custom STATEFUL streaming operator (``applyInPandasWithState``): per
    ``key_col`` group (e.g. ``source``), carry running validation totals
    across micro-batches and trip a sticky circuit-breaker flag once the
    cumulative error rate exceeds ``error_threshold`` (after ``min_rows``
    rows) — the streaming analogue of the runner's early-termination
    breaker, with state Spark checkpoints and restores for exactly-once
    recovery. Rows are validated by the usual one-pass check plan BEFORE
    keyed grouping, so the Python state function only sees (key, ok) pairs,
    never payload columns.

    Returns a streaming DataFrame (key, batch_rows, batch_invalid,
    total_rows, total_invalid, error_rate, tripped); attach with output
    mode "update".
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    annotated, _checks, _ = validator.annotate(stream_df)
    sel = annotated.select(
        F.col(key_col).cast("string").alias("key"),
        F.col("__puv_row_ok").alias("__ok"),
    )
    out_schema = (
        "key string, batch_rows long, batch_invalid long, total_rows long, "
        "total_invalid long, error_rate double, tripped boolean"
    )
    state_schema = "total_rows long, total_invalid long, tripped boolean"

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            total_rows, total_invalid, tripped = state.get
        else:
            total_rows, total_invalid, tripped = 0, 0, False
        batch_rows = batch_invalid = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            batch_invalid += int((~pdf["__ok"].astype(bool)).sum())
        total_rows += batch_rows
        total_invalid += batch_invalid
        rate = total_invalid / total_rows if total_rows else 0.0
        tripped = bool(
            tripped or (total_rows >= min_rows and rate > error_threshold)
        )
        state.update((total_rows, total_invalid, tripped))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "batch_rows": [batch_rows],
                "batch_invalid": [batch_invalid],
                "total_rows": [total_rows],
                "total_invalid": [total_invalid],
                "error_rate": [rate],
                "tripped": [tripped],
            }
        )

    return sel.groupBy("key").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def validate_stream(
    stream_df: DataFrame,
    validator: SparkValidator,
    *,
    violations_path: str | None = None,
    checkpoint_location: str | None = None,
    on_batch: Callable[[int, ValidationMetrics], None] | None = None,
):
    """Attach validation to a streaming DataFrame; returns (query, sink).

    Caller drives the query (``processAllAvailable()`` for batch-drain tests,
    ``awaitTermination()`` in production).
    """
    sink = StreamingValidationSink(validator, violations_path, on_batch)
    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.start(), sink
