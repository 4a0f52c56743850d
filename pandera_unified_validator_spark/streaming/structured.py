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

from ..operators.validator import SparkValidator
from ..utils.reporting import ValidationMetrics

__all__ = ["StreamingValidationSink", "validate_stream"]


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
