"""Catalyst plan-statistics helpers — free (no job) size estimates used by
the auto-tier operators (unique-auto, embedding near-dup) to pick a plan
shape before launching any job."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["plan_size_bytes"]


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's plan-estimated size of ``df``'s relation in bytes — file
    sizes for file scans, cached bytes for InMemoryRelation. Free (no job);
    None when the estimate is unavailable (e.g. Spark Connect) or is the
    unknown-size sentinel (Long.MaxValue)."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - non-JVM backends
        return None
    return size if 0 <= size < (1 << 62) else None
