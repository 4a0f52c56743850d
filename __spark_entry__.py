"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship full-check validation; ``queries()`` /
``oracle_sql()`` expose one entry per implemented operator (SURVEY.md §2),
each paired with a DuckDB-runnable ANSI-SQL oracle. Implementation lives in
``pandera_unified_validator_spark/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pandera_unified_validator_spark.queries import QUERIES, entry_query  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles; keys match ``queries()`` (rows-only checks omitted)."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
