"""Auto-fix operators (SURVEY.md §2.7 F1-F4).

The reference inferred fixes by regex-matching error-message strings
(``core/validator.py:209-248``) — fragile; here suggestions derive from the
STRUCTURED validation report (check kind + column), and fixers are lazy
Column transforms Catalyst fuses into one projection (F4's chained
``withColumn`` analogue, reference ``core/validator.py:153-157``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.compiler import spark_type
from ..plans.schema import ValidationSchema
from ..utils.reporting import ValidationReport

__all__ = ["FixSuggestion", "suggest_fixes", "apply_fixes"]


@dataclass(frozen=True)
class FixSuggestion:
    kind: str           # "add_missing_column" | "coerce_type" | "clamp_range" | "drop_violations"
    column: str
    description: str
    confidence: float
    fixer: Callable[[DataFrame], DataFrame]

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "column": self.column,
            "description": self.description,
            "confidence": self.confidence,
        }


def suggest_fixes(report: ValidationReport, schema: ValidationSchema) -> list[FixSuggestion]:
    """F1 — structured, not string-matched."""
    out: list[FixSuggestion] = []
    for err in report.errors:
        # schema-level errors carry structured prefixes from the validator
        if err.startswith("column ") and "missing from input" in err:
            col = err.split("'")[1]
            spec = schema.columns.get(col)
            if spec is None:
                continue
            dtype = spark_type(spec.dtype).simpleString()
            out.append(
                FixSuggestion(
                    kind="add_missing_column",
                    column=col,
                    description=f"add {col!r} as NULL {dtype} (F2)",
                    confidence=0.9,
                    fixer=lambda df, c=col, t=dtype: df.withColumn(
                        c, F.lit(None).cast(t)
                    ),
                )
            )
        elif err.startswith("column ") and "expected dtype" in err:
            col = err.split("'")[1]
            spec = schema.columns.get(col)
            if spec is None:
                continue
            dtype = spark_type(spec.dtype).simpleString()
            out.append(
                FixSuggestion(
                    kind="coerce_type",
                    column=col,
                    description=f"try_cast {col!r} to {dtype}; unparseable → NULL (F3)",
                    confidence=0.7,
                    fixer=lambda df, c=col, t=dtype: df.withColumn(
                        c, F.col(c).try_cast(t)
                    ),
                )
            )
    seen: set[tuple[str, str]] = set()
    for chk in report.failed_checks:
        spec = schema.columns.get(chk.column)
        if spec is None:
            continue
        # dedupe guards live INSIDE each kind's branch (no early continue),
        # so a column that already got one fix kind still reaches others
        if (
            chk.check in ("ge", "le", "gt", "lt")
            and spec.ge is not None
            and spec.le is not None
            and ("clamp_range", chk.column) not in seen
        ):
            # one clamp per column, even when both bounds failed
            seen.add(("clamp_range", chk.column))
            lo, hi = spec.ge, spec.le
            out.append(
                FixSuggestion(
                    kind="clamp_range",
                    column=chk.column,
                    description=f"clamp {chk.column!r} into [{lo}, {hi}]",
                    confidence=0.5,
                    # greatest/least SKIP nulls in Spark, so a bare clamp
                    # would silently rewrite NULL to the lower bound —
                    # invented data; a missing value is the not-null fix's
                    # job, not the range fix's. Preserve NULL explicitly.
                    fixer=lambda df, c=chk.column, a=lo, b=hi: df.withColumn(
                        c,
                        F.when(
                            F.col(c).isNotNull(),
                            F.least(F.greatest(F.col(c), F.lit(a)), F.lit(b)),
                        ),
                    ),
                )
            )
    return out


def apply_fixes(df: DataFrame, suggestions: list[FixSuggestion]) -> DataFrame:
    """F4: fold fixers; lazy — Catalyst fuses the chained projections."""
    for s in suggestions:
        df = s.fixer(df)
    return df
