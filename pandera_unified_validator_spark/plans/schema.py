"""Declarative validation schema core (engine-agnostic, no Spark imports).

Re-expresses the reference's schema layer (reference: ``core/schema.py:51-410``
— ``ColumnSpec`` dataclass at :51-66, ``UnifiedSchema`` at :182-191, fluent
``SchemaBuilder`` at :291-410, JSON round-trip at :231-288) as a single
declarative model that later compiles to PySpark ``Column`` expressions
(see ``plans/compiler.py``).

Deliberate semantic choices vs the reference (documented per SURVEY.md §2):

* The reference's pandera/Pydantic dual stage collapses into ONE set of named
  checks (``core/schema.py:553-578`` kept both a record model and a frame
  schema that re-checked the same constraints).
* ``pattern`` is anchored at the start (pandera ``str_matches`` semantics,
  reference ``core/schema.py:80-81``); Pydantic's search-anywhere variant is
  available via ``pattern_search=True``.
* Conditional constraints are *implemented* (the reference collected them in
  the builder at ``core/schema.py:373-394`` but never emitted them — dead
  code; we fix that per SURVEY.md §2.3 U3).
* Checks evaluate over non-null values (pandera semantics): a NULL passes
  every value check; nullability is enforced separately by ``nullable``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Sequence

__all__ = [
    "DTYPES",
    "ColumnSpec",
    "CustomCheck",
    "CrossColumnCheck",
    "ConditionalCheck",
    "ValidationSchema",
    "SchemaBuilder",
]

# Logical dtype lattice. The reference supports exactly six primitive labels
# (DTYPE_MAP, core/schema.py:33-48); we add array<int>/array<float>/binary for
# the token table (BASELINE.json input_hint) and multimodal columns.
DTYPES = (
    "int",
    "float",
    "str",
    "bool",
    "datetime",
    "date",
    "array<int>",
    "array<float>",
    "binary",
)


@dataclass(frozen=True)
class CustomCheck:
    """A named custom check on one column.

    Exactly one of ``sql`` or ``fn`` is set:

    * ``sql`` — a SQL boolean expression over the column, referenced as ``{c}``
      (e.g. ``"length({c}) > 3"``). Compiled to a native Catalyst expression —
      the fast path.
    * ``fn`` — ``Callable[[pd.Series], pd.Series]`` boolean mask, run as an
      Arrow-vectorized pandas_udf (never row-at-a-time Python).
      Mirrors reference ``core/schema.py:142-157``.
    """

    name: str
    sql: str | None = None
    fn: Callable | None = None

    def __post_init__(self) -> None:
        if (self.sql is None) == (self.fn is None):
            raise ValueError(f"check {self.name!r}: set exactly one of sql / fn")


@dataclass(frozen=True)
class CrossColumnCheck:
    """A named check over multiple columns (reference core/schema.py:160-167).

    ``sql`` is a boolean expression over raw column names
    (e.g. ``"end_ts > start_ts"``); ``fn`` is ``Callable[[pd.DataFrame],
    pd.Series]`` over ``columns`` run via Arrow pandas_udf.
    """

    name: str
    columns: tuple[str, ...] = ()
    sql: str | None = None
    fn: Callable | None = None

    def __post_init__(self) -> None:
        if (self.sql is None) == (self.fn is None):
            raise ValueError(f"check {self.name!r}: set exactly one of sql / fn")
        if self.fn is not None and not self.columns:
            raise ValueError(f"check {self.name!r}: fn checks must name columns")


@dataclass(frozen=True)
class ConditionalCheck:
    """WHEN ``condition_sql`` holds, ``check_sql`` must hold (else auto-pass).

    Reference declared but never enforced these (core/schema.py:170-179,
    373-394 — dead code); we implement the declared semantics:
    ``NOT condition OR check``.
    """

    name: str
    condition_sql: str
    check_sql: str


@dataclass
class ColumnSpec:
    """Per-column spec. Mirrors reference ``core/schema.py:51-66`` plus
    array-element constraints for the token table."""

    name: str
    dtype: str = "str"
    nullable: bool = True
    unique: bool = False
    ge: float | int | str | None = None
    le: float | int | str | None = None
    gt: float | int | str | None = None
    lt: float | int | str | None = None
    pattern: str | None = None
    pattern_search: bool = False  # True → Pydantic search-anywhere semantics
    isin: Sequence[Any] | None = None
    # array-element constraints (token table: 0 <= token < vocab)
    element_ge: float | int | None = None
    element_lt: float | int | None = None
    custom_checks: tuple[CustomCheck, ...] = ()
    description: str | None = None

    def __post_init__(self) -> None:
        if self.dtype not in DTYPES:
            raise ValueError(f"column {self.name!r}: unknown dtype {self.dtype!r}")
        if self.pattern is not None:
            re.compile(self.pattern)  # fail fast on bad regex

    # -- serialization (reference core/schema.py:231-288) ------------------
    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"name": self.name, "dtype": self.dtype}
        for k in ("nullable", "unique", "pattern_search"):
            v = getattr(self, k)
            if v != ColumnSpec.__dataclass_fields__[k].default:
                d[k] = v
        for k in ("ge", "le", "gt", "lt", "pattern", "element_ge", "element_lt", "description"):
            v = getattr(self, k)
            if v is not None:
                d[k] = v
        if self.isin is not None:
            d["isin"] = list(self.isin)
        if self.custom_checks:
            d["custom_checks"] = [
                {"name": c.name, "sql": c.sql} for c in self.custom_checks if c.sql
            ]
        return d

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "ColumnSpec":
        d = dict(d)
        checks = tuple(
            CustomCheck(name=c["name"], sql=c["sql"]) for c in d.pop("custom_checks", [])
        )
        isin = d.pop("isin", None)
        return cls(
            **{k: v for k, v in d.items() if k in cls.__dataclass_fields__},
            **({"isin": tuple(isin)} if isin is not None else {}),
            **({"custom_checks": checks} if checks else {}),
        )


@dataclass
class ValidationSchema:
    """The unified schema: column specs + table-level checks + metadata.

    Replaces the reference's (Pydantic model, pandera DataFrameSchema) pair
    (``core/schema.py:553-559``) with one structure that compiles to a single
    vectorized Spark plan.
    """

    columns: dict[str, ColumnSpec] = field(default_factory=dict)
    cross_checks: tuple[CrossColumnCheck, ...] = ()
    conditional_checks: tuple[ConditionalCheck, ...] = ()
    strict: bool = False  # True → unknown columns are an error (pandera strict)
    metadata: dict[str, Any] = field(default_factory=dict)

    # -- construction -------------------------------------------------------
    def add_column(self, spec: ColumnSpec) -> "ValidationSchema":
        self.columns[spec.name] = spec
        return self

    # -- serialization round-trip (reference core/schema.py:231-288) -------
    def to_dict(self) -> dict[str, Any]:
        return {
            "columns": [c.to_dict() for c in self.columns.values()],
            "cross_checks": [
                {"name": c.name, "columns": list(c.columns), "sql": c.sql}
                for c in self.cross_checks
                if c.sql
            ],
            "conditional_checks": [
                {
                    "name": c.name,
                    "condition_sql": c.condition_sql,
                    "check_sql": c.check_sql,
                }
                for c in self.conditional_checks
            ],
            "strict": self.strict,
            "metadata": self.metadata,
        }

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "ValidationSchema":
        return cls(
            columns={c["name"]: ColumnSpec.from_dict(c) for c in d.get("columns", [])},
            cross_checks=tuple(
                CrossColumnCheck(name=c["name"], columns=tuple(c.get("columns", ())), sql=c["sql"])
                for c in d.get("cross_checks", [])
            ),
            conditional_checks=tuple(
                ConditionalCheck(**c) for c in d.get("conditional_checks", [])
            ),
            strict=bool(d.get("strict", False)),
            metadata=dict(d.get("metadata", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "ValidationSchema":
        return cls.from_dict(json.loads(s))


class SchemaBuilder:
    """Fluent builder, mirroring reference ``core/schema.py:291-410``."""

    def __init__(self, name: str | None = None) -> None:
        self._schema = ValidationSchema(metadata={"name": name} if name else {})

    def column(self, name: str, dtype: str = "str", **kw: Any) -> "SchemaBuilder":
        custom = kw.pop("custom_checks", ())
        self._schema.add_column(ColumnSpec(name=name, dtype=dtype, custom_checks=tuple(custom), **kw))
        return self

    def custom_check(self, column: str, name: str, *, sql: str | None = None,
                     fn: Callable | None = None) -> "SchemaBuilder":
        spec = self._schema.columns[column]
        spec.custom_checks = spec.custom_checks + (CustomCheck(name=name, sql=sql, fn=fn),)
        return self

    def cross_column_check(self, name: str, *, sql: str | None = None,
                           columns: Sequence[str] = (), fn: Callable | None = None) -> "SchemaBuilder":
        self._schema.cross_checks = self._schema.cross_checks + (
            CrossColumnCheck(name=name, columns=tuple(columns), sql=sql, fn=fn),
        )
        return self

    def conditional_check(self, name: str, condition_sql: str, check_sql: str) -> "SchemaBuilder":
        self._schema.conditional_checks = self._schema.conditional_checks + (
            ConditionalCheck(name=name, condition_sql=condition_sql, check_sql=check_sql),
        )
        return self

    def strict(self, value: bool = True) -> "SchemaBuilder":
        self._schema.strict = value
        return self

    def build(self) -> ValidationSchema:
        return self._schema
