"""Schema converters — reference API parity for ``SchemaBuilder.from_pydantic``
(reference ``core/schema.py:416-461``) and ``from_pandera``
(``core/schema.py:463-500``), plus record-payload validation
(``validate_records``, ``core/schema.py:561-578`` — vectorized here, never a
per-row loop).

pandera is not installed in this container; its converter is import-gated.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping

from .schema import ColumnSpec, ValidationSchema

__all__ = ["from_pydantic", "from_pandera", "validate_records"]

_PY_TYPE_TO_DTYPE = {
    "int": "int",
    "float": "float",
    "str": "str",
    "bool": "bool",
    "datetime": "datetime",
    "date": "date",
    "bytes": "binary",
}


def from_pydantic(model) -> ValidationSchema:
    """Pydantic v2 BaseModel → ValidationSchema.

    Maps field types, Optional-ness → nullable, and constraint metadata
    (ge/le/gt/lt/pattern) from Field(...) annotations.
    """
    import typing

    try:
        from pydantic import BaseModel
    except ImportError as e:  # pragma: no cover
        raise ImportError("pydantic not available") from e
    if not (isinstance(model, type) and issubclass(model, BaseModel)):
        raise TypeError("from_pydantic expects a pydantic BaseModel subclass")

    schema = ValidationSchema(metadata={"converted_from": f"pydantic:{model.__name__}"})
    for name, field in model.model_fields.items():
        ann = field.annotation
        nullable = False
        origin = typing.get_origin(ann)
        if origin is typing.Union or str(origin) == "types.UnionType":
            args = [a for a in typing.get_args(ann) if a is not type(None)]
            nullable = len(args) < len(typing.get_args(ann))
            ann = args[0] if args else str
        dtype = _PY_TYPE_TO_DTYPE.get(getattr(ann, "__name__", str(ann)), "str")
        kw: dict[str, Any] = {}
        for m in field.metadata:
            for attr in ("ge", "le", "gt", "lt"):
                v = getattr(m, attr, None)
                if v is not None:
                    kw[attr] = v
            pat = getattr(m, "pattern", None)
            if pat is not None:
                # Pydantic pattern = search-anywhere semantics
                kw["pattern"] = pat
                kw["pattern_search"] = True
        if not field.is_required() and field.default is None:
            nullable = True
        schema.add_column(
            ColumnSpec(name=name, dtype=dtype, nullable=nullable, **kw)
        )
    return schema


def from_pandera(pandera_schema) -> ValidationSchema:  # pragma: no cover - lib absent
    """pandera DataFrameSchema → ValidationSchema (import-gated: pandera is
    not shipped in this container; converter maps Column dtype/nullable/
    unique and the closed-form checks ge/le/gt/lt/isin/str_matches)."""
    try:
        import pandera  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "pandera is not installed; from_pandera requires it"
        ) from e
    schema = ValidationSchema(metadata={"converted_from": "pandera"})
    for name, col in pandera_schema.columns.items():
        kw: dict[str, Any] = {}
        for chk in col.checks:
            stats = getattr(chk, "statistics", None) or {}
            n = getattr(chk, "name", "")
            if n == "greater_than_or_equal_to":
                kw["ge"] = stats.get("min_value")
            elif n == "less_than_or_equal_to":
                kw["le"] = stats.get("max_value")
            elif n == "greater_than":
                kw["gt"] = stats.get("min_value")
            elif n == "less_than":
                kw["lt"] = stats.get("max_value")
            elif n == "isin":
                kw["isin"] = list(stats.get("allowed_values", ()))
            elif n == "str_matches":
                kw["pattern"] = stats.get("pattern")
        dtype = str(col.dtype).lower()
        label = (
            "int" if "int" in dtype
            else "float" if "float" in dtype or "double" in dtype
            else "bool" if "bool" in dtype
            else "datetime" if "time" in dtype
            else "str"
        )
        schema.add_column(
            ColumnSpec(
                name=name,
                dtype=label,
                nullable=bool(col.nullable),
                unique=bool(col.unique),
                **kw,
            )
        )
    return schema


def validate_records(
    spark,
    records: Mapping[str, Any] | Iterable[Mapping[str, Any]],
    schema: ValidationSchema,
    **validator_kw,
):
    """Validate in-memory payloads (dict → 1-row, list-of-dicts → frame;
    reference ``_prepare_payload`` core/validator.py:169-176) through the
    same vectorized engine — the record/frame split of the reference
    collapses into one path."""
    from ..operators.validator import SparkValidator
    from ..sources.readers import from_records

    df = from_records(spark, records, schema)
    return SparkValidator(schema, **validator_kw).validate(df)
