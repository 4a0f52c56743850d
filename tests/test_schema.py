"""Schema core unit tests (no Spark) — mirrors reference
tests/test_core/test_schema_builder.py (builder, round-trip)."""

import pytest

from pandera_unified_validator_spark import SchemaBuilder, ValidationSchema
from pandera_unified_validator_spark.plans.schema import ColumnSpec, CustomCheck


def build_users_schema():
    # FIXTURES.md F2 — the reference's canonical 6-column schema
    return (
        SchemaBuilder("users")
        .column("id", "int", nullable=False, unique=True, ge=0)
        .column("email", "str", nullable=False,
                pattern=r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$")
        .column("age", "int", nullable=False, ge=0, le=120)
        .column("score", "float", nullable=False, ge=0.0, le=100.0)
        .column("active", "bool", nullable=False)
        .column("created_at", "datetime", nullable=False)
        .build()
    )


def test_builder_shapes():
    s = build_users_schema()
    assert set(s.columns) == {"id", "email", "age", "score", "active", "created_at"}
    assert s.columns["id"].unique and not s.columns["id"].nullable
    assert s.columns["age"].le == 120


def test_json_round_trip():
    s = build_users_schema()
    s.cross_checks = s.cross_checks  # no-op
    b = SchemaBuilder("orders")
    b.column("a", "int", ge=1).column("b", "int")
    b.cross_column_check("a_lt_b", sql="a < b")
    b.conditional_check("only_pos_when_active", "b > 0", "a > 0")
    s2 = b.build()
    restored = ValidationSchema.from_json(s2.to_json())
    assert restored.to_dict() == s2.to_dict()
    assert restored.columns["a"].ge == 1
    assert restored.cross_checks[0].sql == "a < b"
    assert restored.conditional_checks[0].check_sql == "a > 0"


def test_custom_check_validation():
    with pytest.raises(ValueError):
        CustomCheck(name="bad")  # neither sql nor fn
    with pytest.raises(ValueError):
        ColumnSpec(name="x", dtype="wat")
    with pytest.raises(Exception):
        ColumnSpec(name="x", dtype="str", pattern="[unclosed")
