"""Schema-converter tests (Pydantic → ValidationSchema, record payloads)."""

import pytest

from pandera_unified_validator_spark.plans.convert import (
    from_pydantic,
    validate_records,
)


def make_model():
    from pydantic import BaseModel, Field

    class User(BaseModel):
        id: int = Field(ge=0)
        email: str = Field(pattern=r"@")
        age: int | None = Field(default=None, ge=0, le=120)
        active: bool = True

    return User


def test_from_pydantic_maps_fields():
    schema = from_pydantic(make_model())
    assert schema.columns["id"].ge == 0 and not schema.columns["id"].nullable
    assert schema.columns["age"].nullable and schema.columns["age"].le == 120
    assert schema.columns["email"].pattern == "@"
    assert schema.columns["email"].pattern_search  # Pydantic = search-anywhere
    assert schema.columns["active"].dtype == "bool"


def test_from_pydantic_rejects_non_model():
    with pytest.raises(TypeError):
        from_pydantic(dict)


def test_validate_records_end_to_end(spark):
    schema = from_pydantic(make_model())
    good = {"id": 1, "email": "a@x.com", "age": 30, "active": True}
    bad = {"id": -5, "email": "nope", "age": 130, "active": False}
    res = validate_records(spark, [good, bad], schema)
    assert not res.is_valid
    by = {c.name: c.n_failed for c in res.report.checks}
    assert by["id__ge"] == 1
    assert by["email__pattern"] == 1  # search-anywhere: 'nope' has no '@'
    assert by["age__le"] == 1
    assert res.report.n_invalid_rows == 1
    # single dict payload (reference: dict → 1-row frame)
    res1 = validate_records(spark, good, schema)
    assert res1.is_valid and res1.report.n_rows == 1


def test_from_pandera_import_gate():
    try:
        import pandera  # noqa: F401

        pytest.skip("pandera installed; gate not exercised")
    except ImportError:
        pass
    from pandera_unified_validator_spark.plans.convert import from_pandera

    with pytest.raises(ImportError):
        from_pandera(object())
