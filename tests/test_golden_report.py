"""Golden report-shape test — the analogue of the reference's committed
output/validation_report.json fixture: the full report dict for the
deterministic dirty token table is pinned (volatile fields masked), so any
unintentional change to report structure or verdict values fails loudly."""

import json

from pandera_unified_validator_spark import SparkValidator
from pandera_unified_validator_spark.tokens import (
    expected_dirty_counts,
    source_dim,
    token_schema,
    token_table,
)

N = 2000

GOLDEN_SUMMARY = {
    "n_rows": 2000,
    "n_invalid_rows": 14,
    "n_checks": 12,
    "n_failed_checks": 8,
}

GOLDEN_FAILS = {
    "doc_id__not_null": 2,
    "doc_id__pattern": 0,
    "tokens__not_null": 0,
    "tokens__element_range": 2,
    "n_tok__not_null": 0,
    "n_tok__ge": 1,
    "n_tok__le": 1,
    "source__not_null": 0,
    "source__isin": 2,
    "table__tokens_len_matches": 6,
    "doc_id__unique": 4,
    "source__referential": 2,
}


def test_golden_report_shape_and_values(spark):
    df = token_table(spark, N, dirty=True, num_partitions=4)
    res = SparkValidator(
        token_schema(), ref_checks={"source": source_dim(spark)}, key_columns=("doc_id",)
    ).validate(df)
    d = res.report.to_dict()

    # structure: exact top-level keys
    assert set(d) == {
        "is_valid", "summary", "checks", "errors", "warnings", "metadata", "timestamp",
    }
    assert d["is_valid"] is False
    got_summary = {k: d["summary"][k] for k in GOLDEN_SUMMARY}
    assert got_summary == GOLDEN_SUMMARY
    got_fails = {c["name"]: c["n_failed"] for c in d["checks"]}
    # golden counts (doc_id__unique and source checks overlap with the
    # exactly-computable expected_dirty_counts — cross-check both ways)
    exp = expected_dirty_counts(N)
    for name, n in exp.items():
        assert got_fails[name] == n
    assert got_fails == GOLDEN_FAILS
    # every check record carries the full field set
    for c in d["checks"]:
        assert set(c) == {
            "name", "column", "check", "n_failed", "n_checked", "passed", "samples",
        }
        assert c["n_checked"] == N
    # report is JSON-serializable end-to-end
    assert json.loads(res.report.to_json())["summary"]["n_rows"] == N
