"""Skew utilities + CLI surface tests."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from pandera_unified_validator_spark.functions.skew import (
    salted_group_count,
    salted_repartition,
    with_salt,
)
from pandera_unified_validator_spark.tokens import token_table


def test_salted_group_count_equivalence(spark):
    # 70% hot key 'web' — the exact skew profile of the token table
    df = token_table(spark, 5000)
    plain = {r["source"]: r["count"] for r in df.groupBy("source").count().collect()}
    salted = {
        r["source"]: r["count"]
        for r in salted_group_count(df, "source", buckets=16).collect()
    }
    assert salted == plain
    assert plain["web"] > 0.6 * 5000  # the hot key really is hot


def test_salted_repartition_spreads_hot_key(spark):
    df = token_table(spark, 4000).filter(F.col("source") == "web")
    # plain repartition by the hot key: every row lands in ONE partition
    plain = df.repartition(16, "source").withColumn(
        "p", F.spark_partition_id()
    ).select("p").distinct().count()
    salted = salted_repartition(df, "source", buckets=16, num_partitions=16).withColumn(
        "p", F.spark_partition_id()
    ).select("p").distinct().count()
    assert plain == 1
    assert salted >= 8  # hot key spread over most partitions


def test_with_salt_deterministic(spark):
    df = token_table(spark, 100)
    a = with_salt(df, 8, deterministic_by="doc_id").select("doc_id", "__salt")
    b = with_salt(df, 8, deterministic_by="doc_id").select("doc_id", "__salt")
    assert a.exceptAll(b).count() == 0


@pytest.fixture(scope="module")
def users_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "users.csv"
    p.write_text(
        "id,email,age\n"
        "1,a@x.com,30\n"
        "2,bad-email,45\n"
        "3,c@y.org,150\n"
    )
    return str(p)


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "pandera_unified_validator_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )


def test_cli_schema_then_validate(users_csv, tmp_path):
    schema_path = str(tmp_path / "schema.json")
    r = run_cli("schema", users_csv, "--format", "csv", "--exact", "--output", schema_path)
    assert r.returncode == 0, r.stderr[-2000:]
    schema = json.load(open(schema_path))
    cols = {c["name"] for c in schema["columns"]}
    assert {"id", "email", "age"} <= cols

    # tighten: age ≤ 120, email pattern → row 2 and 3 must fail
    schema["columns"] = [
        {"name": "id", "dtype": "int", "nullable": False, "unique": True},
        {"name": "email", "dtype": "str", "pattern": r"^[^@\s]+@[^@\s]+\.[a-z]+$"},
        {"name": "age", "dtype": "int", "ge": 0, "le": 120},
    ]
    with open(schema_path, "w") as f:
        json.dump(schema, f)
    report_path = str(tmp_path / "report.json")
    r2 = run_cli(
        "validate", users_csv, "--schema", schema_path, "--format", "csv",
        "--key", "id", "--output", report_path,
    )
    assert r2.returncode == 1  # invalid data → nonzero exit
    rep = json.load(open(report_path))
    by = {c["name"]: c["n_failed"] for c in rep["checks"]}
    assert by["email__pattern"] == 1 and by["age__le"] == 1
    assert rep["summary"]["n_invalid_rows"] == 2


def test_cli_profile(users_csv, tmp_path):
    out = str(tmp_path / "profile.json")
    r = run_cli("profile", users_csv, "--format", "csv", "--exact", "--output", out)
    assert r.returncode == 0, r.stderr[-2000:]
    prof = json.load(open(out))
    assert prof["n_rows"] == 3
    assert prof["columns"]["age"]["max"] == 150


def test_cli_dedup_and_sample(spark, tmp_path):
    src = str(tmp_path / "corpus")
    rows = [(i, "s1" if i % 2 else "s2", f"unique text number {i} padded") for i in range(40)]
    rows += [(100, "s1", "unique text number 1 padded")]   # exact dup of doc 1
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(src)

    out1 = str(tmp_path / "deduped")
    r = run_cli("dedup", src, "--output", out1, "--columns", "text", "--id", "doc_id")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "kept 40/41" in r.stdout.replace(",", "")
    deduped = spark.read.parquet(out1)
    ids = {x["doc_id"] for x in deduped.select("doc_id").collect()}
    assert 100 not in ids and 1 in ids            # min-doc_id survivor

    out2 = str(tmp_path / "near")
    r2 = run_cli("dedup", src, "--output", out2, "--near", "--threshold", "0.8",
                 "--num-hashes", "32", "--bands", "16")
    assert r2.returncode == 0, r2.stderr[-2000:]
    near = spark.read.parquet(out2)
    nids = {x["doc_id"] for x in near.select("doc_id").collect()}
    assert 100 not in nids and 1 in nids          # near-dup keep-one

    out3 = str(tmp_path / "sampled")
    r3 = run_cli("sample", src, "--output", out3, "--key", "doc_id",
                 "--strata", "source", "--fractions", "s1=1.0,s2=0.5")
    assert r3.returncode == 0, r3.stderr[-2000:]
    samp = spark.read.parquet(out3)
    by = {x["source"]: x["n"] for x in
          samp.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["s1"] == 21                          # whole stratum kept
    assert 0 < by.get("s2", 0) < 20                # ~half


def test_cli_text_corpus_dedup(spark, tmp_path):
    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("the same document body here")
    (d / "b.txt").write_text("the same document body here")
    (d / "c.txt").write_text("a different document entirely")
    out = str(tmp_path / "out")
    r = run_cli("dedup", str(d), "--format", "text", "--output", out,
                "--columns", "text", "--id", "doc_id")
    assert r.returncode == 0, r.stderr[-2000:]
    kept = spark.read.parquet(out)
    assert kept.count() == 2  # the two identical files collapse to one
