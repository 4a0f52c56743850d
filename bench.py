"""Benchmark harness: headline engine operations at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Extras include validated sequences/sec on the deterministic synthetic token
table (the BASELINE.json throughput metric). Scaling evidence across two
parallelism levels lives in tools/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pandera_unified_validator_spark.session import get_spark  # noqa: E402


def _token_bench(spark, n_rows: int) -> dict:
    """Full north-star check suite over the synthetic token table:
    null/range/pattern/isin + uniqueness + referential + element-range +
    cross-column, one engine pass. Returns throughput numbers."""
    from pandera_unified_validator_spark import SparkValidator
    from pandera_unified_validator_spark.tokens import (
        source_dim,
        token_schema,
        token_table,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    df = token_table(spark, n_rows, dirty=True, num_partitions=cpus * 4)
    validator = SparkValidator(
        token_schema(), ref_checks={"source": source_dim(spark)}, key_columns=("doc_id",)
    )
    # materialize input once so generation cost is excluded from the
    # validation-throughput number (generation is itself measured separately)
    t0 = time.time()
    df = df.persist()
    n_tokens = df.selectExpr("sum(size(tokens)) s").collect()[0]["s"]
    gen_sec = time.time() - t0

    # one untimed warmup (tiered JIT of the generated check code), then best
    # of 2 — matches the steady-state methodology of tools/bench_scaling.py
    validator.validate(df)
    val_sec = 1e9
    for _ in range(2):
        t1 = time.time()
        res = validator.validate(df)
        val_sec = min(val_sec, time.time() - t1)
    assert res.report.n_rows == n_rows
    df.unpersist()
    return {
        "token_rows": n_rows,
        "token_count": int(n_tokens),
        "token_gen_sec": round(gen_sec, 3),
        "token_validate_sec": round(val_sec, 3),
        "sequences_per_sec": round(n_rows / val_sec, 1),
        "tokens_per_sec": round(n_tokens / val_sec, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    token_rows = int(os.environ.get("PUV_BENCH_TOKEN_ROWS", "1000000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    spark = get_spark("puv-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    from pandera_unified_validator_spark.queries import QUERIES, entry_query

    timings: dict[str, float] = {}

    # untimed session warmup: first query otherwise pays JVM/codegen startup
    entry_query(spark, sf_dir).collect()

    # headline: every driver-contract query at sf_dir (collect forces full
    # plan); each query's operator-level persists release at scope exit so
    # a 50+-query session never accretes cached plans
    from pandera_unified_validator_spark.utils.cache import operator_cache_scope

    for name, (fn, _sql) in QUERIES.items():
        t0 = time.time()
        with operator_cache_scope():
            fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_query(spark, sf_dir).collect()
    timings["entry_flagship"] = round(time.time() - t0, 3)

    extras = _token_bench(spark, token_rows)
    timings["token_validation"] = extras["token_validate_sec"]

    # surface the recorded N->4N executor scaling evidence (produced by
    # tools/bench_scaling.py --standalone; one cache per executor shape —
    # see BENCH/BASELINE.md for the headroom vs saturating protocols)
    import glob

    scaling = None
    caches = sorted(
        glob.glob(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH",
                "scaling_standalone*.json",
            )
        )
        # the supplementary shuffle-heavy corpus-operator reading
        # (duplicated_ngram_coverage; see BENCH/BASELINE.md) — exclude the
        # preserved root-disk-artifact file, it documents the sandbox, not
        # the engine
        + glob.glob(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH",
                "scaling_token_ops_[0-9]c.json",
            )
        )
    )
    if caches:
        scaling = {"protocol": "standalone executor processes (see BENCH/BASELINE.md)"}
        for p in caches:
            with open(p) as f:
                rec = json.load(f)
            cores = rec.get("exec_cores", "?")
            # token-op records carry an "operator" tag; keep their keys
            # distinct from the validator job's at the same core shape
            tag = " corpus-op" if rec.get("operator") else ""
            for k, v in rec.get("summary", {}).items():
                scaling[f"{k} @{cores}c{tag}"] = v["scaling_efficiency"]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "validation_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }
    if scaling:
        out["executor_scaling_efficiency"] = scaling
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
