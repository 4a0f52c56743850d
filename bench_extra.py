"""Round-7 optimization harness: per-query isolated timing + plan capture.

NOT the driver bench (bench.py is frozen for measurement) — this file exists
for guide §1 work: time individual queries with fresh plans (best-of-N after
warmups), optionally through the noop sink so the computation is timed
rather than the collect, and dump ``.explain("formatted")`` for the plan
diff trail in ``plans/r07/``.

Usage:
  python bench_extra.py time  <sf_dir> <query> [query ...]   # solo timings
  python bench_extra.py plans <sf_dir> <out_dir> <suffix> [query ...]
  PUV_BENCH_RUNS=3 PUV_BENCH_WARMUPS=1 PUV_BENCH_NOOP=0 control the loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pandera_unified_validator_spark.session import get_spark  # noqa: E402
from pandera_unified_validator_spark.utils.cache import (  # noqa: E402
    operator_cache_scope,
)


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark("puv-bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)


def time_queries(sf_dir: str, names: list[str]) -> None:
    from pandera_unified_validator_spark.queries import QUERIES

    spark = _spark()
    runs = int(os.environ.get("PUV_BENCH_RUNS", "3"))
    warmups = int(os.environ.get("PUV_BENCH_WARMUPS", "1"))
    noop = os.environ.get("PUV_BENCH_NOOP", "0") == "1"
    out: dict[str, dict] = {}
    for name in names:
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for i in range(warmups + runs):
            t0 = time.time()
            with operator_cache_scope():
                df = fn(spark, sf_dir)
                if noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
            dt = round(time.time() - t0, 3)
            if i >= warmups:
                samples.append(dt)
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))
    spark.stop()


def dump_plans(sf_dir: str, out_dir: str, suffix: str, names: list[str]) -> None:
    from pandera_unified_validator_spark.queries import QUERIES

    spark = _spark()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _ = QUERIES[name]
        with operator_cache_scope():
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_ex} Exchange -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "time":
        time_queries(sys.argv[2], sys.argv[3:])
    elif mode == "plans":
        dump_plans(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5:])
    else:
        raise SystemExit(f"unknown mode {mode!r}")
