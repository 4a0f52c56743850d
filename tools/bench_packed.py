"""Packed-binary vs array<int32> token-validation microbenchmark.

Measures the decode-bound core of token validation (element-range + length
checks over every token) on the SAME data in two layouts:

* ``list``   — canonical ``tokens array<int32>`` parquet; checks as codegen
  ``array_min``/``array_max``/``size`` (the engine's default path);
* ``packed`` — 4 B/token little-endian ``binary`` parquet; checks via the
  ``mapInArrow`` kernel (one numpy view per Arrow batch, ``reduceat``
  extrema, zero per-row Python).

Both paths must agree on the violation counts (cross-checked) — only the
storage layout and decode machinery differ. Prints one JSON line; run on an
otherwise idle host (CLAUDE.md benchmarking rules).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_ROWS = int(os.environ.get("PUV_PACKED_ROWS", "12000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WARMUPS = int(os.environ.get("PUV_PACKED_WARMUPS", "2"))
RUNS = int(os.environ.get("PUV_PACKED_RUNS", "3"))
VOCAB = 50257


def main() -> None:
    from pandera_unified_validator_spark.functions.packed import (
        pack_tokens_udf,
        packed_n_tok,
        packed_token_stats,
    )
    from pandera_unified_validator_spark.session import get_spark
    from pandera_unified_validator_spark.tokens import token_table

    spark = get_spark(
        "bench-packed",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={CPUS}"
            ),
            "spark.sql.files.maxPartitionBytes": str(24 * 1024 * 1024),
        },
    )
    list_path = os.environ.get("PUV_SCALE_PATH", f"/tmp/puv_scale_input_{N_ROWS}")
    packed_path = f"/tmp/puv_packed_input_{N_ROWS}"
    if not os.path.exists(list_path):
        token_table(spark, N_ROWS, dirty=True, num_partitions=128).write.mode(
            "overwrite"
        ).parquet(list_path)
    if not os.path.exists(packed_path):
        pack = pack_tokens_udf()
        (
            spark.read.parquet(list_path)
            .select(
                "doc_id",
                pack(F.col("tokens")).alias("tokens_bin"),
                "n_tok",
                "source",
            )
            .write.mode("overwrite")
            .parquet(packed_path)
        )

    def list_job():
        df = spark.read.parquet(list_path)
        return df.agg(
            F.sum(
                (
                    ~(
                        (F.size("tokens") == 0)
                        | ((F.array_min("tokens") >= 0) & (F.array_max("tokens") < VOCAB))
                    )
                ).cast("long")
            ).alias("elem_fail"),
            F.sum((F.size("tokens") != F.col("n_tok")).cast("long")).alias("len_fail"),
            F.sum(F.size("tokens")).alias("n_tokens"),
        ).collect()[0]

    def packed_job():
        df = spark.read.parquet(packed_path)
        stats = packed_token_stats(df, "tokens_bin", id_col="n_tok")
        return stats.agg(
            F.sum(
                (
                    ~(
                        (F.col("n_tok_bin") == 0)
                        | ((F.col("min_tok") >= 0) & (F.col("max_tok") < VOCAB))
                    )
                ).cast("long")
            ).alias("elem_fail"),
            F.sum((F.col("n_tok_bin") != F.col("n_tok")).cast("long")).alias("len_fail"),
            F.sum("n_tok_bin").alias("n_tokens"),
        ).collect()[0]

    out = {"rows": N_ROWS, "cpus": CPUS}
    rows = {}
    for name, job in (("list", list_job), ("packed", packed_job)):
        for _ in range(WARMUPS):
            job()
        best, res = 1e9, None
        for _ in range(RUNS):
            t0 = time.time()
            res = job()
            best = min(best, time.time() - t0)
        rows[name] = res
        out[name] = {
            "sec": round(best, 3),
            "tokens_per_sec": round(res["n_tokens"] / best, 1),
            "elem_fail": int(res["elem_fail"]),
            "len_fail": int(res["len_fail"]),
        }
    assert rows["list"]["elem_fail"] == rows["packed"]["elem_fail"], "count mismatch"
    assert rows["list"]["len_fail"] == rows["packed"]["len_fail"], "count mismatch"
    assert rows["list"]["n_tokens"] == rows["packed"]["n_tokens"]
    out["speedup_packed_vs_list"] = round(out["list"]["sec"] / out["packed"]["sec"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
