"""kmeans_embeddings + semdedup vs pure-python oracles."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandera_unified_validator_spark.operators.clustering import (
    kmeans_embeddings,
    semdedup,
)
from pandera_unified_validator_spark.utils.cache import operator_cache_scope


def _py_kmeans(rows, k, iters, seed=42):
    """Replays the operator's exact arithmetic: md5-rank init, argmin over
    sum(c²) − 2·x·c with lowest-index ties, per-dim mean update (empty
    cluster keeps its centroid), final assignment + cosine-to-centroid."""
    ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows], dtype="float64")

    def h(i):
        return int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8], 16)

    order = sorted(range(len(ids)), key=lambda j: (h(ids[j]), ids[j]))[:k]
    cents = X[order].copy()

    def assign(c):
        score = (c * c).sum(1)[None, :] - 2.0 * (X @ c.T)
        return score.argmin(1)

    for _ in range(iters):
        a = assign(cents)
        nxt = cents.copy()
        for ci in range(len(cents)):
            m = X[a == ci]
            if len(m):
                nxt[ci] = m.mean(0)
        cents = nxt
    a = assign(cents)
    cn = np.sqrt((cents * cents).sum(1))
    xn = np.sqrt((X * X).sum(1))
    ccos = {}
    for j, i in enumerate(ids):
        den = xn[j] * cn[a[j]]
        ccos[i] = float(X[j] @ cents[a[j]] / den) if den > 0 else None
    return cents, {i: int(a[j]) for j, i in enumerate(ids)}, ccos


def test_kmeans_matches_python_oracle(spark):
    rng = np.random.RandomState(7)
    centers = np.array([[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 5.0, 0]])
    rows = [
        (int(i), (centers[i % 3] + rng.standard_normal(4) * 0.2).tolist())
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigned = kmeans_embeddings(df, k=3, iters=2, seed=42)
    exp_cents, exp_assign, exp_ccos = _py_kmeans(rows, 3, 2)
    got = {r["vec_id"]: r for r in assigned.collect()}
    assert np.allclose(cents, exp_cents, atol=1e-9)
    for i, _ in rows:
        assert got[i]["cluster"] == exp_assign[i], i
        assert abs(got[i]["ccos"] - exp_ccos[i]) < 1e-9, i


def test_semdedup_keeps_least_central(spark):
    """One cluster of three mutually-near-identical vectors: the keep rule
    must retain the member with the LOWEST cosine to the centroid (the
    outlier), not the min id. Distant singleton rows keep unconditionally;
    NULL vectors keep with a NULL cluster."""
    base = np.array([1.0, 0.0, 0.0, 0.0])
    off = np.array([0.96, 0.28, 0.0, 0.0])  # cos(base, off) ≈ 0.96
    rows = [
        (0, base.tolist()),
        (1, base.tolist()),
        (2, off.tolist()),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with operator_cache_scope():
        out = {
            r["vec_id"]: r
            for r in semdedup(df, k=2, iters=2, threshold=0.9, seed=42).collect()
        }
    trio = [out[0], out[1], out[2]]
    assert len({r["semdedup_cluster"] for r in trio}) == 1
    kept = [r["vec_id"] for r in trio if r["semdedup_keep"]]
    # centroid = mean of the trio, pulled toward base: the off vector has
    # the lowest cosine-to-centroid and must be the survivor
    assert kept == [2]
    assert out[3]["semdedup_keep"] is True
    assert out[4]["semdedup_keep"] is True and out[4]["semdedup_cluster"] is None


def test_semdedup_hot_cluster_star_still_dedups(spark, caplog):
    """A cluster of identical vectors larger than max_cluster_rows: the LSH
    split can't separate identical vectors, the kernel emits the linear
    star, and keep-one still retains exactly one row."""
    v = [0.6, 0.8, 0.0, 0.0]
    rows = [(int(i), list(v)) for i in range(6)] + [(10, [0.0, 0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with operator_cache_scope():
        with caplog.at_level("WARNING"):
            out = semdedup(
                df, k=2, iters=1, threshold=0.99, seed=42, max_cluster_rows=2
            ).collect()
    assert any("hot cluster" in r.message for r in caplog.records)
    kept = sorted(r["vec_id"] for r in out if r["semdedup_keep"])
    # identical vectors: ccos ties at 1.0 → min-id tiebreak keeps 0
    assert kept == [0, 10]


def test_kmeans_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no rows"):
        kmeans_embeddings(df, k=2)


def test_kmeans_shrinks_k_to_corpus(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    cents, assigned = kmeans_embeddings(df, k=5, iters=1)
    assert cents.shape == (2, 2)
    assert assigned.count() == 2
