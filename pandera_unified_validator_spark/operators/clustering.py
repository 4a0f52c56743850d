"""Embedding clustering + semantic dedup (SemDeDup).

SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public technique, used by
the DataComp / Meta curation lineage): k-means the corpus embeddings, then
within each cluster drop all but one of every group of semantically
near-identical documents (pairwise cosine above a threshold), keeping the
member LEAST similar to its cluster centroid — the diversity-preserving
keep rule of the paper. No reference analogue; first-class per the task
brief ("embedding-cosine near-dup" / similarity family).

100 TB shape:
* k-means state is k×d floats on the DRIVER (k=100k × d=768 ≈ 600 MB at
  production scale — broadcast-feasible; the per-batch assignment is one
  numpy float64 matmul, ``n_batch × d @ d × k``).
* Each Lloyd iteration is ONE corpus pass: an Arrow-vectorized assignment
  UDF (no per-row Python) feeding a posexplode → groupBy(cluster, dim)
  per-dimension sum — map-side partial aggregation means only k·d rows per
  partition cross the shuffle; the new centroids (k·d doubles) collect to
  the driver.
* The within-cluster pair stage reuses ``dedup._emit_cosine_pairs`` — the
  same bounded applyInPandas kernel as ``embedding_near_dup_pairs``: HOT
  clusters (> ``max_cluster_rows``) are split by a seeded hyperplane LSH
  signature IN the shuffle key, so no task ever materializes an unbounded
  cluster; sub-clusters still over the cap emit the linear min-id star.
  Cross-sub-cluster pairs inside a hot cluster are missed — a bounded
  recall cost, documented not silent (driver warning), and in production
  ``k`` is sized so clusters stay far below the cap.
* Everything is deterministic and cross-engine replayable: centroid init =
  the k rows with the smallest ``md5(seed|id)`` (the engine-replayable
  hash trick shared with ``sampling``), a FIXED iteration count, argmin
  tie-broken on centroid index, distances ranked by the expansion
  ``sum(c²) − 2·sum(x·c)`` (the per-row ``sum(x²)`` term is
  rank-invariant) — three plain double sums a SQL oracle replays exactly.
"""

from __future__ import annotations

import logging
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..utils.cache import registry as _cache

_LOG = logging.getLogger(__name__)

__all__ = ["kmeans_embeddings", "semdedup"]


def _md5_init_centroids(df: DataFrame, id_col: str, vec_col: str, k: int, seed: int):
    """Deterministic centroid init: the ``k`` rows with the smallest
    ``(md5int(seed|id), id)`` — engine-replayable (DuckDB:
    ``('0x' || substr(md5(seed || '|' || id), 1, 8))::BIGINT``), corpus-
    order-independent, and a TakeOrdered (per-partition heap + driver
    merge), not a full sort. Returns a (k', d) float64 matrix, k' ≤ k when
    the corpus is smaller than k."""
    import numpy as np

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}|"), F.col("__id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    rows = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .withColumn("__h", h)
        .orderBy("__h", "__id")
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("kmeans_embeddings: no rows with a non-null vector")
    return np.array([r["__v"] for r in rows], dtype="float64")


def _assign_udf(cents):
    """Arrow-vectorized nearest-centroid assignment: argmin over the
    rank-equivalent score ``sum(c²) − 2·x·c`` (ties → lowest centroid
    index, numpy argmin's first-min = SQL ``ORDER BY score, cid``). One
    float64 matmul per batch."""
    import numpy as np

    c = np.ascontiguousarray(cents, dtype="float64")
    sc = (c * c).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def _assign(col):
        import numpy as _np
        import pandas as _pd

        mat = _np.vstack(col.to_numpy()).astype("float64")
        score = sc[None, :] - 2.0 * (mat @ c.T)
        return _pd.Series(score.argmin(axis=1).astype("int32"))

    return _assign


def _assign_ccos_udf(cents):
    """Final-pass variant: struct(cluster, ccos) where ``ccos`` is the
    cosine similarity to the assigned centroid (the SemDeDup keep-rule
    input). Zero-norm vectors / centroids yield a true NULL ccos (masked
    Float64, not NaN) so SQL ``CASE WHEN den > 0`` replays it."""
    import numpy as np

    c = np.ascontiguousarray(cents, dtype="float64")
    sc = (c * c).sum(axis=1)
    cn = np.sqrt(sc)

    @F.pandas_udf("cluster int, ccos double")
    def _assign(col):
        import numpy as _np
        import pandas as _pd

        mat = _np.vstack(col.to_numpy()).astype("float64")
        dots = mat @ c.T
        cl = (sc[None, :] - 2.0 * dots).argmin(axis=1)
        rows = _np.arange(len(mat))
        xn = _np.sqrt((mat * mat).sum(axis=1))
        den = xn * cn[cl]
        ok = den > 0
        ccos = _np.divide(dots[rows, cl], den, out=_np.zeros(len(mat)), where=ok)
        vals = _pd.array(ccos, dtype="Float64")
        vals[~ok] = _pd.NA
        return _pd.DataFrame({"cluster": cl.astype("int32"), "ccos": vals})

    return _assign


def kmeans_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 64,
    iters: int = 2,
    seed: int = 42,
):
    """Distributed Lloyd k-means over an ``array<float|double>`` column
    with a FIXED iteration count and deterministic md5-rank init (see
    module docstring for the 100 TB shape and the cross-engine arithmetic
    contract). NULL vectors are excluded. Empty clusters keep their
    previous centroid.

    Returns ``(centroids, assigned)``: the final (k', d) float64 centroid
    matrix and a DataFrame ``(id_col, vec_col, cluster, ccos)`` holding
    each row's final assignment plus its cosine to the assigned centroid.
    Corpus passes: ``iters`` assignment+update passes + 1 final pass."""
    cents, final, _ = _kmeans(df, id_col, vec_col, k=k, iters=iters, seed=seed)
    return cents, final


def _kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int,
    iters: int,
    seed: int,
):
    """``kmeans_embeddings`` body; additionally returns the exact non-null
    row count when it fell out of the iteration stats for free (the
    per-dimension counts at position 0 sum to the corpus size — row count
    is invariant across reassignment), else None. ``semdedup`` uses it to
    skip its hot-cluster count job without an extra scan."""
    base = df.select(F.col(id_col), F.col(vec_col)).where(F.col(vec_col).isNotNull())
    cents = _md5_init_centroids(base, id_col, vec_col, k, seed)
    n_rows = None
    for _ in range(iters):
        assigned = base.select(
            _assign_udf(cents)(F.col(vec_col)).alias("__cl"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("__p", "__x"),
        )
        stats = (
            assigned.groupBy("__cl", "__p")
            .agg(F.sum("__x").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        nxt = cents.copy()
        for r in stats:
            nxt[r["__cl"], r["__p"]] = r["__s"] / r["__n"]
        cents = nxt
        n_rows = sum(r["__n"] for r in stats if r["__p"] == 0)
    final = base.select(
        F.col(id_col),
        F.col(vec_col),
        _assign_ccos_udf(cents)(F.col(vec_col)).alias("__a"),
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("__a.cluster").alias("cluster"),
        F.col("__a.ccos").alias("ccos"),
    )
    return cents, final, n_rows


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 64,
    iters: int = 2,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster_rows: int | None = 4096,
    lsh_split_bits: int = 12,
    max_cc_iterations: int = 25,
    strict: bool = False,
) -> DataFrame:
    """SemDeDup over an embedding column: k-means (``kmeans_embeddings``)
    → within-cluster exact-cosine pairs ≥ ``threshold`` (the bounded
    ``_emit_cosine_pairs`` kernel; hot clusters split by a seeded LSH
    signature in the shuffle key) → connected components → per component
    keep the member with the LOWEST cosine to its centroid (ties → lowest
    id) — the paper's diversity-preserving rule. Rows with NULL vectors
    are never dropped (nothing to compare).

    Returns ``df``'s columns plus ``semdedup_cluster`` / ``semdedup_ccos``
    (NULL for NULL vectors) and ``semdedup_keep``. Filter on
    ``semdedup_keep`` for the deduped corpus; the flag form keeps the drop
    set inspectable."""
    from .dedup import _emit_cosine_pairs, connected_components

    cents, assigned, n_rows = _kmeans(df, id_col, vec_col, k=k, iters=iters, seed=seed)
    # persisted: read by hot-cluster detection, the pair shuffle, and the
    # keep-rule join — the materialize-once a 10^12-row run would do
    assigned = _cache.persist(
        assigned.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            "cluster",
            "ccos",
        ),
        "semdedup.assigned",
    )
    cap = max_cluster_rows
    if cap is not None and n_rows is not None and n_rows <= cap:
        # exact corpus size fell out of the kmeans stats for free: no
        # cluster can exceed the cap, skip the hot-detection count job
        cap = None
    if cap is not None:
        hot = [
            r["cluster"]
            for r in assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > cap)
            .collect()
        ]
        if hot:
            from ..functions.vectors import hyperplane_signature_udf

            _LOG.warning(
                "semdedup: %d hot cluster(s) exceed max_cluster_rows=%d and "
                "are split by a hyperplane LSH signature (cross-sub-cluster "
                "pairs are not emitted); consider a larger k",
                len(hot),
                cap,
            )
            # the centroid matrix is already on the driver — its width
            # is the embedding dim, no extra job needed
            dim = int(cents.shape[1]) if cents.size else 1
            sig = hyperplane_signature_udf(dim, lsh_split_bits, seed)
            k2 = F.when(F.col("cluster").isin(hot), sig(F.col("v"))).otherwise(
                F.lit(0).cast("long")
            )
        else:
            k2 = F.lit(0).cast("long")
    else:
        k2 = F.lit(0).cast("long")
    tagged = assigned.select("id", "v", F.col("cluster").alias("b"), k2.alias("k2"))
    pairs = _emit_cosine_pairs(tagged, threshold, cap)
    comp = connected_components(
        pairs,
        max_iterations=max_cc_iterations,
        strict=strict,
        cache_label="semdedup.components",
    )
    # keep-one: min (ccos, id) per component; docs in no pair keep by
    # construction (comp only contains paired nodes)
    winners = (
        comp.join(assigned.select(F.col("id"), "ccos"), "id")
        .groupBy("component")
        .agg(
            F.min_by(
                F.col("id"), F.struct(F.coalesce(F.col("ccos"), F.lit(-2.0)), F.col("id"))
            ).alias("__keep_id")
        )
    )
    verdict = comp.join(winners, "component").select(
        F.col("id"),
        (F.col("id") == F.col("__keep_id")).alias("__keep"),
    )
    out = (
        df.join(
            assigned.select(
                F.col("id").alias(id_col),
                F.col("cluster").alias("semdedup_cluster"),
                F.col("ccos").alias("semdedup_ccos"),
            ),
            id_col,
            "left",
        )
        .join(verdict.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("semdedup_keep", F.coalesce(F.col("__keep"), F.lit(True)))
        .drop("__keep")
    )
    return out
