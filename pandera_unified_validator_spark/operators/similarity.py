"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k (numpy per Arrow batch — the exact baseline) and an
LSH-bucketed approximate variant (the scale path: probe only matching-bucket
rows). No reference analogue; first-class per the task brief.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_pandas_udf, hyperplane_signature_udf

__all__ = ["brute_force_topk", "lsh_topk", "IvfIndex"]


def brute_force_topk(
    corpus: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan, numpy matmul per Arrow batch, global
    TakeOrdered (no full sort — Spark's top-k is a per-partition heap +
    driver merge). Deterministic tiebreak on id."""
    score = cosine_pandas_udf()(list(query))
    return (
        corpus.select(F.col(id_col), score(F.col(vec_col)).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
        .withColumn("cosine_sim", F.round("cosine_sim", 4))
    )


def lsh_topk(
    corpus: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_bits: int = 10,
    multiprobe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket the corpus (precomputable /
    bucketed-write in production), probe the query's bucket plus all buckets
    within ``multiprobe`` Hamming flips, exact-rerank only those rows.

    At 10^12 vectors the probe is a partition-pruned scan when the corpus is
    written partitioned by bucket; here it is a filter.

    ``multiprobe`` is the Hamming radius of the probe ball (any 0..n_bits);
    the ball has sum_{r<=multiprobe} C(n_bits, r) buckets, so large radii
    approach a full scan — values above ``n_bits`` are rejected rather than
    silently capped."""
    import itertools

    import numpy as np

    dim = len(query)
    if not 0 <= multiprobe <= n_bits:
        raise ValueError(
            f"multiprobe must be in [0, n_bits={n_bits}], got {multiprobe}"
        )
    sig = hyperplane_signature_udf(dim, n_bits, seed)
    rng = np.random.RandomState(seed)
    # same quantize-then-float64 discipline as hyperplane_signature_udf so
    # the query lands in the same bucket the corpus UDF assigns
    planes = rng.standard_normal((dim, n_bits)).astype("float32").astype("float64")
    qbits = (np.asarray(query, dtype="float64") @ planes) > 0
    weights = (1 << np.arange(n_bits)).astype("int64")
    qbucket = int(qbits @ weights)

    probes = {qbucket}
    for radius in range(1, multiprobe + 1):
        for flips in itertools.combinations(range(n_bits), radius):
            b = qbucket
            for j in flips:
                b ^= 1 << j
            probes.add(b)

    tagged = corpus.withColumn("__bucket", sig(F.col(vec_col)))
    candidates = tagged.filter(F.col("__bucket").isin(list(probes)))
    return brute_force_topk(candidates, query, k, id_col, vec_col)


class IvfIndex:
    """IVF-flat index: k-means-lite centroids (seeded sample, Lloyd rounds on
    a sample, numpy driver-side), corpus assigned to nearest centroid once
    (one Arrow-UDF pass — in production written ``partitionBy(centroid)``),
    queries probe ``n_probe`` nearest lists and exact-rerank.
    """

    def __init__(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        *,
        n_lists: int = 16,
        sample_rows: int = 2048,
        iters: int = 5,
        seed: int = 42,
    ) -> None:
        import numpy as np

        self.id_col, self.vec_col = id_col, vec_col
        # seeded Bernoulli sample spanning the whole corpus (a bare
        # .limit(sample_rows) is first-N: on sorted/clustered input the
        # centroids would all come from one region). One cheap count job
        # sizes the fraction; .sample is a per-row filter, no shuffle.
        n_corpus = corpus.count()
        frac = min(1.0, (3.0 * sample_rows) / max(n_corpus, 1))
        sample = np.vstack(
            [
                r[vec_col]
                for r in corpus.select(vec_col)
                .sample(fraction=frac, seed=seed)
                .limit(int(sample_rows))
                .collect()
            ]
        ).astype("float32")
        rng = np.random.RandomState(seed)
        cent = sample[rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)]
        for _ in range(iters):  # Lloyd on the sample (driver-side, tiny)
            d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(len(cent)):
                m = sample[assign == c]
                if len(m):
                    cent[c] = m.mean(0)
        self.centroids = cent

        planes = cent  # assignment = argmax dot with centroids (normalized)
        norm = np.linalg.norm(planes, axis=1, keepdims=True)
        norm[norm == 0] = 1
        self._assign_mat = (planes / norm).T.astype("float32")

        from pyspark.sql import types as T

        mat = self._assign_mat

        @F.pandas_udf(T.IntegerType())
        def assign_udf(col):
            import numpy as _np
            import pandas as _pd

            m = _np.vstack(col.to_numpy())
            n = _np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1
            return _pd.Series((m / n @ mat).argmax(1).astype("int32"))

        self.assigned = corpus.withColumn("__list", assign_udf(F.col(vec_col)))

    def search(self, query: Sequence[float], k: int = 10, n_probe: int = 3) -> DataFrame:
        import numpy as np

        q = np.asarray(query, dtype="float32")
        qn = np.linalg.norm(q) or 1.0
        scores = (q / qn) @ self._assign_mat
        probe = [int(i) for i in np.argsort(-scores)[:n_probe]]
        cand = self.assigned.filter(F.col("__list").isin(probe))
        return brute_force_topk(cand, list(query), k, self.id_col, self.vec_col)
