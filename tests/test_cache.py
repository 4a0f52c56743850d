"""Operator-cache lifecycle (utils/cache.py): persists are tracked,
budgeted, and released — the round-5 fix for long-lived sessions accreting
cached plans until executors evict working-set data."""

import pyspark
from pyspark.sql import functions as F

from pandera_unified_validator_spark.utils.cache import (
    OperatorCacheRegistry,
    operator_cache_scope,
    registry,
)

NONE_LEVEL = pyspark.StorageLevel.NONE


def _is_cached(df) -> bool:
    return df.storageLevel != NONE_LEVEL


def test_registry_budget_evicts_oldest(spark):
    reg = OperatorCacheRegistry(max_entries=2)
    a = reg.persist(spark.range(5), "a")
    b = reg.persist(spark.range(6), "b")
    c = reg.persist(spark.range(7), "c")
    assert reg.labels() == ["b", "c"]
    assert not _is_cached(a) and _is_cached(b) and _is_cached(c)
    reg.release_all()
    assert not _is_cached(b) and not _is_cached(c)
    assert reg.labels() == []


def test_release_single_entry(spark):
    reg = OperatorCacheRegistry()
    a = reg.persist(spark.range(5), "a")
    b = reg.persist(spark.range(6), "b")
    reg.release(a)
    assert reg.labels() == ["b"]
    assert not _is_cached(a) and _is_cached(b)
    reg.release_all()


def test_scope_releases_only_inner_registrations(spark):
    outer = registry.persist(spark.range(9), "outer")
    try:
        with operator_cache_scope():
            inner = registry.persist(spark.range(10), "inner")
            assert _is_cached(inner)
        assert not _is_cached(inner)
        assert _is_cached(outer)
        assert "outer" in registry.labels() and "inner" not in registry.labels()
    finally:
        registry.release_all()


def test_minhash_caches_released_after_scope(spark):
    """The verdict's done-condition: after a pipeline step materializes its
    result inside operator_cache_scope(), the operator-level caches
    (signature store, CC edges) are GONE from the session."""
    from pandera_unified_validator_spark.operators.dedup import (
        dedup_by_components,
        minhash_dedup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog wearing a tall hat "
    rows = [(i, base + f"tail {i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    registry.release_all()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()  # other suites' fixtures may cache
    with operator_cache_scope():
        pairs = minhash_dedup_pairs(df, jaccard_threshold=0.5)
        kept = dedup_by_components(df, pairs).collect()  # materialize inside
        assert 0 < len(kept) <= 30
    assert registry.labels() == []
    # nothing from the pipeline left materialized in the session
    assert jsc.getPersistentRDDs().size() == before


def test_embedding_cache_released_after_scope(spark):
    from pandera_unified_validator_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    rows = [(i, [float((i * 7 + j) % 5) + 1.0 for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    registry.release_all()
    with operator_cache_scope():
        out = embedding_near_dup_pairs(
            df, threshold=0.99, n_bits=4, max_bucket_rows=8
        ).collect()
        assert isinstance(out, list)
    assert registry.labels() == []


def test_scope_is_thread_local(spark):
    """A persist registered by ANOTHER thread must not be captured by this
    thread's open scope — a streaming-listener thread's checkpoint entry
    released by an unrelated scope exit would be unrecomputable (review
    round 5)."""
    import threading

    other_df = {}

    def other_thread():
        other_df["df"] = registry.persist(spark.range(12), "other-thread")

    with operator_cache_scope():
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        mine = registry.persist(spark.range(13), "mine")
        assert _is_cached(other_df["df"]) and _is_cached(mine)
    assert not _is_cached(mine)                 # my scope released mine
    assert _is_cached(other_df["df"])           # but not the other thread's
    assert "other-thread" in registry.labels()
    registry.release_all()


def test_connected_components_preserves_upstream_caches(spark):
    """The checkpoint-id diff must not misattribute lazily-materialized SQL
    caches (edges / the minhash signature store) as checkpoint storage and
    destroy them in round 1 (review round 5): after a full
    minhash->components run, the signature cache is still registered AND
    still materialized alongside the final label checkpoint."""
    from pandera_unified_validator_spark.operators.dedup import (
        dedup_by_components,
        minhash_dedup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog wearing a tall hat "
    rows = [(i, base + f"tail {i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    registry.release_all()
    pairs = minhash_dedup_pairs(df, jaccard_threshold=0.5)
    kept = dedup_by_components(df, pairs, small_graph_edges=None).collect()
    assert 0 < len(kept) <= 30
    labels = registry.labels()
    assert "minhash_dedup_pairs.signatures" in labels
    assert "connected_components.labels" in labels
    # both stores still materialized: signature cache + label checkpoint
    jsc = spark.sparkContext._jsc.sc()
    n_rdds = jsc.getPersistentRDDs().size()
    assert n_rdds >= 2, n_rdds
    registry.release_all()
    # release drops at least the two operator stores (other suites' cached
    # fixtures may remain — assert the delta, not an absolute zero)
    assert jsc.getPersistentRDDs().size() <= n_rdds - 2


def test_cc_loop_outside_scope_supersedes_checkpoints(spark):
    """Round-6 verdict #3: a driver loop calling connected_components
    OUTSIDE any scope must not accrete one non-evictable checkpoint RDD
    per call — a new registration under the same label releases the
    superseded store."""
    from pandera_unified_validator_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    registry.release_all()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    last = None
    for _ in range(3):
        last = connected_components(pairs, small_graph_edges=None)
        last.collect()
    labels = registry.labels()
    assert labels.count("connected_components.labels") == 1
    # at most ONE label checkpoint RDD outlives the loop
    assert jsc.getPersistentRDDs().size() <= before + 1
    # the surviving (latest) result is still readable
    got = {r["id"]: r["component"] for r in last.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    registry.release_all()
    assert jsc.getPersistentRDDs().size() == before


def test_cc_distinct_cache_labels_keep_both_results(spark):
    """Callers outside scopes that need two live CC results use distinct
    cache labels; neither store is superseded."""
    from pandera_unified_validator_spark.operators.dedup import (
        connected_components,
    )

    pa = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    pb = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    registry.release_all()
    ca = connected_components(pa, cache_label="cc.a", small_graph_edges=None)
    cb = connected_components(pb, cache_label="cc.b", small_graph_edges=None)
    assert {r["component"] for r in ca.collect()} == {1}
    assert {r["component"] for r in cb.collect()} == {5}
    assert "cc.a" in registry.labels() and "cc.b" in registry.labels()
    registry.release_all()
