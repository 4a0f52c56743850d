"""curate_corpus: the one-call composition of the curation gates matches
the manual operator chain, and disabled stages are identity."""

import pytest
from pyspark.sql import functions as F

from pandera_unified_validator_spark import CurationConfig, curate_corpus
from pandera_unified_validator_spark.utils.cache import registry


@pytest.fixture(scope="module")
def corpus(spark):
    glue = "the story of a walk and the long road with friends that have arrived "
    rows = []
    for i in range(120):
        cl = i // 4
        cluster_words = " ".join(f"c{cl}w{j}" for j in range(60))
        boiler = f"subscribe to our newsletter variant {i % 4} for updates today"
        body = (
            "9$73 zz9!! 00@@1 xx##7 " * 40
            if i % 13 == 0
            else f"{glue}{cluster_words} item {i}"
        )
        url = f"\nsee https://ads.blocked.example/p?id={i} now" if i % 11 == 0 else ""
        rows.append((i, f"src{cl % 2}", f"{boiler}\n{body}{url}"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_curate_matches_manual_chain(spark, corpus):
    from pandera_unified_validator_spark.operators.dedup import (
        dedup_by_components,
        line_dedup,
        minhash_dedup_pairs,
    )
    from pandera_unified_validator_spark.operators.text import (
        gopher_quality_flags,
        url_flags,
    )

    registry.release_all()
    cfg = CurationConfig(
        blocked_domains=("blocked.example",),
        lm_drop_pct=None,          # LM floor covered separately (percentile
        sample_fractions=None,     # calibration is order-dependent)
    )
    got = {r["doc_id"] for r in curate_corpus(corpus, config=cfg).collect()}

    step = line_dedup(corpus, min_line_chars=30)
    step = step.filter(gopher_quality_flags("text")["passes"])
    step = step.filter(~url_flags("text", ["blocked.example"])["blocked"])
    pairs = minhash_dedup_pairs(step, jaccard_threshold=0.8)
    manual = {r["doc_id"] for r in dedup_by_components(step, pairs).collect()}
    assert got == manual and 0 < len(got) < 120
    registry.release_all()


def test_curate_stage_toggles(spark, corpus):
    registry.release_all()
    off = CurationConfig(
        min_line_chars=None, gopher=False, blocked_domains=(),
        near_dup_threshold=None, lm_drop_pct=None, sample_fractions=None,
    )
    assert curate_corpus(corpus, config=off).count() == 120  # identity

    sampled = CurationConfig(
        min_line_chars=None, gopher=False, near_dup_threshold=None,
        lm_drop_pct=None, sample_fractions={"src0": 1.0}, default_fraction=0.0,
    )
    out = curate_corpus(corpus, config=sampled)
    assert out.filter(F.col("source") != "src0").count() == 0
    assert out.count() == corpus.filter("source = 'src0'").count()

    lm_only = CurationConfig(
        min_line_chars=None, gopher=False, near_dup_threshold=None,
        lm_drop_pct=20.0, sample_fractions=None,
    )
    n = curate_corpus(corpus, config=lm_only).count()
    assert 0 < n < 120  # the worst quantile dropped
    registry.release_all()


def test_curate_lm_reference_corpus(spark, corpus):
    """lm_reference scores against a CLEAN reference LM (the CCNet shape)
    instead of the corpus itself: gibberish docs score as pure OOV and the
    percentile drop removes them preferentially."""
    registry.release_all()
    ref = spark.createDataFrame(
        [(0, "the story of a walk and the long road with friends that have arrived "
             * 5)],
        "doc_id long, text string",
    )
    cfg = CurationConfig(
        min_line_chars=None, gopher=False, near_dup_threshold=None,
        lm_drop_pct=15.0, lm_reference=ref, sample_fractions=None,
    )
    out = curate_corpus(corpus, config=cfg)
    kept = {r["doc_id"] for r in out.collect()}
    gibberish = {i for i in range(120) if i % 13 == 0}
    # the gibberish cohort's body is pure OOV noise -> worst scores
    assert len(kept & gibberish) < len(gibberish)
    assert 0 < len(kept) < 120
    registry.release_all()


def test_curate_quality_classifier_stage(spark):
    """The learned-filter knob: docs scored below classifier_min_prob by a
    trained GramClassifier are dropped; wordless docs drop by policy
    (NULL prob fails the >= filter); None disables the stage."""
    from pandera_unified_validator_spark.operators.text import (
        train_gram_classifier,
    )

    train = spark.createDataFrame(
        [
            (100 + i, "src", " ".join(["fine prose words here"] * 5), True)
            for i in range(8)
        ]
        + [
            (200 + i, "src", " ".join(["spam casino pills click"] * 5), False)
            for i in range(8)
        ],
        "doc_id long, source string, text string, label boolean",
    )
    model = train_gram_classifier(train, "label")
    corpus = spark.createDataFrame(
        [
            (1, "src", "fine prose words here and more fine prose"),
            (2, "src", "spam casino pills click spam casino"),
            (3, "src", ""),  # wordless -> NULL prob -> dropped by policy
        ],
        "doc_id long, source string, text string",
    )
    base = CurationConfig(
        min_line_chars=None, gopher=False, near_dup_threshold=None,
        lm_drop_pct=None, sample_fractions=None,
    )
    off = curate_corpus(corpus, config=base)
    assert {r["doc_id"] for r in off.collect()} == {1, 2, 3}

    import dataclasses

    on = curate_corpus(
        corpus,
        config=dataclasses.replace(
            base, quality_classifier=model, classifier_min_prob=0.5
        ),
    )
    assert {r["doc_id"] for r in on.collect()} == {1}


def test_curate_dsir_stage(spark):
    """The DSIR knob: with all other gates off, dsir_k selects exactly k
    docs biased toward the target exemplar corpus; dsir_k without a
    target raises; the selection is deterministic."""
    import dataclasses

    from pandera_unified_validator_spark.utils.cache import (
        operator_cache_scope,
    )

    target = spark.createDataFrame(
        [(1000 + i, "t", "quality reference prose sentences") for i in range(4)],
        "doc_id long, source string, text string",
    )
    corpus = spark.createDataFrame(
        [(i, "src", "quality reference prose here") for i in range(20)]
        + [(100 + i, "src", "junk spam tokens unrelated") for i in range(20)],
        "doc_id long, source string, text string",
    )
    base = CurationConfig(
        min_line_chars=None, gopher=False, near_dup_threshold=None,
        lm_drop_pct=None, sample_fractions=None,
    )
    cfg = dataclasses.replace(base, dsir_k=10, dsir_target=target,
                              dsir_num_buckets=509)
    with operator_cache_scope():
        got = curate_corpus(corpus, config=cfg).collect()
        ids = sorted(r["doc_id"] for r in got)
        assert len(ids) == 10
        # target-like docs dominate the selection
        assert sum(i < 100 for i in ids) >= 8
        # schema passthrough: the curated rows keep the input columns
        assert set(got[0].asDict()) == {"doc_id", "source", "text"}
    with operator_cache_scope():
        again = sorted(
            r["doc_id"] for r in curate_corpus(corpus, config=cfg).collect()
        )
    assert again == ids

    with pytest.raises(ValueError, match="dsir_target"):
        curate_corpus(corpus, config=dataclasses.replace(base, dsir_k=5))
