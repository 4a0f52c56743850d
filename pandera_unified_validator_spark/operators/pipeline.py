"""One-call corpus curation: the standard training-data gate sequence
composed from this package's operators, in the order the literature runs
them (RefinedWeb / Gopher / CCNet):

    line dedup → Gopher quality gate → URL blocklist → MinHash near-dup +
    connected-components keep-one → learned hashed-ngram quality filter
    (optional) → percentile unigram-LM floor → deterministic stratified
    sampling → DSIR importance selection against a target exemplar
    corpus (optional)

Everything stays lazy until the caller acts on the returned DataFrame;
operator-level caches (signature store, CC label checkpoints, LM vocab)
register with ``utils.cache`` — wrap the consuming action in
``operator_cache_scope()`` to release them once the output is written.
``tools/submit_corpus_job.py`` is this function plus stage counting and a
spark-submit harness (verified on a real 3-executor standalone cluster).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # annotation-only; avoids a module-load cycle
    from .text import GramClassifier

__all__ = ["CurationConfig", "curate_corpus"]


@dataclass
class CurationConfig:
    """Knobs for ``curate_corpus``; every stage can be disabled.

    * ``min_line_chars`` — line-dedup eligibility (None disables the stage)
    * ``gopher`` — apply the Gopher quality rules
    * ``blocked_domains`` — drop docs referencing these domains (or their
      subdomains); empty disables
    * ``near_dup_threshold`` — MinHash+CC keep-one at this Jaccard (None
      disables)
    * ``quality_classifier`` — a trained ``text.GramClassifier``
      (fastText-style hashed-ngram linear filter, the learned gate of the
      CCNet/DCLM lineage); docs scoring below ``classifier_min_prob`` are
      dropped. Wordless docs have no score (NULL prob) and are dropped by
      policy, same as the LM stage. None disables.
    * ``lm_drop_pct`` — drop the worst N% of docs by unigram-LM mean logp,
      percentile-calibrated like CCNet's perplexity buckets (None disables);
      ``lm_reference`` optionally scores against a CLEAN reference corpus
      instead of the corpus itself (CCNet uses Wikipedia). Docs with NO
      words have no LM score (NULL) and are dropped BY POLICY when this
      stage is on — with ``gopher`` enabled they are already gone (word
      count ≥ 50), but corpora curated with the word-count gate off lose
      wordless rows here.
    * ``sample_fractions`` — per-stratum deterministic hash sampling (None
      disables); ``default_fraction`` applies to unlisted strata
    * ``dsir_k`` + ``dsir_target`` — final DSIR selection (Xie et al.
      2023): fit hashed-ngram importance weights of the surviving corpus
      against the ``dsir_target`` exemplar corpus (e.g. Wikipedia) and
      keep ``dsir_k`` docs via deterministic Gumbel-top-k. Runs LAST —
      it is the target-aware alternative to flat sampling, and fitting
      it on the post-gate corpus matches the paper's raw-pool setup.
      None disables.
    """

    min_line_chars: int | None = 30
    gopher: bool = True
    blocked_domains: Sequence[str] = ()
    near_dup_threshold: float | None = 0.8
    quality_classifier: "GramClassifier | None" = None
    classifier_min_prob: float = 0.5
    lm_drop_pct: float | None = 10.0
    lm_vocab_limit: int = 1_000_000
    lm_reference: DataFrame | None = None
    sample_fractions: Mapping[str, float] | None = None
    default_fraction: float = 0.0
    dsir_k: int | None = None
    dsir_target: DataFrame | None = None
    dsir_num_buckets: int = 1 << 16
    dsir_seed: int = 42


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    config: CurationConfig | None = None,
) -> DataFrame:
    """Run the standard curation gate sequence over ``df`` (must carry
    ``id_col`` and ``text_col``; ``strata_col`` only needed when
    sampling). Returns the curated DataFrame — lazy except the LM stage,
    whose percentile calibration necessarily runs jobs (vocab scalar and
    approxQuantile)."""
    from .dedup import dedup_by_components, line_dedup, minhash_dedup_pairs
    from .sampling import stratified_sample
    from .text import (
        gopher_quality_flags,
        unigram_doc_scores,
        unigram_lm,
        url_flags,
    )

    cfg = config or CurationConfig()
    step = df
    if cfg.min_line_chars is not None:
        step = line_dedup(step, id_col, text_col, min_line_chars=cfg.min_line_chars)
    if cfg.gopher:
        step = step.filter(gopher_quality_flags(text_col)["passes"])
    if cfg.blocked_domains:
        step = step.filter(~url_flags(text_col, list(cfg.blocked_domains))["blocked"])
    if cfg.near_dup_threshold is not None or cfg.quality_classifier is not None:
        from ..utils.cache import registry as _cache

        # Both remaining gates SELF-JOIN ``step`` against a side derived
        # from it (minhash verify re-reads text; the classifier joins its
        # per-doc scores back), so without a persist here the whole
        # upstream lineage — the line-dedup reassembly above all —
        # re-executes once per consuming branch (the round-6 composed-plan
        # audit counted 5 raw-text scans). One MEMORY_AND_DISK
        # materialization of the filtered corpus replaces them; the
        # registry scope releases it with the rest.
        step = _cache.persist(step, "curate_corpus.post_filters")
    if cfg.near_dup_threshold is not None:
        pairs = minhash_dedup_pairs(
            step, id_col, text_col, jaccard_threshold=cfg.near_dup_threshold
        )
        step = dedup_by_components(step, pairs, id_col)
    if cfg.quality_classifier is not None:
        from .text import score_gram_classifier

        # one explode -> broadcast weight join -> groupBy(doc) -> semi
        # filter; text never shuffles. NULL prob (wordless doc) fails the
        # >= comparison, implementing the drop-by-policy contract.
        scored = score_gram_classifier(
            step, cfg.quality_classifier, id_col, text_col
        )
        step = step.join(
            scored.filter(
                F.col("prob") >= cfg.classifier_min_prob
            ).select(id_col),
            id_col,
        )
    if cfg.lm_drop_pct is not None:
        from ..utils.cache import registry as _cache

        # the LM stage runs calibration jobs (vocab scalar, approxQuantile)
        # and the caller acts on the result — without these persists the
        # whole upstream curation lineage (line-dedup reassembly, the
        # costliest stage) would recompute up to 4x
        step = _cache.persist(step, "curate_corpus.pre_lm")
        lm = unigram_lm(
            cfg.lm_reference if cfg.lm_reference is not None else step,
            text_col,
            vocab_limit=cfg.lm_vocab_limit,
        )
        scores = _cache.persist(
            unigram_doc_scores(step, lm, id_col, text_col),
            "curate_corpus.lm_scores",
        )
        q = scores.approxQuantile("mean_logp", [cfg.lm_drop_pct / 100.0], 0.001)
        floor = q[0] if q else float("-inf")
        # wordless docs (NULL mean_logp) are dropped by policy — see
        # CurationConfig docstring. Docs AT the floor are KEPT (>=): a
        # strict > would drop every doc tied with the quantile value, and
        # on templated/degenerate corpora where many docs share one score
        # that drops far more than N% — up to the whole corpus at
        # lm_drop_pct=0 (advice r5).
        step = step.join(
            scores.filter(F.col("mean_logp") >= floor).select(id_col), id_col
        )
    if cfg.sample_fractions is not None:
        step = stratified_sample(
            step,
            strata_col,
            dict(cfg.sample_fractions),
            id_col,
            default_fraction=cfg.default_fraction,
        )
    if cfg.dsir_k is not None:
        if cfg.dsir_target is None:
            raise ValueError("dsir_k requires a dsir_target exemplar corpus")
        from ..utils.cache import registry as _cache
        from .text import dsir_resample, fit_dsir

        # three consumers of ``step`` (raw-side bucket counts in the fit,
        # the weight explode in the resample, the keep join) — persist the
        # surviving corpus once so the gate lineage above doesn't re-run
        # per branch; the fit itself runs a totals job, like the LM stage
        step = _cache.persist(step, "curate_corpus.pre_dsir")
        model = fit_dsir(
            cfg.dsir_target,
            step,
            text_col,
            num_buckets=cfg.dsir_num_buckets,
        )
        sel = dsir_resample(
            step, model, cfg.dsir_k, id_col, text_col, seed=cfg.dsir_seed
        )
        step = step.join(sel.select(id_col), id_col)
    return step
