"""Property-based oracle tests (hypothesis) — ports the reference's
oracle-style invariants (tests/test_core/test_hypothesis.py, SURVEY.md §5):
valid-by-construction data passes; a scalar fails a bound check iff outside
the bound; unique fails iff duplicates exist — with a pandas reference
implementation as the oracle."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pandera_unified_validator_spark import SchemaBuilder, SparkValidator

SET = settings(
    max_examples=12,  # each example runs Spark jobs — keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def counts(spark, pdf, schema):
    df = spark.createDataFrame(pdf)
    rep = SparkValidator(schema).validate(df).report
    return {c.name: c.n_failed for c in rep.checks}, rep


@SET
@given(
    xs=st.lists(
        st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
        min_size=1,
        max_size=50,
    ),
    lo=st.integers(min_value=-100, max_value=100),
)
def test_ge_matches_pandas_oracle(spark, xs, lo):
    pdf = pd.DataFrame({"x": pd.array(xs, dtype="Int64")})
    schema = SchemaBuilder("t").column("x", "int", ge=lo).build()
    got, _ = counts(spark, pdf, schema)
    s = pdf["x"]
    expected = int(((s.notna()) & (s < lo)).sum())  # null passes value checks
    assert got["x__ge"] == expected


@SET
@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=8), min_size=1, max_size=60
    )
)
def test_unique_matches_pandas_oracle(spark, xs):
    pdf = pd.DataFrame({"k": xs})
    schema = SchemaBuilder("t").column("k", "int", unique=True).build()
    got, rep = counts(spark, pdf, schema)
    vc = pdf["k"].value_counts()
    expected = int(vc[vc > 1].sum())  # all member rows of duplicated keys
    assert got["k__unique"] == expected
    assert rep.is_valid == (expected == 0)


@SET
@given(
    xs=st.lists(
        st.sampled_from(["a", "b", "c", "zzz", "qq"]), min_size=1, max_size=40
    ),
    allowed=st.sets(st.sampled_from(["a", "b", "c"]), min_size=1),
)
def test_isin_matches_pandas_oracle(spark, xs, allowed):
    pdf = pd.DataFrame({"s": xs})
    schema = SchemaBuilder("t").column("s", "str", isin=sorted(allowed)).build()
    got, _ = counts(spark, pdf, schema)
    expected = int((~pdf["s"].isin(allowed)).sum())
    assert got["s__isin"] == expected


@SET
@given(
    n=st.integers(min_value=1, max_value=40),
    lo=st.integers(min_value=0, max_value=5),
    hi=st.integers(min_value=6, max_value=20),
)
def test_valid_by_construction_passes(spark, n, lo, hi):
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "v": [lo + (i % max(hi - lo, 1)) for i in range(n)],
        }
    )
    schema = (
        SchemaBuilder("t")
        .column("id", "int", nullable=False, unique=True, ge=0)
        .column("v", "int", ge=lo, le=hi)
        .build()
    )
    _, rep = counts(spark, pdf, schema)
    assert rep.is_valid, rep.to_console()


@SET
@given(
    xs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=60,
    )
)
def test_profile_mean_min_max_match_pandas(spark, xs):
    from pandera_unified_validator_spark.operators.profiler import DataProfiler

    pdf = pd.DataFrame({"x": xs})
    rep = DataProfiler(exact=True, correlations=False).profile(spark.createDataFrame(pdf))
    p = rep.columns["x"]
    assert p.mean == pytest.approx(pdf["x"].mean(), rel=1e-9, abs=1e-9)
    assert p.min == pytest.approx(pdf["x"].min())
    assert p.max == pytest.approx(pdf["x"].max())
    assert p.median == pytest.approx(pdf["x"].quantile(0.5), rel=1e-9, abs=1e-9)


@SET
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),     # dedup key
            st.integers(min_value=-100, max_value=100),  # tiebreak / payload
        ),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_exact_matches_pandas_oracle(spark, rows):
    """dedup_exact on key ``k`` with tiebreak ``v`` == pandas sort+drop_duplicates:
    one survivor per key, smallest v wins, all columns preserved."""
    from pandera_unified_validator_spark.operators.dedup import dedup_exact

    pdf = pd.DataFrame(rows, columns=["k", "v"])
    got = sorted(
        (r["k"], r["v"])
        for r in dedup_exact(spark.createDataFrame(pdf), ["k"], tiebreak="v").collect()
    )
    exp = sorted(
        pdf.sort_values(["k", "v"], kind="mergesort")
        .drop_duplicates("k", keep="first")
        .itertuples(index=False, name=None)
    )
    assert got == exp


@SET
@given(
    ta=st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=0, max_size=12),
    tb=st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=0, max_size=12),
)
def test_ngram_jaccard_matches_python_sets(spark, ta, tb):
    """ngram_jaccard_pairs == python set Jaccard over word 2-gram shingles
    (short docs yield one whole-doc shingle, empty docs an empty set)."""
    from pandera_unified_validator_spark.operators.dedup import ngram_jaccard_pairs

    def grams(ws, n=2):
        if not ws:
            return set()
        if len(ws) < n:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    docs = spark.createDataFrame(
        [(1, " ".join(ta)), (2, " ".join(tb))], "doc_id int, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    rows = ngram_jaccard_pairs(docs, pairs, n=2).collect()
    ga, gb = grams(ta), grams(tb)
    union = len(ga | gb)
    if union == 0:
        assert rows[0]["jaccard_sim"] is None
    else:
        assert rows[0]["jaccard_sim"] == round(len(ga & gb) / union, 4)


@SET
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab c\nX.")), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_shingle_hashes_gram_identity_property(spark, texts, k):
    """For arbitrary texts and gram sizes, the hash-combined gram
    representation must induce EXACTLY the same equality structure as the
    string form: same per-doc distinct counts, and identical cross-doc
    intersection cardinalities (the invariant banding and set-Jaccard
    depend on)."""
    from pyspark.sql import functions as F

    from pandera_unified_validator_spark.operators.dedup import shingles
    from pandera_unified_validator_spark.operators.text import shingle_hashes

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = df.select(
        "doc_id",
        F.array_distinct(shingles("text", k)).alias("s"),
        F.array_distinct(shingle_hashes("text", k)).alias("h"),
    ).collect()
    s = {r["doc_id"]: set(r["s"]) for r in rows}
    h = {r["doc_id"]: set(r["h"]) for r in rows}
    for a in s:
        assert len(s[a]) == len(h[a])
        for b in s:
            assert len(s[a] & s[b]) == len(h[a] & h[b])


@SET
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                [
                    "",  # blank line
                    "short",
                    "x" * 35,                      # eligible, constant -> dups
                    "boilerplate line repeated across documents alpha",
                    "boilerplate line repeated across documents beta!",
                    "a genuinely unique-ish line padded to eligibility zz",
                ]
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_line_dedup_properties(spark, docs):
    """Properties vs a python reference: (1) output equals the reference
    first-occurrence dedup; (2) idempotence — running line_dedup on its own
    output changes nothing; (3) short/blank lines always survive."""
    from pandera_unified_validator_spark.operators.dedup import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    # python reference: first (doc_id, pos) occurrence of eligible lines wins
    seen = set()
    expected = {}
    for i, text in rows:
        out = []
        for line in text.split("\n"):
            if len(line) < 30:
                out.append(line)
            elif line not in seen:
                seen.add(line)
                out.append(line)
        expected[i] = "\n".join(out)

    got = {r["doc_id"]: r["text"] for r in line_dedup(df, min_line_chars=30).collect()}
    assert got == expected
    got2 = {
        r["doc_id"]: r["text"]
        for r in line_dedup(
            spark.createDataFrame(sorted(got.items()), "doc_id int, text string"),
            min_line_chars=30,
        ).collect()
    }
    assert got2 == got


@SET
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                [
                    "",  # empty paragraph
                    "short para",
                    "y" * 35,                      # eligible, constant -> dups
                    "boilerplate paragraph repeated across documents alpha",
                    "first line of a paragraph\nsecond line making it long",
                    "a genuinely unique-ish paragraph padded to length zz",
                    "trailing newline paragraph padded for eligibility\n",
                ]
            ),
            min_size=0,
            max_size=5,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_paragraph_dedup_properties(spark, docs):
    """granularity='paragraph' (round 6): output equals a python reference
    that splits the JOINED text on \\n\\n+ (both engines see the same
    canonicalized units, including the 3+-newline collapse), dedups
    eligible paragraphs corpus-wide first-occurrence, and rejoins with one
    blank line; idempotent on its own output."""
    import re

    from pandera_unified_validator_spark.operators.dedup import line_dedup

    rows = [(i, "\n\n".join(ps)) for i, ps in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    seen = set()
    expected = {}
    for i, text in rows:
        out = []
        for p in re.split(r"\n\n+", text):
            if len(p) < 30:
                out.append(p)
            elif p not in seen:
                seen.add(p)
                out.append(p)
        expected[i] = "\n\n".join(out)

    got = {
        r["doc_id"]: r["text"]
        for r in line_dedup(
            df, min_line_chars=30, granularity="paragraph"
        ).collect()
    }
    assert got == expected
    got2 = {
        r["doc_id"]: r["text"]
        for r in line_dedup(
            spark.createDataFrame(sorted(got.items()), "doc_id int, text string"),
            min_line_chars=30,
            granularity="paragraph",
        ).collect()
    }
    assert got2 == got
