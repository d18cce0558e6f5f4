"""TF-IDF summarizer + DK injector tests (P7/P8, A1)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ditto_spark.operators.knowledge import dk_inject
from ditto_spark.operators.summarize import (
    _summarize_one,
    build_idf,
    summarize_column,
)


def test_idf_formula_matches_hand_computation(spark):
    corpus = spark.createDataFrame(
        [("rare word one",), ("common common word",), ("word two",)],
        "text string",
    )
    idf, dflt = build_idf(spark, corpus)
    n = 3
    # 'word' in 3 docs, 'common' in 1 doc (distinct per doc)
    assert abs(idf["word"] - (math.log((1 + n) / (1 + 3)) + 1)) < 1e-12
    assert abs(idf["common"] - (math.log((1 + n) / (1 + 1)) + 1)) < 1e-12
    assert abs(dflt - (math.log(1 + n) + 1)) < 1e-12


def test_summarize_budget_order_and_markers():
    idf = {"rare": 3.0, "mid": 2.0, "freq": 1.0}
    text = "COL name VAL freq rare mid freq"
    # budget 1 -> keep only 'rare', markers always retained, order kept
    out = _summarize_one(text, idf, 0.5, max_len=1)
    assert out == "COL name VAL rare"
    out2 = _summarize_one(text, idf, 0.5, max_len=2)
    assert out2 == "COL name VAL rare mid"
    # stopwords never selected
    out3 = _summarize_one("COL a VAL the rare", {"the": 9.0, "rare": 1.0},
                          0.5, max_len=1)
    assert out3 == "COL a VAL rare"


def test_summarize_column_spark_matches_local(spark):
    corpus = spark.createDataFrame(
        [("d1", "COL name VAL alpha beta gamma"),
         ("d2", "COL name VAL alpha beta"),
         ("d3", "COL name VAL alpha")],
        "doc_id string, text string",
    )
    idf, dflt = build_idf(spark, corpus)
    got = {
        r.doc_id: r.text
        for r in summarize_column(corpus, idf, dflt, ["text"], 2).collect()
    }
    for r in corpus.collect():
        assert got[r.doc_id] == _summarize_one(r.text, idf, dflt, 2)


def test_dk_injection_rules(spark):
    df = spark.createDataFrame(
        [("COL price VAL 12.5 COL qty VAL 42 COL sku VAL AB12CD34EF COL w VAL plain",)],
        "text string",
    )
    out = df.select(dk_inject(F.col("text")).alias("t")).first().t
    assert out == (
        "COL price VAL NUM 12.50 COL qty VAL NUM 42 "
        "COL sku VAL ID AB12CD34EF COL w VAL plain"
    )


def test_summarize_budget_properties():
    """Property: output tokens ⊆ input (order preserved), distinct
    non-marker non-attr tokens ≤ budget, markers+attrs always kept."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["alpha", "beta", "gamma", "delta", "the",
                            "rare", "x1", "zz"])

    @settings(max_examples=100, deadline=None)
    @given(st.lists(word, min_size=0, max_size=12),
           st.integers(min_value=0, max_value=6))
    def prop(vals, budget):
        text = "COL name VAL " + " ".join(vals) if vals else "COL name VAL"
        idf = {w: (len(w) * 1.0) for w in vals}
        out = _summarize_one(text, idf, 0.5, max_len=budget)
        out_toks = out.split()
        in_toks = text.split()
        # subsequence check
        it = iter(in_toks)
        assert all(t in it for t in out_toks)
        kept = {t for t in out_toks
                if t not in ("COL", "VAL", "name")}
        from ditto_spark.operators.summarize import STOPWORDS
        assert len({t for t in kept if t.lower() not in STOPWORDS}) <= budget
        assert out_toks[:3] == ["COL", "name", "VAL"]

    prop()
