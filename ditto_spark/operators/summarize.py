"""TF-IDF summarization (SURVEY.md P7 + A1).

Reference algorithm (ditto_light/summarize.py):
  * corpus pass: fit a TF-IDF index over all entries (:33-52) ->
    vocab + idf, where idf follows the sklearn smooth formula
    idf(t) = ln((1+N) / (1+df(t))) + 1;
  * per pair (:63-114): score tokens of both sides by idf, excluding
    stopwords and the COL/VAL markers (:79-84); keep the top ``max_len``
    scoring tokens (:86-101); emit each side's tokens in ORIGINAL order,
    always retaining COL/VAL markers (:103-109).

Spark-first split of the same computation:
  * the corpus aggregation is native: tokenize -> explode distinct tokens
    per doc -> groupBy(token).count() -> idf column; vocabulary capped at
    ``max_vocab`` by document frequency (deterministic tiebreak) so the
    broadcast stays bounded at 100TB corpora — rare tokens outside the cap
    default to the max idf, which is order-equivalent for selection;
  * the per-row greedy budget runs in a vectorized pandas UDF with the
    broadcast idf dict (the reference's in-process dict lookup, made
    executor-side).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# public english stopword list (reference uses nltk's, summarize.py:20-22)
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be
    because been before being below between both but by could did do does
    doing down during each few for from further had has have having he her
    here hers herself him himself his how i if in into is it its itself
    just me more most my myself no nor not now of off on once only or
    other our ours ourselves out over own s same she should so some such t
    than that the their theirs them themselves then there these they this
    those through to too under until up very was we were what when where
    which while who whom why will with you your yours yourself
    yourselves""".split()
)
MARKERS = ("COL", "VAL")


def build_idf(
    spark: SparkSession,
    corpus: DataFrame,
    text_col: str = "text",
    max_vocab: int = 1_000_000,
) -> tuple[dict[str, float], float]:
    """Corpus document-frequency aggregation -> (idf dict, default idf).

    Native plan: project text -> split/explode(distinct tokens) ->
    groupBy(token).count() -> top-max_vocab by (df desc, token) -> driver.
    One shuffle; the result is a broadcast-sized dict.
    """
    n_docs = corpus.count()
    tok = corpus.select(
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), r"\s+"),
                         lambda t: t != F.lit(""))
            )
        ).alias("token")
    )
    dfreq = (
        tok.groupBy("token").agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(max_vocab)
    )
    rows = dfreq.collect()  # bounded by max_vocab — metadata, not data
    idf = {
        r["token"]: math.log((1 + n_docs) / (1 + r["df"])) + 1.0
        for r in rows
    }
    default_idf = math.log(1 + n_docs) + 1.0  # df=0 smooth value
    return idf, default_idf


def _summarize_one(
    text: str, idf: dict[str, float], default_idf: float, max_len: int
) -> str:
    """Greedy top-idf token budget, order-preserving, markers retained
    (summarize.py:86-109 shape). Deviation from the reference, documented:
    attribute-name tokens (the token following each COL) are always kept
    so the COL/VAL structure survives summarization — the reference lets
    low-idf attribute names drop out (:103-109), which breaks the parse
    round-trip our input_hint invariant requires."""
    tokens = text.split()
    is_attr = [i > 0 and tokens[i - 1] == "COL" for i in range(len(tokens))]
    scored: dict[str, float] = {}
    for i, t in enumerate(tokens):
        if t in MARKERS or is_attr[i] or t.lower() in STOPWORDS:
            continue
        scored[t] = idf.get(t, default_idf)
    keep = set()
    budget = max_len
    for t in sorted(scored, key=lambda x: (-scored[x], x)):
        if budget <= 0:
            break
        keep.add(t)
        budget -= 1
    out = [
        t for i, t in enumerate(tokens)
        if t in MARKERS or is_attr[i] or t in keep
    ]
    return " ".join(out)


def summarize_column(
    df: DataFrame,
    idf: dict[str, float],
    default_idf: float,
    text_cols: list[str],
    max_len: int = 64,
) -> DataFrame:
    """Apply the per-row summarizer to each text column via one
    mapInPandas pass (broadcast idf, Arrow batches)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((idf, default_idf))
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idf_d, dflt = bc.value
        for pdf in batches:
            for c in text_cols:
                pdf[c] = pdf[c].map(
                    lambda s: _summarize_one(s or "", idf_d, dflt, max_len)
                )
            yield pdf

    return df.mapInPandas(run, schema)
