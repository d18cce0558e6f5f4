"""The native (codegen) surrogate scorer must agree EXACTLY with the
Python surrogate it replaces — same tokens, same formula, same decisions
(matcher.py:108-115 decision contract) — and the checkpoint store's cache
release must be scoped to operator caches only."""

from __future__ import annotations

from pyspark.sql import functions as F

from ditto_spark.operators.scoring import (
    SurrogateBackend, score_pairs, score_pairs_native, surrogate_p1,
    value_tokens_col,
)

EDGE_TEXTS = [
    "COL name VAL alpha beta COL city VAL paris",
    "col name val alpha beta col city val paris",   # lowercase markers
    "COL VAL alpha",                                 # val right after col
    "COL col VAL x y",                               # col introduces 'col'
    "VAL VAL COL a b c",                             # leading vals
    "",                                              # empty
    "COL n",                                         # col consumes last tok
    "  padded   whitespace  COL k VAL v  ",
    "unicode tøkens ünïté COL x VAL ünïté",
    "a a a b b c",                                   # repeats -> set
]


def _pairs_df(spark):
    rows = []
    i = 0
    for lt in EDGE_TEXTS:
        for rt in EDGE_TEXTS:
            rows.append((f"l{i}", f"r{i}", lt, rt, "bk"))
            i += 1
    return spark.createDataFrame(
        rows, "left_id string, right_id string, left_text string, "
              "right_text string, block_key string")


def test_value_tokens_col_matches_python(spark):
    from ditto_spark.operators.scoring import _value_tokens

    df = spark.createDataFrame([(t,) for t in EDGE_TEXTS], "text string")
    got = df.select(F.sort_array(value_tokens_col(F.col("text")))
                    .alias("toks")).collect()
    for row, text in zip(got, EDGE_TEXTS):
        assert sorted(set(row["toks"])) == sorted(_value_tokens(text)), text


def test_native_scorer_exact_agreement(spark):
    cands = _pairs_df(spark)
    native = {r["left_id"]: r for r in
              score_pairs_native(cands, 0.5).collect()}
    udf = {r["left_id"]: r for r in
           score_pairs(cands, 0.5, SurrogateBackend).collect()}
    assert set(native) == set(udf)
    for k in native:
        n, u = native[k], udf[k]
        assert n["match"] == u["match"], (k, n, u)
        assert abs(n["p1"] - u["p1"]) < 1e-12, (k, n["p1"], u["p1"])
        assert abs(n["match_confidence"] - u["match_confidence"]) < 1e-12


def test_surrogate_backend_vectorized_matches_scalar():
    import pandas as pd

    backend = SurrogateBackend()
    left = pd.Series([a for a in EDGE_TEXTS for _ in EDGE_TEXTS])
    right = pd.Series([b for _ in EDGE_TEXTS for b in EDGE_TEXTS])
    got = backend.score_batch(left, right)
    for g, l, r in zip(got, left, right):
        assert g == surrogate_p1(l, r)


def test_score_id_pairs_native_matches_udf(spark):
    """The per-doc-tokenized id-pair scorer must agree exactly with the
    per-pair UDF scorer on the same candidates."""
    from ditto_spark.operators.scoring import score_id_pairs_native

    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(EDGE_TEXTS)],
        "doc_id string, text string")
    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{j}", "bk") for i in range(len(EDGE_TEXTS))
         for j in range(len(EDGE_TEXTS)) if i < j],
        "left_id string, right_id string, block_key string")
    texts = {f"d{i}": t for i, t in enumerate(EDGE_TEXTS)}
    got = {(r["left_id"], r["right_id"]): r
           for r in score_id_pairs_native(pairs, docs, 0.5).collect()}
    assert len(got) == pairs.count()
    for (li, ri), r in got.items():
        want = surrogate_p1(texts[li], texts[ri])
        assert abs(r["p1"] - want) < 1e-12, (li, ri)
        assert r["left_text"] == texts[li]
        assert r["match"] == int(want > 0.5)


def test_pipeline_native_default_matches_udf_path(spark):
    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
    from ditto_spark.synth import distributed_docs

    docs = distributed_docs(spark, 300, seed=7)
    m_native = run_pipeline(spark, docs, PipelineConfig(sn_window=2))[
        "scored"].select("left_id", "right_id", "match").collect()
    m_udf = run_pipeline(
        spark, docs, PipelineConfig(sn_window=2, native_scorer=False))[
        "scored"].select("left_id", "right_id", "match").collect()
    assert sorted(map(tuple, m_native)) == sorted(map(tuple, m_udf))


def test_checkpoint_cache_release_is_scoped(spark, tmp_path):
    """An unrelated cached DataFrame must survive a stage() call."""
    from ditto_spark.operators.blocking import key_blocking
    from ditto_spark.sources.checkpoint import CheckpointStore
    from ditto_spark.synth import distributed_docs

    unrelated = spark.range(100).withColumn("x", F.col("id") * 2).cache()
    unrelated.count()  # materialize
    assert unrelated.storageLevel.useMemory

    store = CheckpointStore(spark, str(tmp_path / "ck"))
    docs = distributed_docs(spark, 50, seed=5)
    from ditto_spark.operators.serialize import serialize_docs
    ser = serialize_docs(docs).select("doc_id", "text")
    store.stage("blocked", "fp1", lambda: key_blocking(
        ser, F.substring("text", 1, 8)))
    # operator cache released, caller cache intact
    assert unrelated.storageLevel.useMemory
    unrelated.unpersist()
