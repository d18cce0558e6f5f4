"""Round-3 fix coverage: score_pairs schema self-enforcement with
non-string upstream ids, capability-based native-scorer routing,
bounded ref-TFIDF vocab default, reliable CC checkpointing, widened
split_production ids, scoped cache registry, and the GeneralDK
whole-float normalization."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_score_pairs_accepts_long_ids(spark):
    """A valid upstream with bigint ids (parquet doc_id) must flow
    through score_pairs' declared string-id schema — the operator casts
    in its own projection (VERDICT r2 #1: er_model_scores crash)."""
    from ditto_spark.operators.scoring import score_pairs

    pairs = spark.createDataFrame(
        [(1, 2, "COL name VAL acme corp", "COL name VAL acme corporation"),
         (3, 4, "COL name VAL zebra", "COL name VAL xylophone")],
        "left_id long, right_id long, left_text string, right_text string")
    out = score_pairs(pairs, 0.5).collect()
    assert len(out) == 2
    assert all(isinstance(r["left_id"], str) for r in out)
    assert {r["left_id"] for r in out} == {"1", "3"}


def test_score_pairs_accepts_long_ids_numpy_backend(spark):
    """Same contract through the numpy transformer backend — the exact
    shape that crashed er_model_scores in CORRECTNESS_r02."""
    from ditto_spark.operators.npmodel import NumpyDittoBackend, make_weights
    from ditto_spark.operators.scoring import score_pairs

    w = make_weights(seed=0)
    pairs = spark.createDataFrame(
        [(10, 20, "COL a VAL x y z", "COL a VAL x y q"),
         (30, 40, "COL a VAL foo", "COL a VAL bar")],
        "left_id long, right_id long, left_text string, right_text string")
    out = score_pairs(pairs, 0.1,
                      lambda: NumpyDittoBackend(w, micro_batch=2)).collect()
    assert len(out) == 2
    assert all(0.0 <= r["p1"] <= 1.0 for r in out)
