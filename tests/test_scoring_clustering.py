"""Scorer decision contract, threshold tuning, connected components."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ditto_spark.operators.clustering import assign_entities, connected_components
from ditto_spark.operators.scoring import (
    f1_agg,
    score_pairs,
    surrogate_p1,
    tune_threshold,
)
from ditto_spark.synth import cluster_graph_pandas


def test_score_pairs_decision_contract(spark):
    cands = spark.createDataFrame(
        [
            ("a", "b", "COL name VAL ann lee COL city VAL salem",
             "COL name VAL ann lee COL city VAL salem", "k"),
            ("a", "c", "COL name VAL ann lee COL city VAL salem",
             "COL name VAL zzz qqq COL city VAL nowhere", "k"),
        ],
        "left_id string, right_id string, left_text string, right_text string, block_key string",
    )
    out = {r.right_id: r for r in score_pairs(cands, threshold=0.5).collect()}
    assert out["b"].match == 1 and out["c"].match == 0
    # confidence = prob of the PREDICTED class (matcher.py:155-159)
    assert abs(out["b"].match_confidence - out["b"].p1) < 1e-12
    assert abs(out["c"].match_confidence - (1 - out["c"].p1)) < 1e-12
    # spark path reproduces the single-node reference logic exactly
    assert abs(out["b"].p1 - surrogate_p1(out["b"].left_text,
                                          out["b"].right_text)) < 1e-12


def test_f1_and_threshold_tuning(spark):
    rows = [(1, 0.9), (1, 0.8), (1, 0.55), (0, 0.4), (0, 0.2), (0, 0.48)]
    df = spark.createDataFrame(rows, "label int, p1 double")
    th = tune_threshold(df)
    assert 0.5 <= th <= 0.55, th
    scored = df.withColumn("match", (F.col("p1") > th).cast("int"))
    assert f1_agg(scored) == 1.0


def test_connected_components_fixture(spark):
    edges_pd, expected = cluster_graph_pandas()
    edges = spark.createDataFrame(edges_pd)
    got = {r.doc_id: r.entity_id
           for r in connected_components(edges).collect()}
    for node, comp in expected.items():
        assert got[node] == comp, (node, got.get(node), comp)


def test_assign_entities_singletons(spark):
    docs = spark.createDataFrame([("a",), ("b",), ("c",)], "doc_id string")
    matches = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 0)],
        "left_id string, right_id string, match int",
    )
    got = {r.doc_id: r.entity_id
           for r in assign_entities(docs, matches).collect()}
    assert got == {"a": "a", "b": "a", "c": "c"}
