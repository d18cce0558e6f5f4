"""End-to-end pipeline: quality vs ground truth, F1 vs the single-node
reference decision logic on identical candidates (BASELINE.md protocol),
and idempotent checkpoint resume."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from ditto_spark.operators.scoring import surrogate_p1
from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
from ditto_spark.sources.checkpoint import CheckpointStore
from ditto_spark.synth import docs_df, truth_df


def _pair_f1(entities, truth) -> float:
    """Pairwise F1 of predicted entity ids vs true cluster ids."""
    joined = entities.join(truth, "doc_id")
    a = joined.alias("a")
    b = joined.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        (F.col("a.entity_id") == F.col("b.entity_id")).alias("pred"),
        (F.col("a.cluster_id") == F.col("b.cluster_id")).alias("true"),
    )
    row = pairs.agg(
        F.sum(F.when(F.col("pred") & F.col("true"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("true"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("true"), 1).otherwise(0)).alias("fn"),
    ).first()
    denom = 2 * row.tp + row.fp + row.fn
    return 2 * row.tp / denom if denom else 1.0


def test_pipeline_end_to_end_quality(spark):
    docs = docs_df(spark, n_entities=80)
    truth = truth_df(spark, n_entities=80)
    out = run_pipeline(spark, docs)
    f1 = _pair_f1(out["entities"], truth)
    assert f1 > 0.80, f"cluster pairwise F1 too low: {f1}"


def test_spark_decisions_match_reference_logic(spark):
    """THE quality gate shape: our Spark scorer path must reproduce the
    single-node reference decision logic (same serialization, same
    preprocessing, same p-vs-threshold rule, matcher.py:108-115) on
    identical candidate pairs at the same blocking key. Target F1>=0.99;
    with a shared deterministic backend it must be exact."""
    docs = docs_df(spark, n_entities=60)
    out = run_pipeline(spark, docs)
    cands = out["scored"].collect()  # small fixture — oracle is single-node
    agree = 0
    tp = fp = fn = 0
    for r in cands:
        ref_p = surrogate_p1(r.left_text, r.right_text)
        ref_match = int(ref_p > 0.5)
        agree += int(ref_match == r.match)
        tp += int(ref_match == 1 and r.match == 1)
        fp += int(ref_match == 0 and r.match == 1)
        fn += int(ref_match == 1 and r.match == 0)
    assert agree == len(cands)
    f1 = 2 * tp / (2 * tp + fp + fn) if tp else 1.0
    assert f1 >= 0.99


def test_checkpoint_resume_idempotent(spark, tmp_path):
    docs = docs_df(spark, n_entities=30)
    base = str(tmp_path / "ck")

    s1 = CheckpointStore(spark, base)
    out1 = run_pipeline(spark, docs, store=s1)
    ents1 = sorted((r.doc_id, r.entity_id)
                   for r in out1["entities"].collect())
    assert set(s1.recomputed) == {"serialized", "candidates", "scored",
                                  "entities"}

    # resume: new store over the same base recomputes NOTHING
    s2 = CheckpointStore(spark, base)
    out2 = run_pipeline(spark, docs, store=s2)
    ents2 = sorted((r.doc_id, r.entity_id)
                   for r in out2["entities"].collect())
    assert s2.recomputed == []
    assert ents1 == ents2

    # kill-and-resume: wipe a late stage; only downstream stages recompute
    os.remove(os.path.join(base, "entities.manifest.json"))
    s3 = CheckpointStore(spark, base)
    out3 = run_pipeline(spark, docs, store=s3)
    ents3 = sorted((r.doc_id, r.entity_id)
                   for r in out3["entities"].collect())
    assert s3.recomputed == ["entities"]
    assert ents3 == ents1

    # lineage + metrics tables exist and cover all stages
    stages = {r.stage for r in s3.lineage().select("stage").distinct().collect()}
    assert {"serialized", "candidates", "scored", "entities"} <= stages
    m = s3.metrics()
    assert m.filter(F.col("stage") == "entities").count() >= 2


def test_config_changes_invalidate_checkpoint(spark, tmp_path):
    docs = docs_df(spark, n_entities=20)
    base = str(tmp_path / "ck2")
    run_pipeline(spark, docs, PipelineConfig(threshold=0.5),
                 store=CheckpointStore(spark, base))
    s = CheckpointStore(spark, base)
    run_pipeline(spark, docs, PipelineConfig(threshold=0.7), store=s)
    # scoring + clustering depend on threshold -> recomputed
    assert "scored" in s.recomputed and "entities" in s.recomputed
    assert "serialized" not in s.recomputed


def test_pipeline_with_summarizer_and_tuned_threshold(spark):
    """Exercise the optional P7 path inside the DAG plus threshold tuning
    on a small labeled validation frame (matcher.py:192-253 flow)."""
    from ditto_spark.operators.scoring import tune_threshold
    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline

    docs = docs_df(spark, n_entities=40)
    truth = truth_df(spark, n_entities=40)
    out = run_pipeline(spark, docs,
                       PipelineConfig(use_summarizer=True,
                                      summarizer_max_len=24))
    f1 = _pair_f1(out["entities"], truth)
    assert f1 > 0.6, f"summarized-pipeline F1 too low: {f1}"

    # tune threshold on scored candidates labeled by ground truth
    scored = out["scored"].join(
        truth.withColumnRenamed("doc_id", "left_id")
        .withColumnRenamed("cluster_id", "cl"), "left_id").join(
        truth.withColumnRenamed("doc_id", "right_id")
        .withColumnRenamed("cluster_id", "cr"), "right_id").select(
        "p1", (F.col("cl") == F.col("cr")).cast("int").alias("label"))
    th = tune_threshold(scored, label_col="label")
    assert 0.0 <= th <= 0.95


def test_fingerprints_chain_downstream(spark, tmp_path):
    """Upstream config/input changes must invalidate every downstream
    checkpoint (review finding: unchained fingerprints silently served
    stale scored/entities after a blocking-config change)."""
    docs = docs_df(spark, n_entities=15)
    base = str(tmp_path / "ck3")
    run_pipeline(spark, docs, PipelineConfig(), input_id="fixture15",
                 store=CheckpointStore(spark, base))

    # blocking config change -> candidates AND scored AND entities
    s = CheckpointStore(spark, base)
    run_pipeline(spark, docs, PipelineConfig(minhash_bands=4),
                 input_id="fixture15", store=s)
    assert set(s.recomputed) == {"candidates", "scored", "entities"}

    # input change -> everything
    s2 = CheckpointStore(spark, base)
    run_pipeline(spark, docs, PipelineConfig(minhash_bands=4),
                 input_id="other-input", store=s2)
    assert set(s2.recomputed) == {"serialized", "candidates", "scored",
                                  "entities"}
