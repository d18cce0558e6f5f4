"""Round-2 fix coverage: threshold re-predict verification, deterministic
split_production ids, streaming ingest_ts fallback, ref-summarizer
pipeline stage, and the ANN routing in two-table top-k blocking."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_tune_threshold_verified_agrees(spark):
    from ditto_spark.operators.scoring import (
        tune_threshold, tune_threshold_verified,
    )

    rows = [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.3, 0), (0.1, 0),
            (0.55, 1), (0.45, 0)] * 20
    df = spark.createDataFrame(rows, "p1 double, label int")
    th, swept, re = tune_threshold_verified(df)
    assert th == tune_threshold(df)
    assert abs(swept - re) < 1e-12
    assert swept > 0.5


def test_split_production_ids_deterministic(spark):
    from ditto_spark.operators.serialize import split_production

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z")],
        "name_left string, name_right string")
    first = {r["left_text"]: (r["left_id"], r["right_id"])
             for r in split_production(df).collect()}
    # different partitioning must yield the same ids
    second = {r["left_text"]: (r["left_id"], r["right_id"])
              for r in split_production(df.repartition(3)).collect()}
    assert first == second
    assert all(k.startswith("L") for k, _ in first.values())


def test_read_doc_stream_ts_fallback(spark, tmp_path):
    """Docs without ingest_ts must get a processing-time fallback so
    watermarked dedup does not silently drop every row."""
    from ditto_spark.operators.serialize import serialize_docs  # noqa: F401
    from ditto_spark.streaming.ingest import dedup_stream, read_doc_stream
    from ditto_spark.synth import distributed_docs

    src = str(tmp_path / "src")
    out_rows = []
    distributed_docs(spark, 20, seed=3).write.parquet(src)  # no ingest_ts
    stream = read_doc_stream(spark, src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory").queryName("r2_ts_fallback")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out_rows = spark.sql("SELECT * FROM r2_ts_fallback").collect()
    assert len(out_rows) > 0  # pre-fix: watermark dropped everything


def test_pipeline_ref_summarizer_stage(spark):
    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
    from ditto_spark.synth import distributed_docs

    docs = distributed_docs(spark, 200, seed=9)
    out = run_pipeline(spark, docs, PipelineConfig(
        sn_window=2, ref_summarizer=True, ref_summarizer_max_len=24))
    scored = out["scored"].limit(50).collect()
    assert scored
    for r in scored:
        # markers survive; token budget enforced loosely (pieces != toks)
        assert r["left_text"].startswith("COL")


def test_two_table_topk_ann_routing(spark):
    from ditto_spark.operators.embed import two_table_topk_blocking
    from ditto_spark.synth import distributed_docs
    from ditto_spark.operators.serialize import serialize_docs

    d = serialize_docs(distributed_docs(spark, 120, seed=4)).select(
        F.col("doc_id").alias("id"), "text")
    num = F.substring("id", 2, 9).cast("long")  # doc_id = 'd%09d'
    a = d.filter(num % 2 == 0)
    b = d.filter(num % 2 == 1).limit(20)
    exact = two_table_topk_blocking(a, b, k=3, exact=True)
    ann = two_table_topk_blocking(a, b, k=3, exact=False, n_cells=4,
                                  n_probe=4)
    ex = {(r["right_id"], r["rank"]): r["left_id"]
          for r in exact.collect()}
    an = {(r["right_id"], r["rank"]): r["left_id"] for r in ann.collect()}
    assert ex, "exact path empty"
    assert an, "ann path empty"
    # full-probe IVF (n_probe == n_cells) degenerates to exact: same
    # top-1 per query
    top1_ex = {k[0]: v for k, v in ex.items() if k[1] == 1}
    top1_an = {k[0]: v for k, v in an.items() if k[1] == 1}
    assert top1_ex == top1_an
    # auto routing picks exact under the row cap (no crash, same result)
    auto = two_table_topk_blocking(a, b, k=3)
    assert auto.count() == exact.count()
