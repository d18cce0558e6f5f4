"""Hashed-BoW embeddings, two-table blocking, match stats, stateful
streaming."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ditto_spark.operators.embed import (
    hashed_bow_embed,
    match_stats,
    two_table_topk_blocking,
)


def test_hashed_bow_embed_normalized_and_deterministic(spark):
    df = spark.createDataFrame(
        [("a", "red fox red"), ("b", "red fox red")],
        "id string, text string")
    rows = {r.id: r.vec for r in hashed_bow_embed(df, "id", "text").collect()}
    assert rows["a"] == rows["b"]
    assert abs(math.fsum(x * x for x in rows["a"]) - 1.0) < 1e-9
    # 'red' has count 2, 'fox' 1 -> norms 2/sqrt(5), 1/sqrt(5)
    nonzero = sorted(x for x in rows["a"] if x > 0)
    assert abs(nonzero[0] - 1 / math.sqrt(5)) < 1e-9
    assert abs(nonzero[1] - 2 / math.sqrt(5)) < 1e-9


def test_two_table_topk_blocking(spark):
    a = spark.createDataFrame(
        [("a1", "red fox jumps"), ("a2", "blue whale swims"),
         ("a3", "red fox runs")],
        "id string, text string")
    b = spark.createDataFrame(
        [("b1", "red fox jumps high"), ("b2", "green turtle walks")],
        "id string, text string")
    out = two_table_topk_blocking(a, b, k=1)
    top = {r.right_id: r.left_id for r in out.collect()}
    assert top["b1"] == "a1"  # highest overlap
    # threshold mode prunes dissimilar pairs
    th = two_table_topk_blocking(a, b, k=3, threshold=0.5)
    assert all(r.sim >= 0.5 for r in th.collect())


def test_match_stats(spark):
    scored = spark.createDataFrame(
        [("a", "b", 1, 0.9), ("a", "c", 0, 0.8), ("b", "c", 1, 0.7)],
        "left_id string, right_id string, match int, match_confidence double")
    row = match_stats(scored).first()
    assert (row.total_pairs, row.matches, row.non_matches) == (3, 2, 1)
    assert abs(row.match_rate - round(2 / 3, 6)) < 1e-12
    assert abs(row.avg_confidence - 0.8) < 1e-12


def test_stateful_running_stats(spark, tmp_path):
    from ditto_spark.streaming.stateful import running_source_stats

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    schema = "source string, text string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (running_source_stats(stream)
             .writeStream
             .foreachBatch(lambda df, _:
                           df.write.mode("append").parquet(out))
             .option("checkpointLocation", ck).outputMode("update")
             .trigger(availableNow=True).start())
        q.awaitTermination()

    spark.createDataFrame(
        [("s1", "aaa"), ("s1", "aaa"), ("s2", "bbb")], schema
    ).write.mode("append").parquet(src)
    drain()
    first = {r.source: (r.docs_total, r.approx_distinct)
             for r in spark.read.parquet(out).collect()}
    assert first["s1"] == (2, 1) and first["s2"] == (1, 1)

    # second batch: state carries across drains via the checkpoint
    spark.createDataFrame([("s1", "ccc")], schema).write.mode(
        "append").parquet(src)
    drain()
    rows = spark.read.parquet(out).collect()
    s1 = [(r.docs_total, r.approx_distinct) for r in rows
          if r.source == "s1"]
    assert (3, 2) in s1
