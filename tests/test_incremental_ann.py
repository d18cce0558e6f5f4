"""Streaming incremental ANN: per-batch equivalence with the batch
operator over the accumulated corpus, retry idempotence, and index
partition pruning."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ditto_spark.operators.similarity import ann_topk_lsh
from ditto_spark.streaming.incremental_ann import incremental_ann_topk


def _vec_batches(seed: int = 7, n_batches: int = 3, per_batch: int = 12,
                 dim: int = 8):
    """Deterministic clustered vectors, split into arrival batches."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(4, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    out = []
    vid = 0
    for _ in range(n_batches):
        rows = []
        for _ in range(per_batch):
            v = centers[vid % 4] + 0.1 * rng.randn(dim) / np.sqrt(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
        out.append(rows)
    return out


SCHEMA = "vec_id long, embedding array<double>"


def test_incremental_ann_matches_batch_operator(spark, tmp_path):
    """Each drained micro-batch's top-k equals ann_topk_lsh run with
    base = all vectors arrived so far (incl. the batch), queries = the
    batch — the streamed path adds arrival order, not new semantics."""
    batches = _vec_batches()
    src = str(tmp_path / "in")
    for rows in batches:
        (spark.createDataFrame(rows, SCHEMA).coalesce(1)
         .write.mode("append").parquet(src))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    wd, ck = str(tmp_path / "work"), str(tmp_path / "ck")
    incremental_ann_topk(spark, stream, wd, ck, k=3, n_bits=4,
                         multiprobe=True)

    # batch ids follow arrival order with maxFilesPerTrigger=1, but the
    # file order is not the write order — recover each batch's queries
    # from its own topk partition
    streamed = spark.read.parquet(f"{wd}/topk")
    seen = None
    for bid in sorted(r[0] for r in
                      streamed.select("batch").distinct().collect()):
        got = streamed.filter(F.col("batch") == bid).drop("batch")
        qids = {r[0] for r in got.select("query_id").distinct().collect()}
        batch_rows = [rows for rows in batches
                      if {str(v) for v, _ in rows} & qids]
        assert len(batch_rows) == 1
        this = spark.createDataFrame(batch_rows[0], SCHEMA).select(
            F.col("vec_id").cast("string").alias("vec_id"), "embedding")
        seen = this if seen is None else seen.unionByName(this)
        want = ann_topk_lsh(seen, this, k=3, n_bits=4, multiprobe=True)
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))


def test_incremental_ann_pruned_and_idempotent(spark, tmp_path):
    batches = _vec_batches(seed=19, n_batches=2, per_batch=16)
    src = str(tmp_path / "in")
    for rows in batches:
        (spark.createDataFrame(rows, SCHEMA).coalesce(1)
         .write.mode("append").parquet(src))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    wd, ck = str(tmp_path / "work"), str(tmp_path / "ck")
    incremental_ann_topk(spark, stream, wd, ck, k=2, n_bits=3,
                         multiprobe=False, n_store_buckets=8)
    first = sorted(map(tuple,
                       spark.read.parquet(f"{wd}/topk").collect()))
    assert first

    # index is partitioned by LSH-bucket hash and a bucket IN-filter
    # prunes the scan to those directories
    full = spark.read.parquet(f"{wd}/index")
    all_b = sorted(r[0] for r in
                   full.select("vb_bucket").distinct().collect())
    assert len(all_b) > 1
    pruned = full.filter(F.col("vb_bucket").isin(all_b[:1]))
    read_files = {r[0] for r in
                  pruned.select(F.input_file_name()).distinct().collect()}
    all_files = {r[0] for r in
                 full.select(F.input_file_name()).distinct().collect()}
    assert read_files and read_files < all_files
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "vb_bucket" in plan.split(
        "PartitionFilters")[1][:200]

    # replay with a FRESH checkpoint over the same source: every batch
    # overwrites its own partitions, so outputs are byte-stable
    ck2 = str(tmp_path / "ck2")
    stream2 = (spark.readStream.schema(SCHEMA)
               .option("maxFilesPerTrigger", 1).parquet(src))
    incremental_ann_topk(spark, stream2, wd, ck2, k=2, n_bits=3,
                         multiprobe=False, n_store_buckets=8)
    again = sorted(map(tuple,
                       spark.read.parquet(f"{wd}/topk").collect()))
    assert again == first


def test_incremental_ann_resume_same_checkpoint(spark, tmp_path):
    """Restart contract: drain wave 1, then add wave 2 and drain again
    with the SAME checkpoint — the resumed stream processes only the
    new files, and the final store equals a single-pass run over both
    waves."""
    batches = _vec_batches(seed=23, n_batches=2, per_batch=10)
    src = str(tmp_path / "in")
    wd, ck = str(tmp_path / "work"), str(tmp_path / "ck")

    def drain():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        incremental_ann_topk(spark, stream, wd, ck, k=2, n_bits=3,
                             multiprobe=False, n_store_buckets=8)

    (spark.createDataFrame(batches[0], SCHEMA).coalesce(1)
     .write.mode("append").parquet(src))
    drain()
    after_w1 = spark.read.parquet(f"{wd}/topk")
    assert after_w1.select("batch").distinct().count() == 1

    (spark.createDataFrame(batches[1], SCHEMA).coalesce(1)
     .write.mode("append").parquet(src))
    drain()
    resumed = sorted(map(tuple, spark.read.parquet(f"{wd}/topk").collect()))

    # single-pass reference over the same two waves
    wd2, ck2 = str(tmp_path / "work2"), str(tmp_path / "ck2")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    incremental_ann_topk(spark, stream, wd2, ck2, k=2, n_bits=3,
                         multiprobe=False, n_store_buckets=8)
    single = sorted(map(tuple, spark.read.parquet(f"{wd2}/topk").collect()))
    assert resumed == single
