"""Incremental ANN: stream embeddings against a GROWING RP-LSH index.

The streaming counterpart of ``similarity.ann_topk_lsh`` — and of the
reference's embedding blocker (blocking/blocker.py:43-80), which loads
the full vector set into one numpy matrix per run and cannot accept
arrivals. Vectors arrive continuously; each micro-batch is
sign-bucketed with the SAME deterministic hyperplanes as the index,
probes read ONLY the index partitions their (multi-probe) buckets hash
into, exact cosine re-ranks inside buckets to emit top-k neighbors over
everything seen so far (including the batch itself), and the batch's
vectors are appended to the index for later arrivals to match.

Scale contract (the incremental_er O(batch) contract applied to
vectors):

  index/batch=N/vb_bucket=H   (id, vec, bucket) — per-batch arrivals,
      partitioned by LSH-bucket hash; a micro-batch's read is pruned to
      its probes' vb_bucket set (bounded literal IN — parquet directory
      pruning), so per-batch cost scales with the batch's bucket
      footprint, not the corpus.
  topk/batch=N                (query_id, neighbor_id, cosine, rank) —
      overwrite-own-partition, so a retried batch is idempotent.

Size ``n_store_buckets`` to the corpus exactly as the incremental-ER
stores do (each partition executor-memory-sized); the store marker
pins the count so a mismatched reader fails fast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ditto_spark.operators.similarity import cosine_vec, rp_lsh_buckets
from ditto_spark.streaming.incremental_er import (N_INDEX_BUCKETS,
                                                  _check_bucket_meta,
                                                  _hash_bucket,
                                                  _in_buckets,
                                                  _read_batch_parts)


def _bucket_values_int(df: DataFrame, col: str,
                       n_buckets: int) -> list[int]:
    """DISTINCT store-partition hashes of an INT bucket column —
    bounded metadata collect (<= n_buckets values)."""
    return sorted(r[0] for r in
                  df.select(_hash_bucket(col, n_buckets).alias("b"))
                  .distinct().collect())


def seed_vector_index(
    spark: SparkSession,
    emb: DataFrame,
    work_dir: str,
    n_bits: int = 8,
    dim: int | None = None,
    n_store_buckets: int = N_INDEX_BUCKETS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch: int = -1,
) -> None:
    """Bulk-load an existing corpus into the growing index before
    streaming starts. Written under ``batch=-1`` so the stream's first
    micro-batch (batch 0) still sees it through the retry-idempotence
    read (which excludes ``batch >= batch_id``); pins the store's
    bucket count in the marker the per-batch reads verify."""
    _check_bucket_meta(spark, work_dir, n_store_buckets)
    keys = (rp_lsh_buckets(
        emb.select(F.col(id_col).cast("string").alias("id"),
                   F.col(vec_col).alias("vec")),
        n_bits, "id", "vec", dim)
        .withColumn("bucket", F.col("bucket").cast("long"))
        .withColumn("vb_bucket", _hash_bucket("bucket", n_store_buckets)))
    (keys.repartition("vb_bucket")
     .write.mode("overwrite").partitionBy("vb_bucket")
     .parquet(f"{work_dir}/index/batch={batch}"))


def incremental_ann_topk(
    spark: SparkSession,
    stream_emb: DataFrame,
    work_dir: str,
    checkpoint: str,
    k: int = 10,
    n_bits: int = 8,
    dim: int | None = None,
    multiprobe: bool = True,
    n_store_buckets: int = N_INDEX_BUCKETS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Drain the embedding stream; per micro-batch, write the batch's
    top-k cosine neighbors over the accumulated corpus (earlier batches
    + the batch itself) to ``work_dir/topk/batch=N`` and append the
    batch's vectors to the bucket-hash-partitioned index.

    Exactly ``similarity.ann_topk_lsh`` semantics per batch, with the
    base side = everything indexed so far: the batch equivalence test
    replays each batch through the batch operator and asserts equality.
    Returns the streaming query's recentProgress for latency checks.
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        _check_bucket_meta(spark, work_dir, n_store_buckets)
        vecs = (batch.select(F.col(id_col).cast("string").alias("id"),
                             F.col(vec_col).alias("vec"))
                .localCheckpoint(eager=True))
        # bucket is int on the expression path and long on the numpy
        # path — pin long so the store schema is stable across paths
        keys_new = (rp_lsh_buckets(vecs, n_bits, "id", "vec", dim)
                    .withColumn("bucket", F.col("bucket").cast("long"))
                    .localCheckpoint(eager=True))
        probes = keys_new.select(F.col("id").alias("query_id"),
                                 F.col("vec").alias("qv"), "bucket")
        if multiprobe:
            variants = F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << b))
                  for b in range(n_bits)])
            probes = probes.select(
                "query_id", "qv", F.explode(variants).alias("bucket"))
        # prune the accumulated index read to the partitions the
        # probes' buckets hash into: bounded literal IN (<=
        # n_store_buckets values however large the corpus grows) ->
        # parquet directory pruning -> O(batch) read
        probe_buckets = _bucket_values_int(probes, "bucket",
                                           n_store_buckets)
        prior = (_read_batch_parts(
            spark, f"{work_dir}/index",
            "id string, vec array<double>, bucket long",
            before_batch=batch_id, partition_schema=", vb_bucket int")
            .filter(_in_buckets("vb_bucket", probe_buckets))
            .select("id", "vec", "bucket"))
        base = prior.unionByName(keys_new.select("id", "vec", "bucket"))
        cands = probes.join(
            base.select(F.col("id").alias("neighbor_id"),
                        F.col("vec").alias("nv"), "bucket"),
            "bucket",
        ).filter(F.col("query_id") != F.col("neighbor_id"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id"))
        topk = (cands.withColumn(
            "cosine", F.round(cosine_vec(F.col("qv"), F.col("nv")), 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
        # idempotent sinks: both writes land in this batch's OWN
        # partition with overwrite, so a retried batch replaces its
        # prior partial output instead of duplicating it (and its
        # index read excludes batch >= batch_id, so a retry never
        # sees its own earlier partial append)
        (topk.write.mode("overwrite")
         .parquet(f"{work_dir}/topk/batch={batch_id}"))
        (keys_new.withColumn("vb_bucket",
                             _hash_bucket("bucket", n_store_buckets))
         .repartition("vb_bucket")
         .write.mode("overwrite").partitionBy("vb_bucket")
         .parquet(f"{work_dir}/index/batch={batch_id}"))

    q = (stream_emb.writeStream.foreachBatch(process)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q.recentProgress
