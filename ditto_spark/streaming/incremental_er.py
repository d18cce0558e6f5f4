"""Incremental entity resolution: stream new docs against a static,
pre-indexed corpus.

Production pattern the batch reference cannot express (it is file-batch
only, SURVEY.md §2.8): documents arrive continuously; each micro-batch
is serialized, bucketed with the SAME MinHash band keys as the indexed
corpus, joined bucket-to-bucket against the corpus index (equi-join —
the micro-batch side is small, so Spark broadcasts it), scored with the
standard pair scorer, and appended to a matches sink. Restart resumes
from the streaming checkpoint; the corpus index is built once with
``build_corpus_index`` and read back per batch.

At cluster scale the corpus index is an Iceberg/parquet table
partitioned by band-key hash; each micro-batch touches only the buckets
its new docs hash into (partition pruning on the join key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ditto_spark.operators.blocking import minhash_band_buckets
from ditto_spark.operators.scoring import SurrogateBackend, score_pairs
from ditto_spark.operators.serialize import serialize_spans


def build_corpus_index(
    corpus_docs: DataFrame,
    path: str,
    n_hashes: int = 24,
    bands: int = 6,
    shingle_n: int = 3,
) -> None:
    """Materialize (band block_key, doc_id, text) for the static corpus,
    bucketed for the incremental join."""
    ser = corpus_docs.withColumn(
        "text", serialize_spans(F.col("spans"), drop_empty=True))
    keys = minhash_band_buckets(ser, "doc_id", "text", n_hashes, bands,
                                shingle_n)
    (keys.join(ser.select("doc_id", "text").withColumnRenamed("doc_id", "id"),
               "id")
     .select(F.col("id").alias("corpus_id"),
             F.col("text").alias("corpus_text"), "block_key")
     .write.mode("overwrite").parquet(path))


def incremental_matches(
    spark: SparkSession,
    stream_docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.5,
    n_hashes: int = 24,
    bands: int = 6,
    shingle_n: int = 3,
    backend_factory=SurrogateBackend,
) -> None:
    """Drain the doc stream, matching each micro-batch against the
    corpus index; (new_id, corpus_id, match, match_confidence) appended
    to ``out_path``. availableNow trigger → deterministic drains."""
    index = spark.read.parquet(index_path)

    def process(batch: DataFrame, batch_id: int) -> None:
        ser = batch.withColumn(
            "text", serialize_spans(F.col("spans"), drop_empty=True))
        keys = minhash_band_buckets(ser, "doc_id", "text", n_hashes,
                                    bands, shingle_n)
        probes = keys.join(
            ser.select(F.col("doc_id").alias("id"), "text"), "id")
        cands = (
            probes.join(index, "block_key")
            .filter(F.col("id") != F.col("corpus_id"))
            .select(F.col("id").alias("left_id"),
                    F.col("corpus_id").alias("right_id"),
                    F.col("text").alias("left_text"),
                    F.col("corpus_text").alias("right_text"),
                    "block_key")
            .dropDuplicates(["left_id", "right_id"])
        )
        scored = score_pairs(cands, threshold, backend_factory)
        # idempotent per-batch sink: a batch retried after a crash
        # OVERWRITES its own partition instead of blind-appending dupes
        (scored.select("left_id", "right_id", "match", "match_confidence")
         .write.mode("overwrite")
         .parquet(f"{out_path}/batch={batch_id}"))

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
