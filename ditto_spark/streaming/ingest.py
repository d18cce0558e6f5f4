"""Structured Streaming ingest for the document pipeline.

The reference is batch-only (SURVEY.md §2.8); this is the incremental
path a production corpus needs: new document files land continuously,
get serialized, exact-deduped within a watermark, and emit windowed
ingest metrics. Checkpointed — restart resumes from the last committed
offsets (the streaming analog of sources/checkpoint.py's idempotence).

Use ``availableNow`` trigger for batch-like drains (that's also how the
tests drive it deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ditto_spark.operators.serialize import serialize_spans
from ditto_spark.schema import DOC_SCHEMA


def read_doc_stream(spark: SparkSession, path: str,
                    with_ts: bool = True) -> DataFrame:
    """File-source stream of spans docs (parquet dir). Event time comes
    from the source's ``ingest_ts`` column; rows without one fall back to
    processing time (current_timestamp at read) — otherwise null event
    times would be silently dropped by every downstream watermark.
    ``with_ts=False`` keeps nulls as-is for callers that filter or
    assign event time themselves."""
    from pyspark.sql.types import StructField, StructType, TimestampType

    schema = StructType(
        list(DOC_SCHEMA.fields)
        + [StructField("ingest_ts", TimestampType(), True)]
    )
    stream = spark.readStream.schema(schema).parquet(path)
    if with_ts:
        stream = stream.withColumn(
            "ingest_ts",
            F.coalesce(F.col("ingest_ts"), F.current_timestamp()))
    return stream


def serialize_stream(docs: DataFrame) -> DataFrame:
    """Stateless map: the same serialization operator works unchanged on
    the stream (no shuffle, no state)."""
    return docs.withColumn("text",
                           serialize_spans(F.col("spans"), drop_empty=True))


def dedup_stream(docs: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exact dedup on content hash within the watermark horizon —
    bounded state (dropDuplicates on an unbounded stream would leak)."""
    return (
        serialize_stream(docs)
        .withColumn("text_hash", F.md5(F.col("text")))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def windowed_ingest_metrics(docs: DataFrame, window: str = "1 minute",
                            watermark: str = "10 minutes") -> DataFrame:
    """Per-window ingest counts + distinct-content estimate; late data
    beyond the watermark is dropped (the documented contract)."""
    return (
        serialize_stream(docs)
        .withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("w"))
        .agg(
            F.count("*").alias("docs"),
            F.approx_count_distinct("text").alias("approx_distinct"),
        )
        .select(F.col("w.start").alias("window_start"), "docs",
                "approx_distinct")
    )


def run_to_sink(stream_df: DataFrame, out_path: str, checkpoint: str,
                mode: str = "append") -> None:
    """Drain everything currently available to a parquet sink, then stop
    (availableNow) — deterministic for tests; swap the trigger for
    continuous production runs."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
