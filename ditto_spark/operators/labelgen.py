"""Labeled-pair generation for matcher training (SURVEY.md J6, A6).

Reference (csv_to_ditto.py):
  positives  `are_likely_matches` — exact key match OR same lastname +
             >0.7 fullname word overlap (:55-83)
  negatives  rejection-sampled random pairs that fail the positive test
             (:110-123)
  splits     70/15/15 train/valid/test, seeded (:131-151)
  counts     per-split class counts printed (:158-161)

Spark-first re-expression:
  positives  = blocking-key equi-join + native word-overlap filter
               (array_intersect / greatest)
  negatives  = deterministic hash-sampled candidate pairs anti-joined
               against positives (left_anti — the set-based form of the
               reference's rejection loop)
  splits     = portable-hash bucketing of pair_id (seed-stable, no RNG
               state, independent of partitioning)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ditto_spark.cachereg import cache_registered
from ditto_spark.operators.hashing import porthash


def word_overlap(a: Column, b: Column) -> Column:
    """|tokens(a) ∩ tokens(b)| / max(|tokens(a)|, |tokens(b)|)
    (csv_to_ditto.py:74-81's fullname overlap)."""
    ta = F.array_distinct(F.filter(F.split(F.lower(a), r"\s+"),
                                   lambda t: t != F.lit("")))
    tb = F.array_distinct(F.filter(F.split(F.lower(b), r"\s+"),
                                   lambda t: t != F.lit("")))
    return (F.size(F.array_intersect(ta, tb)).cast("double")
            / F.greatest(F.size(ta), F.size(tb)))


def positive_pairs(
    docs: DataFrame,
    key: Column,
    overlap_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Equi-join on the blocking key + overlap filter -> likely matches."""
    keyed = docs.select(F.col(id_col).alias("id"),
                        F.col(text_col).alias("txt"), key.alias("k"))
    keyed = cache_registered(keyed)
    a = keyed.select(F.col("id").alias("left_id"),
                     F.col("txt").alias("left_text"), "k")
    b = keyed.select(F.col("id").alias("right_id"),
                     F.col("txt").alias("right_text"),
                     F.col("k").alias("k2"))
    return (
        a.join(b, (F.col("k") == F.col("k2"))
               & (F.col("left_id") < F.col("right_id")))
        .filter(word_overlap(F.col("left_text"), F.col("right_text"))
                > overlap_threshold)
        .select("left_id", "right_id", "left_text", "right_text")
    )


def negative_pairs(
    docs: DataFrame,
    positives: DataFrame,
    sample_mod: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_per_doc: int = 5,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic 'random' non-matching pairs.

    The reference rejection-samples with a seeded RNG (csv_to_ditto.py:
    110-123). Distributed, the candidate space is restricted to pairs
    sharing a hash bucket (an EQUI-join on porthash(id) % n_buckets —
    never a theta-join over the full n^2 pair space), thinned by the
    pair-hash mod filter, capped per doc, then anti-joined against the
    positives (the rejection test). Every step is a pure function of the
    ids, so the sample is seed-stable and partition-independent. Size
    n_buckets ~ n/desired_bucket_rows so bucket joins stay bounded.
    """
    ids = docs.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("txt")).withColumn(
        "_b", porthash(F.col("id").cast("string")) % n_buckets)
    a = ids.select(F.col("id").alias("left_id"),
                   F.col("txt").alias("left_text"), "_b")
    b = ids.select(F.col("id").alias("right_id"),
                   F.col("txt").alias("right_text"),
                   F.col("_b").alias("_b2"))
    pair_hash = porthash(F.concat_ws("|", F.col("left_id"),
                                     F.col("right_id")))
    cands = (
        a.join(b, (F.col("_b") == F.col("_b2"))
               & (F.col("left_id") < F.col("right_id")))
        .filter(pair_hash % sample_mod == 0)
        .drop("_b", "_b2")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("left_id").orderBy("right_id")
    cands = (cands.withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") <= max_per_doc).drop("_rk"))
    return cands.join(positives.select("left_id", "right_id"),
                      ["left_id", "right_id"], "left_anti")


def assign_split(pair_id: Column, seed: int = 42) -> Column:
    """70/15/15 split via portable-hash bucketing (seed-stable stand-in
    for csv_to_ditto.py:131-151's shuffled slicing)."""
    bucket = porthash(F.concat(F.lit(f"split{seed}|"), pair_id)) % 100
    return (F.when(bucket < 70, "train")
            .when(bucket < 85, "valid")
            .otherwise("test"))


def labeled_pairs(
    docs: DataFrame,
    key: Column,
    overlap_threshold: float = 0.7,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full J6: LABELED_PAIR_SCHEMA rows ready for matcher training."""
    pos = positive_pairs(docs, key, overlap_threshold, id_col, text_col)
    neg = negative_pairs(docs, pos, id_col=id_col, text_col=text_col)
    both = (pos.withColumn("label", F.lit(1))
            .unionByName(neg.withColumn("label", F.lit(0))))
    pid = F.concat_ws("|", F.col("left_id"), F.col("right_id"))
    return both.select(
        pid.alias("pair_id"),
        "left_id", "right_id", "left_text", "right_text", "label",
        assign_split(pid, seed).alias("split"),
    )


def class_counts(pairs: DataFrame) -> DataFrame:
    """A6: per-split class counts (csv_to_ditto.py:158-161)."""
    return (pairs.groupBy("split", "label").agg(F.count("*").alias("n"))
            .orderBy("split", "label"))
