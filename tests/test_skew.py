"""Skew handling: hot blocking keys are salted into bounded sub-blocks."""

from __future__ import annotations

from pyspark.sql import functions as F

from ditto_spark.operators.blocking import key_blocking, salt_hot_keys


def _skewed(spark, n_hot=3000, n_cold=50):
    hot = [(f"h{i:05d}", f"text {i}", "HOTKEY") for i in range(n_hot)]
    cold = [(f"c{i:05d}", f"text {i}", f"k{i % 10}") for i in range(n_cold)]
    return spark.createDataFrame(hot + cold,
                                 "id string, txt string, block_key string")


def test_salt_hot_keys_bounds_groups(spark):
    df = _skewed(spark)
    salted = salt_hot_keys(df, max_rows_per_key=500, n_salts=16)
    sizes = salted.groupBy("block_key").count().collect()
    hot_groups = [r for r in sizes if r.block_key.startswith("HOTKEY#")]
    assert len(hot_groups) == 16
    assert max(r["count"] for r in hot_groups) < 500  # ~3000/16 ≈ 188
    # cold keys untouched
    assert {r.block_key for r in sizes if r.block_key.startswith("k")} \
        == {f"k{i}" for i in range(10)}
    # deterministic across partitionings
    again = salt_hot_keys(df.repartition(13), max_rows_per_key=500)
    a = sorted((r.id, r.block_key) for r in salted.collect())
    b = sorted((r.id, r.block_key) for r in again.collect())
    assert a == b


def test_key_blocking_with_salting_bounds_pairs(spark):
    df = _skewed(spark, n_hot=2000, n_cold=20)
    # unsalted + uncapped would be C(2000,2) ≈ 2M pairs on ONE key;
    # salted: 16 sub-blocks of ~125 -> ~16 * C(125,2) ≈ 124k
    pairs = key_blocking(df, F.col("block_key"), id_col="id",
                         text_col="txt", max_block_rows=None,
                         salt_above=500, n_salts=16)
    n = pairs.count()
    assert 50_000 < n < 300_000
    # no pair crosses salt groups
    assert pairs.filter(~F.col("block_key").contains("#")
                        & F.col("block_key").startswith("HOT")).count() == 0