"""Blocking-layer tests: pair semantics, caps, recall on planted dups."""

from __future__ import annotations

from pyspark.sql import functions as F

from ditto_spark.operators.blocking import (
    cross_pairs,
    key_blocking,
    minhash_lsh_blocking,
    self_pairs,
    sorted_neighborhood,
    union_candidates,
)
from ditto_spark.operators.serialize import serialize_docs
from ditto_spark.synth import docs_df, truth_df


def _fixture(spark, n=80):
    docs = serialize_docs(docs_df(spark, n_entities=n), drop_empty=True)
    truth = truth_df(spark, n_entities=n)
    return docs.select("doc_id", "text"), truth


def _recall(pairs, truth) -> float:
    t = truth
    true_pairs = (
        t.alias("a")
        .join(t.alias("b"), F.col("a.cluster_id") == F.col("b.cluster_id"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("left_id"),
            F.col("b.doc_id").alias("right_id"),
        )
    )
    total = true_pairs.count()
    hit = true_pairs.join(
        pairs.select("left_id", "right_id").distinct(),
        ["left_id", "right_id"],
    ).count()
    return hit / total if total else 1.0


def test_self_pairs_count(spark):
    df = spark.createDataFrame(
        [(f"d{i}", f"t{i}") for i in range(5)], "doc_id string, text string"
    )
    assert self_pairs(df).count() == 10  # C(5,2)
    other = spark.createDataFrame([("x1", "a"), ("x2", "b")],
                                  "doc_id string, text string")
    assert cross_pairs(df, other).count() == 10


def test_key_blocking_pairs_and_cap(spark):
    df = spark.createDataFrame(
        [("d1", "ann smith"), ("d2", "anne smith"), ("d3", "bob jones"),
         ("d4", "ann smyth")],
        "doc_id string, text string",
    )
    key = F.substring(F.col("text"), 1, 3)
    pairs = key_blocking(df, key).collect()
    got = {(p.left_id, p.right_id) for p in pairs}
    assert got == {("d1", "d2"), ("d1", "d4"), ("d2", "d4")}
    # cap: max_block_rows=2 keeps only the 2 smallest ids per key -> 1 pair
    capped = key_blocking(df, key, max_block_rows=2)
    assert {(p.left_id, p.right_id) for p in capped.collect()} == {("d1", "d2")}


def test_sorted_neighborhood_window(spark):
    df = spark.createDataFrame(
        [(f"d{i}", f"{chr(97 + i)}text") for i in range(6)],
        "doc_id string, text string",
    )
    pairs = sorted_neighborhood(df, F.col("text"), window=2)
    got = {(p.left_id, p.right_id) for p in pairs.collect()}
    expected = {(f"d{i}", f"d{j}") for i in range(6) for j in range(6)
                if 0 < j - i <= 2}
    assert got == expected


def test_minhash_lsh_finds_near_dups(spark):
    docs, truth = _fixture(spark)
    # short entity records + heavy corruptions -> 2-gram shingles
    # (3-grams are brittle under the fixture's 12% typo rate)
    pairs = minhash_lsh_blocking(docs, n_hashes=16, bands=8, shingle_n=2)
    rec = _recall(pairs, truth)
    assert rec > 0.65, f"minhash recall too low: {rec}"


def test_multi_pass_union_recall(spark):
    docs, truth = _fixture(spark)
    p1 = minhash_lsh_blocking(docs, n_hashes=16, bands=8, shingle_n=2)
    p2 = sorted_neighborhood(docs, F.col("text"), window=4)
    merged = union_candidates(p1, p2)
    rec = _recall(merged, truth)
    assert rec > 0.8, f"union recall too low: {rec}"
    # pair dedupe holds
    assert merged.count() == merged.select("left_id", "right_id").distinct().count()


def test_blocking_quality_planted(spark):
    """Exact completeness/reduction arithmetic on a planted corpus:
    5 docs -> 10 possible pairs; truth = 4 pairs; candidates = 3 of the
    4 truth pairs + 2 non-dup pairs (one given reversed + duplicated to
    exercise canonicalization)."""
    from ditto_spark.operators.blocking import blocking_quality

    corpus = spark.createDataFrame([(i,) for i in range(5)], "doc_id int")
    truth = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 4)], "left_id int, right_id int")
    cand = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (3, 4), (0, 4), (2, 3)],
        "left_id int, right_id int")
    row = blocking_quality(cand, truth, corpus).first()
    assert row.n_docs == 5 and row.n_candidates == 5
    assert row.n_truth == 4 and row.n_hit == 3
    assert row.pair_completeness == 0.75
    assert row.reduction_ratio == 0.5  # 1 - 5/10

    # degenerate: empty truth -> completeness clamps via greatest(,1)
    empty = truth.limit(0)
    row2 = blocking_quality(cand, empty, corpus).first()
    assert row2.n_truth == 0 and row2.pair_completeness == 0.0


def test_lsh_tuning_curve_monotone(spark):
    """More bands (fewer rows/band) can only ADD band keys over the
    same signature -> candidate set grows monotonically and so does
    pair completeness; rows_per_band = n_hashes // bands."""
    from ditto_spark.operators.blocking import lsh_tuning_curve
    from ditto_spark.operators.dedup import ngram_jaccard_pairs

    base = [
        "alpha beta gamma delta epsilon zeta", 
        "alpha beta gamma delta epsilon eta",
        "one two three four five six",
        "one two three four five seven",
        "totally different words here now folks",
        "unrelated content again entirely other",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base)], "doc_id int, text string")
    truth = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                threshold=0.2, max_shingle_df=None)
    curve = lsh_tuning_curve(docs.selectExpr("doc_id", "text"), truth,
                             docs, band_configs=[2, 4, 8],
                             n_hashes=16).collect()
    assert [r.bands for r in curve] == [2, 4, 8]
    assert [r.rows_per_band for r in curve] == [8, 4, 2]
    cands = [r.n_candidates for r in curve]
    pcs = [r.pair_completeness for r in curve]
    assert cands == sorted(cands)
    assert pcs == sorted(pcs)
    assert all(r.n_truth == curve[0].n_truth for r in curve)


def test_choose_banding(spark):
    from ditto_spark.operators.blocking import choose_banding

    curve = spark.createDataFrame(
        [(2, 12, 9, 0.36), (6, 4, 23, 0.92), (12, 2, 35, 1.0)],
        "bands int, rows_per_band int, n_candidates long, "
        "pair_completeness double")
    assert choose_banding(curve, 0.9)["bands"] == 6   # cheapest >= 0.9
    assert choose_banding(curve, 0.95)["bands"] == 12
    assert choose_banding(curve, 1.1)["bands"] == 12  # unreachable -> best
