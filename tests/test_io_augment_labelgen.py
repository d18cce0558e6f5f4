"""I/O adapters, augmentation ops, label-pair generation."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ditto_spark.operators.augment import OPS, _attrs, augment_one, augment_pairs
from ditto_spark.operators.labelgen import (
    class_counts,
    labeled_pairs,
    negative_pairs,
    positive_pairs,
)
from ditto_spark.sources.io import (
    read_candidates_jsonl,
    read_labeled_pairs_tsv,
    write_matches_jsonl,
)


def test_tsv_and_jsonl_readers(spark, tmp_path):
    tsv = tmp_path / "pairs.txt"
    tsv.write_text("COL a VAL 1\tCOL a VAL 2\t0\nCOL b VAL x\tCOL b VAL x\t1\n")
    df = read_labeled_pairs_tsv(spark, str(tsv))
    rows = df.orderBy("label").collect()
    assert [r.label for r in rows] == [0, 1]
    assert rows[1].left == "COL b VAL x"

    jl = tmp_path / "cands.jsonl"
    jl.write_text(
        json.dumps(["left text", "right text"]) + "\n"
        + json.dumps({"left": "l2", "right": "r2", "id": "p7"}) + "\n")
    got = read_candidates_jsonl(spark, str(jl)).orderBy("left_text").collect()
    assert (got[0].left_text, got[0].right_text) == ("l2", "r2")
    assert got[0].pair_id == "p7"
    assert (got[1].left_text, got[1].pair_id) == ("left text", None)


def test_matches_jsonl_sink_contract(spark, tmp_path):
    m = spark.createDataFrame(
        [("a", "b", 1, 0.93)],
        "left_id string, right_id string, match int, match_confidence double")
    out = tmp_path / "out"
    write_matches_jsonl(m, str(out))
    back = spark.read.json(str(out)).collect()[0]
    assert (back.left, back.right, back.match) == ("a", "b", 1)
    assert abs(back.match_confidence - 0.93) < 1e-12


def test_augment_ops_semantics():
    import random

    text = "COL name VAL ann lee COL city VAL new salem"
    assert _attrs(text) == [("name", ["ann", "lee"]),
                            ("city", ["new", "salem"])]
    rng = random.Random(1)
    # drop_sym strips punctuation but keeps markers
    out = augment_one("COL a VAL x-1! COL b VAL ok", "", "drop_sym", rng)
    assert out == "COL a VAL x1 COL b VAL ok"
    # drop_same removes tokens shared with the other side (not attrs)
    out = augment_one(text, "COL name VAL ann smith", "drop_same",
                      random.Random(2))
    assert "ann" not in out.split() and "lee" in out.split()
    # every op returns a parseable COL/VAL stream
    for op in OPS:
        res = augment_one(text, text, op, random.Random(3))
        assert isinstance(res, str)
        _attrs(res)  # must not raise


def test_augment_pairs_deterministic(spark):
    pairs = spark.createDataFrame(
        [(f"p{i}",
          "COL name VAL ann lee COL city VAL salem springs",
          "COL name VAL anne lee COL city VAL salem")
         for i in range(20)],
        "pair_id string, left_text string, right_text string")
    a = {r.pair_id: (r.left_text, r.right_text)
         for r in augment_pairs(pairs, seed=7).collect()}
    b = {r.pair_id: (r.left_text, r.right_text)
         for r in augment_pairs(pairs.repartition(5), seed=7).collect()}
    assert a == b  # partition-independent
    c = {r.pair_id: (r.left_text, r.right_text)
         for r in augment_pairs(pairs, seed=8).collect()}
    assert a != c  # seed actually matters


def test_labelgen_end_to_end(spark):
    rows = [
        ("d1", "ann lee", "L"), ("d2", "ann lee", "L"),
        ("d3", "ann bee lee x", "L"), ("d4", "bob stone", "S"),
        ("d5", "kate reed", "R"), ("d6", "pete moss", "M"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, k string")
    pos = positive_pairs(docs, F.col("k"), overlap_threshold=0.7)
    got = {(r.left_id, r.right_id) for r in pos.collect()}
    assert got == {("d1", "d2")}  # d3 overlap 2/4 = 0.5 <= 0.7

    # n_buckets=1 + sample_mod=1: sample the whole pair space
    neg = negative_pairs(docs, pos, sample_mod=1, n_buckets=1)
    neg_pairs = {(r.left_id, r.right_id) for r in neg.collect()}
    assert ("d1", "d2") not in neg_pairs and len(neg_pairs) > 0

    lp = labeled_pairs(docs, F.col("k"))
    assert set(lp.columns) == {"pair_id", "left_id", "right_id",
                               "left_text", "right_text", "label", "split"}
    cc = class_counts(lp).collect()
    assert all(r.split in ("train", "valid", "test") for r in cc)
