"""Catalog-table source/sink parity (S1/S7 full — VERDICT r5 #1):
`spark.read.table` input, production/testing layout auto-detect against
real metastore tables, and the set-based result-table sink — e2e
through `run_table_pipeline` and the CLI, using Spark's built-in
catalog (`saveAsTable`), the in-sandbox stand-in for a Hive/Iceberg
metastore. Reference flow: hive_ditto_standalone.py:68-115 (detect),
:289-311 (extract), :371-454 (save)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def _make_table(spark, name: str, df) -> str:
    from ditto_spark.sources.io import drop_table

    drop_table(spark, name)  # robust to orphaned locations (ephemeral
    df.write.saveAsTable(name)  # in-memory catalog across test runs)
    return name


def test_read_table_and_limit(spark):
    from ditto_spark.sources.io import read_table

    _make_table(spark, "t_read", spark.range(100).toDF("id"))
    assert read_table(spark, "t_read").count() == 100
    assert read_table(spark, "t_read", limit=7).count() == 7


def test_flat_to_docs_matches_serialize_flat(spark):
    """flat_to_docs -> serialize_spans(drop_empty) must equal
    serialize_flat on the same flat record — the invariant that lets
    the full docs pipeline consume relational tables unchanged."""
    from ditto_spark.operators.serialize import (flat_to_docs,
                                                 serialize_docs,
                                                 serialize_flat)

    flat = spark.createDataFrame(
        [("1", "ann", None, "nyc"), ("2", "bob", "x", " ")],
        "doc_id string, name string, note string, city string")
    docs = flat_to_docs(flat)
    via_spans = {r["doc_id"]: r["text"] for r in
                 serialize_docs(docs, drop_empty=True).collect()}
    via_flat = {r["doc_id"]: r["text"] for r in
                serialize_flat(flat, ["name", "note", "city"]).collect()}
    assert via_spans == via_flat
    assert via_spans["1"] == "COL name VAL ann COL city VAL nyc"
    # no id column: deterministic content-hash ids, stable across
    # partitionings
    noid = flat.drop("doc_id")
    ids1 = sorted(r["doc_id"] for r in flat_to_docs(noid).collect())
    ids2 = sorted(r["doc_id"] for r in
                  flat_to_docs(noid.repartition(3)).collect())
    assert ids1 == ids2 and len(set(ids1)) == 2


def test_table_pipeline_testing_layout(spark, tmp_path):
    """A flat metastore table auto-detects as 'testing' and runs the
    FULL pipeline: duplicates of one record match + cluster together,
    and the result table lands via one set-based saveAsTable."""
    from ditto_spark.plans.pipeline import run_table_pipeline

    rows = [
        ("a1", "anthology of modern verse", "poetry press", "london"),
        ("a2", "anthology of modern verse", "poetry press", "london"),
        ("b1", "cooking with gas", "kitchen co", "paris"),
        ("b2", "cooking with gas", "kitchen co", "paris"),
        ("c1", "unrelated machine manual", "industrial inc", "berlin"),
    ]
    _make_table(spark, "t_flat", spark.createDataFrame(
        rows, "doc_id string, title string, publisher string, city string"))
    spark.sql("DROP TABLE IF EXISTS t_flat_out")
    out = run_table_pipeline(spark, "t_flat", output_table="t_flat_out")
    assert out["layout"] == "testing"
    matched = {frozenset((r.left_id, r.right_id))
               for r in out["matches"].filter("match = 1").collect()}
    assert frozenset(("a1", "a2")) in matched
    assert frozenset(("b1", "b2")) in matched
    assert not any("c1" in p for p in matched)
    ents = {r["doc_id"]: r["entity_id"] for r in out["entities"].collect()}
    assert ents["a1"] == ents["a2"] and ents["b1"] == ents["b2"]
    assert len(set(ents.values())) == 3
    # result table: reference DDL columns, one row per scored pair
    res = spark.read.table("t_flat_out")
    assert set(res.columns) == {"left_id", "right_id", "match_probability",
                                "is_match", "created_at"}
    assert res.filter("is_match").count() == 2
    # overwrite mode: a re-run replaces, not accumulates
    run_table_pipeline(spark, "t_flat", output_table="t_flat_out")
    assert spark.read.table("t_flat_out").filter("is_match").count() == 2


def test_table_pipeline_production_layout(spark):
    """A *_left/*_right metastore table auto-detects as 'production'
    and goes straight to scoring — no blocking, no clustering."""
    from ditto_spark.plans.pipeline import run_table_pipeline

    rows = [
        ("ann smith", "nyc", "ann smith", "nyc"),        # same entity
        ("bob jones", "la", "carol white", "chicago"),   # different
    ]
    _make_table(spark, "t_prod", spark.createDataFrame(
        rows, "name_left string, city_left string, "
              "name_right string, city_right string"))
    out = run_table_pipeline(spark, "t_prod")
    assert out["layout"] == "production"
    assert "entities" not in out
    got = out["scored"].collect()
    assert len(got) == 2
    by_left = {r.left_id: r for r in got}
    matches = [r for r in got if r["match"] == 1]
    assert len(matches) == 1
    assert "ann smith" in _left_text_of(out, matches[0])


def _left_text_of(out, row):
    # production scored rows keep left_text on the native path
    return row["left_text"] if "left_text" in row.__fields__ else ""


def test_table_pipeline_strips_prefixes_and_detects(spark):
    """`tablename.column` prefixed frames (HiveServer2 result style)
    strip before layout detect — production pairs hidden behind
    prefixes are still found. Fed via df= (parquet/metastore tables
    cannot carry dotted column names)."""
    from ditto_spark.plans.pipeline import run_table_pipeline

    df = spark.createDataFrame(
        [("x", "x"), ("y", "z")], "l string, r string").select(
        F.col("l").alias("t.name_left"),
        F.col("r").alias("t.name_right"))
    out = run_table_pipeline(spark, df=df)
    assert out["layout"] == "production"
    assert out["scored"].count() == 2


def test_bucketed_tables_join_without_shuffle(spark):
    """write_bucketed_table: two tables bucketed by the same key and
    count sort-merge-join with ZERO Exchange nodes — the co-located
    join layout for the doc/pair tables the engine joins repeatedly
    (at scale this is the difference between a per-bucket local merge
    and a full-corpus shuffle per text attach)."""
    from ditto_spark.sources.io import write_bucketed_table

    docs = spark.range(1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text"))
    pairs = spark.range(500).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit(1).alias("x"))
    write_bucketed_table(docs, "bk_docs", ["doc_id"], 8,
                         sort_cols=["doc_id"])
    write_bucketed_table(pairs, "bk_pairs", ["doc_id"], 8,
                         sort_cols=["doc_id"])
    # merge hint pins SMJ (the at-scale strategy) — otherwise the tiny
    # test tables broadcast and the assertion measures nothing
    j = (spark.read.table("bk_docs").hint("merge")
         .join(spark.read.table("bk_pairs"), "doc_id"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    assert j.count() == 500
    # the same join on unbucketed frames shuffles both sides
    base = (docs.hint("merge").join(pairs, "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert base.count("Exchange") == 2
    # rewrite with a different bucket count replaces cleanly
    write_bucketed_table(pairs, "bk_pairs", ["doc_id"], 4)
    assert spark.read.table("bk_pairs").count() == 500


def test_cli_npz_backend_e2e(spark, tmp_path):
    """--backend npz: a converted reference-layout checkpoint + its
    vocab score the pipeline end-to-end with no torch anywhere."""
    import numpy as np

    from ditto_spark.cli import main
    from ditto_spark.operators.npmodel import save_checkpoint
    from tests.test_convert_checkpoint import _hf_state, H, V as VS
    from tools.convert_checkpoint import convert_state

    weights, _ = convert_state({"model": _hf_state()}, n_heads=H)
    ckpt = str(tmp_path / "model.npz")
    save_checkpoint(weights, ckpt)
    vocab_path = str(tmp_path / "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]"] +
                          [f"w{i}" for i in range(VS - 4)]) + "\n")
    outdir = str(tmp_path / "out")
    rc = main(["--synthetic", "60", "--output", outdir,
               "--backend", "npz", "--model-checkpoint", ckpt,
               "--vocab", vocab_path, "--cores", "4"])
    assert rc == 0
    m = spark.read.parquet(f"{outdir}/matches")
    assert m.count() > 0
    probs = [r["match_probability"] for r in m.limit(20).collect()]
    assert all(np.isfinite(p) and 0 < p < 1 for p in probs)


def test_cli_table_e2e(spark, tmp_path):
    """CLI: --table in, --output-table out, parquet matches dir too."""
    from ditto_spark.cli import main

    rows = [("d1", "gamma widget deluxe", "acme"),
            ("d2", "gamma widget deluxe", "acme"),
            ("d3", "solo item nothing alike", "zorp")]
    _make_table(spark, "t_cli", spark.createDataFrame(
        rows, "doc_id string, title string, maker string"))
    spark.sql("DROP TABLE IF EXISTS t_cli_out")
    outdir = str(tmp_path / "out")
    rc = main(["--table", "t_cli", "--output", outdir,
               "--output-table", "t_cli_out", "--cores", "4"])
    assert rc == 0
    m = spark.read.parquet(f"{outdir}/matches")
    assert m.filter("is_match").count() == 1
    assert spark.read.table("t_cli_out").filter("is_match").count() == 1
    ents = spark.read.parquet(f"{outdir}/entities")
    e = {r["doc_id"]: r["entity_id"] for r in ents.collect()}
    assert e["d1"] == e["d2"] != e["d3"]
