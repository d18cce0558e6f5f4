"""Edge/robustness: unicode text, empty docs, null keys, whitespace."""

from __future__ import annotations

from pyspark.sql import functions as F

from ditto_spark.operators.blocking import key_blocking, minhash_band_buckets
from ditto_spark.operators.serialize import parse_serialized, serialize_docs
from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
from ditto_spark.schema import DOC_SCHEMA


def test_unicode_round_trip_and_hashing(spark):
    docs = spark.createDataFrame(
        [("u1", [("name", "Müller Δοκιμή 北京", None, 0),
                 ("note", "naïve — résumé 🚀", None, 1)]),
         ("u2", [("name", "Müller Δοκιμή 北京", None, 0),
                 ("note", "naïve — résumé 🚀", None, 1)])],
        DOC_SCHEMA)
    ser = serialize_docs(docs, drop_empty=True)
    rows = {r.doc_id: r.text for r in ser.collect()}
    assert "Müller Δοκιμή 北京" in rows["u1"]
    parsed = ser.withColumn("p", parse_serialized(F.col("text"))).first().p
    assert parsed[0].text == "Müller Δοκιμή 北京"
    # identical unicode docs produce identical band keys (deterministic
    # utf-8 hashing end to end)
    keys = minhash_band_buckets(ser.select("doc_id", "text"))
    by_doc = {}
    for r in keys.collect():
        by_doc.setdefault(r.id, set()).add(r.block_key)
    assert by_doc["u1"] == by_doc["u2"]


def test_pipeline_survives_pathological_docs(spark):
    rows = [
        ("p1", [("name", "", None, 0)]),                      # empty value
        ("p2", [("name", "   ", None, 0)]),                   # whitespace
        ("p3", [("name", None, None, 0)]),                    # null text
        ("p4", [("m", "", "img://x/1.jpg", 0)]),              # media only
        ("p5", [("name", "ann lee", None, 0),
                ("addr", "1 oak st", None, 1)]),              # normal
        ("p6", [("name", "ann lee", None, 0),
                ("addr", "1 oak st", None, 1)]),              # its dup
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = run_pipeline(spark, docs, PipelineConfig(sn_window=2))
    ents = {r.doc_id: r.entity_id for r in out["entities"].collect()}
    assert set(ents) == {f"p{i}" for i in range(1, 7)}  # nobody dropped
    assert ents["p5"] == ents["p6"]  # the real dup pair still resolves


def test_key_blocking_null_and_empty_keys_filtered(spark):
    df = spark.createDataFrame(
        [("a", "t", "k1"), ("b", "t", None), ("c", "t", ""), ("d", "t", "k1")],
        "doc_id string, text string, k string")
    pairs = key_blocking(df, F.col("k")).collect()
    assert {(p.left_id, p.right_id) for p in pairs} == {("a", "d")}

def test_contamination_pathological_inputs(spark):
    """Empty / whitespace-only / unicode texts and a verbatim train
    copy flow through the contamination check without error and with
    the right verdicts."""
    from ditto_spark.operators.dedup import cross_corpus_contamination

    train = spark.createDataFrame(
        [(0, "café naïve résumé 模型 训练 数据 去重 检查"),
         (2, ""), (4, "   ")],
        "doc_id long, text string")
    test = spark.createDataFrame(
        [(1, "café naïve résumé 模型 训练 数据 去重 检查"),  # verbatim copy
         (3, ""), (5, "   "), (7, "fully novel text nothing shared here")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in cross_corpus_contamination(
        train, test, "doc_id", "text", n=4).collect()}
    assert set(out) == {1, 3, 5, 7}
    # the verbatim copy: every window hits
    assert out[1].contaminated == 1 and out[1].hit_fraction == 1.0
    # empty/whitespace docs: zero windows, clean, fraction 0
    for d in (3, 5):
        assert out[d].n_grams == 0 and out[d].contaminated == 0
    assert out[7].contaminated == 0


def test_table_pipeline_pathological_tables(spark):
    """Catalog-path robustness: empty tables, all-null attribute
    columns, and unicode values flow through flat_to_docs +
    run_table_pipeline without error and with sane results."""
    from ditto_spark.operators.serialize import flat_to_docs
    from ditto_spark.plans.pipeline import run_table_pipeline
    from ditto_spark.sources.io import drop_table

    # empty flat table: zero matches, zero entities, no crash
    empty = spark.createDataFrame([], "doc_id string, a string, b string")
    out = run_table_pipeline(spark, df=empty)
    assert out["layout"] == "testing"
    assert out["matches"].count() == 0
    assert out["entities"].count() == 0

    # all-null attributes: serialized text is empty, docs survive as
    # singleton entities
    nulls = spark.createDataFrame(
        [("n1", None, None), ("n2", None, None)],
        "doc_id string, a string, b string")
    out2 = run_table_pipeline(spark, df=nulls)
    ents = {r["doc_id"]: r["entity_id"] for r in out2["entities"].collect()}
    assert set(ents) == {"n1", "n2"}
    assert ents["n1"] != ents["n2"]  # empty texts must not all-match

    # unicode values through a REAL metastore table
    drop_table(spark, "t_robust_uni")
    spark.createDataFrame(
        [("u1", "Müller Δοκιμή 北京"), ("u2", "Müller Δοκιμή 北京"),
         ("u3", "totally different text")],
        "doc_id string, name string").write.saveAsTable("t_robust_uni")
    out3 = run_table_pipeline(spark, "t_robust_uni")
    matched = {frozenset((r.left_id, r.right_id))
               for r in out3["matches"].filter("match = 1").collect()}
    assert frozenset(("u1", "u2")) in matched
    assert not any("u3" in p for p in matched)

    # production layout with an empty table: no pairs, no crash
    pempty = spark.createDataFrame([], "x_left string, x_right string")
    out4 = run_table_pipeline(spark, df=pempty)
    assert out4["layout"] == "production"
    assert out4["matches"].count() == 0
