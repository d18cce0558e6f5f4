"""Serialization contract + the per-row round-trip invariant
(BASELINE.json input_hint: span-sequence equality of kind/text/media_ref/
order through serialization round-trips)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ditto_spark.operators.serialize import (
    detect_layout,
    parse_serialized,
    serialize_docs,
    serialize_flat,
    split_production,
    strip_column_prefixes,
)
from ditto_spark.synth import docs_df


def test_serialize_format(spark):
    df = spark.createDataFrame(
        [("d1", [("name", "  Ann Lee ", None, 0),
                 ("price", "12.50", None, 1),
                 ("media", "", "img://b/1.jpg", 2)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = serialize_docs(df).select("text").first()[0]
    assert out == "COL name VAL Ann Lee COL price VAL 12.50 COL media VAL [MEDIA] img://b/1.jpg"


def test_serialize_respects_offset_order(spark):
    # spans listed out of offset order must serialize in offset order
    df = spark.createDataFrame(
        [("d1", [("b", "two", None, 1), ("a", "one", None, 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = serialize_docs(df).select("text").first()[0]
    assert out == "COL a VAL one COL b VAL two"


def test_drop_empty_matches_reference_skip(spark):
    # matcher.py:53-57 skips NaN/blank values
    df = spark.createDataFrame(
        [("d1", [("name", "ann", None, 0), ("note", "   ", None, 1),
                 ("city", None, None, 2)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = serialize_docs(df, drop_empty=True).select("text").first()[0]
    assert out == "COL name VAL ann"


def test_round_trip_invariant_on_fixture(spark):
    docs = docs_df(spark, n_entities=60)
    ser = serialize_docs(docs, drop_empty=True)
    rt = ser.withColumn("parsed", parse_serialized(F.col("text")))
    # expected = original spans minus empties, trimmed, reindexed
    expected = rt.withColumn(
        "expect",
        F.transform(
            F.filter(
                F.col("spans"),
                lambda s: s["media_ref"].isNotNull()
                | (F.trim(F.coalesce(s["text"], F.lit(""))) != ""),
            ),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.trim(F.coalesce(s["text"], F.lit(""))).alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        ),
    ).withColumn(
        "got",
        F.transform(
            F.col("parsed"),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        ),
    )
    bad = expected.filter(F.col("expect") != F.col("got")).count()
    assert bad == 0


def test_flat_and_production_layouts(spark):
    prod = spark.createDataFrame(
        [("ann", "anne", "12 oak st", "12 oak street")],
        "name_left string, name_right string, addr_left string, addr_right string",
    )
    assert detect_layout(prod) == "production"
    pairs = split_production(prod).collect()
    assert len(pairs) == 1
    assert pairs[0].left_text == "COL addr VAL 12 oak st COL name VAL ann"
    assert pairs[0].right_text == "COL addr VAL 12 oak street COL name VAL anne"

    flat = spark.createDataFrame([("ann", None)], "name string, city string")
    assert detect_layout(flat) == "testing"
    assert serialize_flat(flat, ["name", "city"]).first().text == "COL name VAL ann"

    pref = spark.createDataFrame([(1,)], "`t.x` int")
    assert strip_column_prefixes(pref).columns == ["x"]
