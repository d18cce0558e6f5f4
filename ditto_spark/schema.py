"""Canonical schemas for the engine.

The primary input is the interleaved-spans document table from
BASELINE.json's input_hint:

    doc_id: string,
    spans:  array<struct<kind:string, text:string, media_ref:string,
                         offset:int>>

This generalizes the reference's flat attribute dict (one span plays the
role of one ``COL <attr> VAL <value>`` unit; cf. matcher.py:51-60 in
/root/reference). ``media_ref`` spans model opaque media attachments and
are injected as typed tokens during serialization (analogous to the DK
injector's PRODUCT/NUM/ID tokens, ditto_light/knowledge.py:78-105).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), True),
    ]
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE), False),
    ]
)

# ER-Magellan-style labeled pair (reference: README.md:33-36,
# ditto_light/dataset.py:42-45)
LABELED_PAIR_SCHEMA = StructType(
    [
        StructField("pair_id", StringType(), False),
        StructField("left_id", StringType(), False),
        StructField("right_id", StringType(), False),
        StructField("left_text", StringType(), False),
        StructField("right_text", StringType(), False),
        StructField("label", IntegerType(), False),
        StructField("split", StringType(), False),
    ]
)

# candidate pair produced by blocking (reference analog: jsonl
# [left, right] lines, matcher.py:162-177 — never a file here)
CANDIDATE_SCHEMA = StructType(
    [
        StructField("left_id", StringType(), False),
        StructField("right_id", StringType(), False),
        StructField("left_text", StringType(), False),
        StructField("right_text", StringType(), False),
        StructField("block_key", StringType(), True),
        StructField("sim", DoubleType(), True),
    ]
)

# match result (reference: matcher.py:156-160 jsonl sink;
# hive_ditto_standalone.py:409-419 Hive DDL)
MATCH_SCHEMA = StructType(
    [
        StructField("left_id", StringType(), False),
        StructField("right_id", StringType(), False),
        StructField("match", IntegerType(), False),
        StructField("match_confidence", DoubleType(), False),
    ]
)
