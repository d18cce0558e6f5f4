"""NER-typed DK injection (GeneralDKInjector analog,
/root/reference/ditto_light/knowledge.py:110-168): differential test
against hand-built expected strings covering each label type, the number
normalizations, and the ID rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from ditto_spark.operators.knowledge import (
    dk_inject_general, dk_inject_general_df,
)

CASES = [
    # (input, expected)
    # number normalization WITHOUT a NUM marker (knowledge.py:152-159)
    ("price 42", "price 42"),
    ("price 42.5", "price 42.50"),
    ("price -3.14159", "price -3.14"),
    ("price +7", "price 7"),
    # ID rule: len >= 7 with a digit (:160-162)
    ("sku abc1234", "sku ID abc1234"),
    ("sku ab12", "sku ab12"),
    # entity labels inserted BEFORE the span start (:145-147)
    ("met maria yesterday", "met PERSON maria yesterday"),
    ("acme corp filed", "acme ORG corp filed"),
    ("ships from tokyo", "ships from LOC tokyo"),
    ("new iphone case", "new PRODUCT iphone case"),
    ("due january 2021", "due DATE january DATE 2021"),
    ("at 10:30 sharp", "at TIME 10:30 sharp"),
    ("weighs 5 kg boxed", "weighs QUANTITY 5 kg boxed"),
    # label + normalization compose: the label precedes the rewritten
    # token ('QUANTITY 2.50 kg'), as the reference emits label then the
    # normalized token text
    ("weighs 2.5 kg", "weighs QUANTITY 2.50 kg"),
    # date-shaped numerics: label AND the ID rule both apply (the
    # reference's :160-162 len>=7-with-digit check runs on every
    # non-number token, including labeled spans)
    ("on 2021-03-05 it", "on DATE ID 2021-03-05 it"),
    ("on 3/5/2021 it", "on DATE ID 3/5/2021 it"),
    # COL/VAL markers pass through as plain tokens (spacy would see them
    # as ordinary words too)
    ("COL name VAL anna", "COL name VAL PERSON anna"),
    # empty + whitespace
    ("", ""),
    ("   ", ""),
    # ---- title-case sequence tier (VERDICT r5 #8) ----
    # TitleCase bigram -> PERSON at the span START only (the reference
    # inserts the spacy label before the span start, never inside)
    ("met Rossi Bianchi today", "met PERSON Rossi Bianchi today"),
    # TitleCase + corporate suffix -> ORG at the start token (the
    # suffix token keeps its own gazetteer ORG label, as in the
    # 'acme ORG corp' case above)
    ("supplier Zorblax Inc filed", "supplier ORG Zorblax ORG Inc filed"),
    # gazetteer tiers outrank the title rules: Maria hits PERSON_FIRST,
    # Rossi is a continuation (prev is TitleCase) -> unlabeled
    ("met Maria Rossi today", "met PERSON Maria Rossi today"),
    # a lone TitleCase token labels nothing (too noisy a signal)
    ("the Widget arrived", "the Widget arrived"),
    # month gazetteer outranks the bigram rule (case-insensitive)
    ("due January Sale", "due DATE January Sale"),
    # state gazetteer -> LOC
    ("ships to texas now", "ships to LOC texas now"),
    ("ships to Texas Austin", "ships to LOC Texas LOC Austin"),
    # ALL-CAPS tokens are not TitleCase (COL/VAL markers stay inert)
    ("COL name VAL Anna Smith", "COL name VAL PERSON Anna Smith"),
]


def test_general_dk_fixture(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(CASES)], "i int, text string")
    got = {r["i"]: r["out"] for r in df.select(
        "i", dk_inject_general(F.col("text")).alias("out")).collect()}
    for i, (inp, want) in enumerate(CASES):
        assert got[i] == want, (inp, got[i], want)


def test_general_dk_df_multi_column(spark):
    df = spark.createDataFrame(
        [("met maria", "acme corp")], "a string, b string")
    row = dk_inject_general_df(df, ["a", "b"]).first()
    assert row["a"] == "met PERSON maria"
    assert row["b"] == "acme ORG corp"


def test_general_dk_pure_codegen(spark):
    """No Python UDF nodes — the injector must stay JVM-side."""
    df = spark.range(5).select(F.col("id").cast("string").alias("text"))
    plan = df.select(dk_inject_general(F.col("text")).alias("o")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
