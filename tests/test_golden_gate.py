"""Golden-hash content gates (VERDICT r3 #1): the two oracle-less driver
entries must assert CONTENT, not just rows — and a perturbed model
weight or a drifted result must flip them red."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _entry(name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name]


def test_model_scores_passes_committed_golden(spark):
    """The real entry runs green against the committed golden (the gate
    executes inside the entry; reaching collect() proves it passed)."""
    out = _entry("er_model_scores")(spark, SF).collect()
    assert len(out) == 499


def test_pipeline_matches_passes_committed_golden(spark):
    out = _entry("er_pipeline_matches")(spark, SF).collect()
    assert len(out) == 1021


def test_gate_raises_on_drifted_content(spark, monkeypatch):
    """A golden mismatch must RAISE — the driver can never record a
    drifted result as green."""
    from ditto_spark import golden

    real = golden.load_goldens()
    fake = {"er_model_scores":
            {"sf0.001": {"rows": 499, "cols": [], "hash": "0" * 32}}}
    monkeypatch.setattr(golden, "_GOLDENS_CACHE", fake)
    with pytest.raises(AssertionError, match="golden content gate FAILED"):
        _entry("er_model_scores")(spark, SF).collect()
    monkeypatch.setattr(golden, "_GOLDENS_CACHE", real)


def test_perturbed_weights_change_the_hash(spark):
    """Weight sensitivity: the same query with seed-1 weights hashes
    DIFFERENTLY from the committed seed-0 golden, so a wrong checkpoint
    flowing through the distributed scorer cannot pass the gate."""
    import __spark_entry__ as entrymod
    from ditto_spark import golden
    from ditto_spark.operators.npmodel import NumpyDittoBackend, make_weights
    from ditto_spark.operators.scoring import score_pairs
    from ditto_spark.operators.blocking import sorted_neighborhood

    w1 = make_weights(seed=1)
    ser = entrymod._er_serialize(spark, SF).select(
        "doc_id", F.col("serialized").alias("text"))
    pairs = sorted_neighborhood(ser, F.lower(F.col("text")), window=1)
    scored = score_pairs(pairs, 0.10,
                         lambda: NumpyDittoBackend(w1, micro_batch=64))
    res = scored.select("left_id", "right_id", "match",
                        F.round("p1", 6).alias("p1r"))
    n, cols, h = golden.canon_pandas(res.toPandas())
    committed = golden.load_goldens()["er_model_scores"]["sf0.001"]
    assert n == committed["rows"]          # same pairs, different scores
    assert h != committed["hash"]


def test_gate_noop_without_golden(spark):
    """Scale factors with no committed golden (bench sf0.1, production)
    pass through with zero collect cost."""
    from ditto_spark import golden

    calls = []
    df = spark.range(3)
    orig = df.toPandas

    class Spy:
        def __getattr__(self, a):
            if a == "toPandas":
                calls.append(1)
                return orig
            return getattr(df, a)

    out = golden.content_gate(Spy(), "er_model_scores", "/x/sf0.1")
    assert calls == [] and out is not None
