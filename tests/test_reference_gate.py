"""THE quality gate (BASELINE.md): the Spark pipeline must reproduce the
reference decision logic — reimplemented independently in
tests/reference_oracle.py — on identical candidate pairs at the same
blocking key, pairwise F1 >= 0.99. Serialization must agree string-for-
string (the preprocessing-fidelity requirement, SURVEY.md §7 'hard
parts')."""

from __future__ import annotations

from pyspark.sql import functions as F

from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
from ditto_spark.synth import docs_df, gen_docs_pandas

from tests import reference_oracle as ref


def test_serialization_matches_reference_spec(spark):
    docs_pd, _ = gen_docs_pandas(n_entities=50)
    docs = docs_df(spark, n_entities=50)
    from ditto_spark.operators.serialize import serialize_docs

    got = {r.doc_id: r.text
           for r in serialize_docs(docs, drop_empty=True).collect()}
    for rec in docs_pd.to_dict("records"):
        assert got[rec["doc_id"]] == ref.serialize(rec["spans"]), rec["doc_id"]


def test_dk_matches_reference_spec(spark):
    from ditto_spark.operators.knowledge import dk_inject

    samples = [
        "COL price VAL 12.5 COL qty VAL 42",
        "COL sku VAL AB12CD34EF COL note VAL plain words",
        "COL x VAL -7 COL y VAL .25 COL z VAL a-1234567Z",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r.o for r in df.select(dk_inject(F.col("t")).alias("o")).collect()]
    assert got == [ref.dk_inject(s) for s in samples]


def test_pipeline_decisions_f1_vs_reference(spark):
    docs = docs_df(spark, n_entities=70)
    out = run_pipeline(spark, docs, PipelineConfig())
    scored = out["scored"].collect()
    assert len(scored) > 100
    tp = fp = fn = agree = 0
    for r in scored:
        ref_match, ref_conf = ref.decide(r.left_text, r.right_text, 0.5)
        agree += int(ref_match == r.match)
        tp += int(ref_match == 1 and r.match == 1)
        fp += int(ref_match == 0 and r.match == 1)
        fn += int(ref_match == 1 and r.match == 0)
        if ref_match == r.match:
            assert abs(ref_conf - r.match_confidence) < 1e-9
    f1 = (2 * tp / (2 * tp + fp + fn)) if (2 * tp + fp + fn) else 1.0
    assert f1 >= 0.99, (f1, agree, len(scored))
    assert agree == len(scored)  # deterministic backends: exact agreement