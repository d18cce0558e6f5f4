"""Physical-plan quality gates: these assert the *shape* of execution,
not results — filter/column pushdown into parquet scans, broadcast joins
for small dims, whole-stage codegen on hot paths, no Python UDFs in
native operators, bounded shuffle counts. A plan regression here is a
100TB incident even when sf0.01 results stay correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as m

    return m


def test_q1_pushdown_and_pruning(spark, entrymod):
    df = entrymod.queries()["q1_pricing_summary"](spark, SF)
    df.collect()  # AQE: codegen segments appear in the FINAL plan only
    plan = _plan(df)
    # shipdate filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 6 needed columns are read
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln][0]
    for col in ("l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"):
        assert f"{col}#" in scan
    assert "l_partkey" not in scan and "l_tax" not in scan
    # whole-stage codegen spans (the *(n) markers) cover scan->partial agg
    assert "*(1) HashAggregate" in plan and "partial_sum" in plan


def test_q5_broadcasts_small_dims(spark, entrymod):
    plan = _plan(entrymod.queries()["q5_region_revenue"](spark, SF))
    # nation + region go broadcast; the fact joins stay shuffled
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastExchange" in plan


def test_semi_anti_join_strategies(spark, entrymod):
    semi = _plan(entrymod.queries()["q_semi_customers"](spark, SF))
    anti = _plan(entrymod.queries()["q_anti_customers"](spark, SF))
    assert "LeftSemi" in semi and "LeftAnti" in anti


def test_native_queries_have_no_python_eval(spark, entrymod):
    """Everything except the scorer pipeline must stay JVM-side —
    row-at-a-time Python (BatchEvalPython) is banned everywhere. The
    exact-cosine kernel is the one deliberate Arrow-batched python
    stage (round 7: `similarity.cosine_vec` runs one numpy pass per
    Arrow batch instead of interpreted HOF lambdas per pair —
    bit-identical values, ~2x the operator), so sim_cosine_topk allows
    ArrowEvalPython and nothing else."""
    qs = entrymod.queries()
    for name in ("q1_pricing_summary", "er_serialize", "er_minhash",
                 "dedup_simhash", "dedup_ngram_jaccard", "sim_cosine_topk",
                 "text_stats", "er_blocking_key_pairs", "er_dk",
                 "er_threshold_sweep"):
        plan = _plan(qs[name](spark, SF))
        assert "BatchEvalPython" not in plan, name
        if name != "sim_cosine_topk":
            assert "ArrowEvalPython" not in plan, name
        assert "PythonMapInArrow" not in plan, name
        assert "MapInPandas" not in plan, name


def test_cosine_vec_matches_expression_cosine(spark):
    """The vectorized cosine kernel must be BIT-identical to the HOF
    expression it replaced (same IEEE ops, same left-fold addition
    order) — rounded to 6 in the JVM on both paths."""
    from ditto_spark.operators.similarity import cosine, cosine_vec

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = e.select(F.col("vec_id").alias("l"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("r"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("l") < F.col("r")).limit(500)
    both = pairs.select(
        "l", "r",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("expr"),
        F.round(cosine_vec(F.col("va"), F.col("vb")), 6).alias("vec"),
    )
    assert both.filter("expr IS DISTINCT FROM vec").count() == 0


def test_minhash_buckets_single_exchange(spark):
    """Signature computation = one shuffle (window + groupBy share the
    hashpartitioning(id))."""
    from ditto_spark.operators.blocking import minhash_band_buckets

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("text"))
    plan = _plan(minhash_band_buckets(d))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_scorer_is_arrow_batched(spark):
    """The one intentional Python stage runs via Arrow (mapInPandas),
    never row-at-a-time BatchEvalPython."""
    from ditto_spark.operators.scoring import score_pairs

    cands = spark.createDataFrame(
        [("a", "b", "x", "y", "k")],
        "left_id string, right_id string, left_text string, "
        "right_text string, block_key string")
    plan = _plan(score_pairs(cands))
    assert "MapInPandas" in plan or "PythonMapInArrow" in plan
    assert "BatchEvalPython" not in plan


def test_media_scan_prunes_binary_payload(spark, tmp_path):
    from ditto_spark.operators.multimodal import frame_sample_plan, synth_media

    path = str(tmp_path / "m")
    synth_media(spark, 6).write.parquet(path)
    plan = _plan(frame_sample_plan(spark.read.parquet(path)))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "content" not in read
    assert "PushedFilters: [IsNotNull(media_type), EqualTo(media_type,video)" in plan


def test_key_blocking_prunes_via_aqe(spark):
    """Key blocking's self-join is an equi-join on the key (no cartesian
    anywhere in the plan)."""
    from ditto_spark.operators.blocking import key_blocking

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text",
        F.col("lang"))
    plan = _plan(key_blocking(d, F.col("lang")))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan

def test_repeated_spans_plan_bounded_shuffles(spark):
    """Exact-substring dedup: one window shuffle per grams leg + one
    hash-agg exchange on the 60-bit gram hash; the df-filtered repeat
    set joins back via broadcast at this scale (equi-join on gram_hash
    at scale — never a cross join), and the whole plan is JVM-side."""
    from ditto_spark.operators.dedup import repeated_ngram_spans

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    plan = _plan(repeated_ngram_spans(d, "doc_id", "text", n=4))
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
