"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from SURVEY.md §2
as a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL. Numeric conventions shared by both sides so the
value-hash compare is exact:

  * money/quantity aggregates run in DECIMAL(18,2)/(38,4) (order-
    independent exact arithmetic), presented as DOUBLE;
  * floating similarity scores are computed with identical operation
    order on both engines (sequential double accumulation) and rounded
    to 6 decimals;
  * hashes use the portable md5-prefix bigint (ditto_spark.operators.
    hashing) which both engines reproduce bit-exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ditto_spark.functions.text import (
    BPE_RE,
    FP_MOD,
    LANG_PROFILES,
    fingerprint,
    lang_id,
    quality_score,
    token_count_bpe,
    token_count_ws,
)
from ditto_spark.operators.blocking import key_blocking, sorted_neighborhood
from ditto_spark.operators.dedup import (
    exact_duplicates,
    ngram_jaccard_pairs,
    simhash_df,
)
from ditto_spark.operators.hashing import porthash_seed, porthash_seed_sql, porthash_sql
from ditto_spark.operators.clustering import connected_components
from ditto_spark.operators.serialize import serialize_spans
from ditto_spark.operators.similarity import cosine_topk, cosine_vec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dec(col, p=18, s=2):
    return col.cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# spans derivation: the interleaved-spans doc table, built deterministically
# from the flat documents table (same construction in SQL for the oracle)
# ---------------------------------------------------------------------------

def _spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    spans = F.array(
        F.struct(F.lit("title").alias("kind"), F.col("source").alias("text"),
                 F.lit(None).cast("string").alias("media_ref"),
                 F.lit(0).alias("offset")),
        F.struct(F.lit("body").alias("kind"), F.col("text").alias("text"),
                 F.lit(None).cast("string").alias("media_ref"),
                 F.lit(1).alias("offset")),
    )
    media = F.struct(
        F.lit("media").alias("kind"), F.lit("").alias("text"),
        F.concat(F.lit("img://corpus/"), F.col("doc_id").cast("string"),
                 F.lit(".jpg")).alias("media_ref"),
        F.lit(2).alias("offset"),
    )
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(spans, F.array(media))).otherwise(spans).alias("spans"),
    )


# ---------------------------------------------------------------------------
# entry: flagship query — the full ER pipeline on sf0.001
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline

    docs = _spans_docs(spark, "/root/testdata/sf0.001").select(
        F.col("doc_id").cast("string").alias("doc_id"), "spans")
    out = run_pipeline(spark, docs, PipelineConfig(sn_window=2))
    return out["entities"]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # Exact integer-cents aggregation (round 7, guide §2.3 narrower
    # types): the money columns are exact 2-decimal values, so
    # round(x*100) recovers the integer cents bit-exactly and long sums
    # replace the per-row double->decimal casts + Decimal128 sums that
    # dominated this query's single scan task (measured 0.86s -> 0.32s
    # for the aggregate at sf0.1; value-identical to the DECIMAL oracle
    # because both arithmetics are exact and the final double division /
    # decimal->double cast are both correctly rounded). Bounds: the
    # product sum is < 1.05e9 per row, so int64 is safe past 10^9 rows
    # per group (ANSI mode raises loudly long before silent wrap).
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= "1999-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qc) / F.lit(100.0), 2).alias("sum_qty"),
            F.round(F.sum(pc) / F.lit(100.0), 2).alias("sum_base_price"),
            F.round(F.sum(pc * (100 - dc)) / F.lit(10000.0), 2)
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _rev_cents() -> F.Column:
    """sum(l_extendedprice * (1 - l_discount)) rounded to 2 decimals,
    in exact integer cents (see _q1_pricing_summary for the equivalence
    argument vs the DECIMAL(38,6) oracle)."""
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    return F.round(F.sum(pc * (100 - dc)) / F.lit(10000.0), 2)


def _q3_top_unshipped(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_rev_cents().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q5_region_revenue(spark, sf_dir):
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_rev_cents().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def _q_window_top_suppliers(spark, sf_dir):
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        s.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "s_name",
                F.col("s_acctbal").cast("double").alias("acctbal"),
                F.col("rk").alias("rnk"))
        .orderBy("n_name", "rnk")
    )


def _q_rollup_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum(_dec(F.col("o_totalprice"))).cast("double"), 2)
             .alias("total_price"))
    )


def _q_semi_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


def _q_anti_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def _q_distinct_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"),
             F.count("*").alias("n_orders"))
    )


def _q_events_daily(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(_dec(F.col("value"))).cast("double"), 2)
             .alias("sum_value"))
    )


def _q_events_sessions(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # convert each timestamp once and lag the epoch value (the previous
    # form converted every row twice: once direct, once under the lag)
    e = e.withColumn("_ets", F.unix_timestamp("ts"))
    gap = F.col("_ets") - F.lag("_ets").over(w)
    newsess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        e.withColumn("is_new", newsess)
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"),
             F.count("*").alias("n_events"))
    )


def _q_events_json(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.max("k").alias("max_k"),
             F.count("*").alias("n"))
    )


def _er_serialize(spark, sf_dir):
    docs = _spans_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        serialize_spans(F.col("spans"), drop_empty=True).alias("serialized"),
    )


def _er_blocking_key_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    key = F.concat_ws("_", F.col("lang"), F.col("source"))
    pairs = key_blocking(d, key, id_col="doc_id", text_col="text",
                         max_block_rows=50)
    return pairs.select("left_id", "right_id", "block_key")


def _er_sorted_neighborhood(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id",
                                              F.col("text").alias("text"))
    pairs = sorted_neighborhood(d, F.lower(F.col("text")), window=2)
    return pairs.select("left_id", "right_id")


def _er_minhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                 lambda t: t != F.lit("")))
    out = d.select("doc_id", toks.alias("toks"))

    def seeded(seed: int):
        return lambda t: porthash_seed(t, seed)

    for i in range(4):
        out = out.withColumn(
            f"h{i}", F.array_min(F.transform(F.col("toks"), seeded(i))))
    return out.select("doc_id", "h0", "h1", "h2", "h3")


def _dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return exact_duplicates(d.unionByName(planted), "doc_id", "text").select(
        "text_hash", "n_dups", "representative")


def _dedup_ngram_jaccard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.1,
                               max_shingle_df=None)


def _dedup_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return simhash_df(d, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "simhash")


def _sim_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk(e, e.filter(F.col("vec_id") < 10), k=5)


def _sim_near_dups(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("left_id"),
                 F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("right_id"),
                 F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("left_id") < F.col("right_id"))
        .withColumn("cosine", F.round(cosine_vec(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= 0.45)
        .select("left_id", "right_id", "cosine")
    )


def _text_stats(spark, sf_dir):
    from ditto_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    # tokenize ONCE in a prior projection and share the array across
    # all statistics (round 7: the per-function raw expressions were
    # re-splitting the text per output column — 1.5x this projection)
    base = d.select("doc_id", "text",
                    ws_tokens(F.col("text")).alias("_toks"))
    tk = F.col("_toks")
    return base.select(
        "doc_id",
        token_count_ws(F.col("text"), tk).alias("n_ws"),
        token_count_bpe(F.col("text")).alias("n_bpe"),
        lang_id(F.col("text"), tk).alias("lang_guess"),
        quality_score(F.col("text"), tk).alias("quality"),
        fingerprint(F.col("text"), tk).alias("fp"),
    )


def _mm_frame_plan(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    dur = F.col("n_chars") * 10
    # greatest(...,0) guards n_chars=0 (sequence(0,-1,500) throws)
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)),
                             F.lit(500))).alias("frame_ts_ms"),
    )


def _cluster_cc(spark, sf_dir):
    # capped shingle DF (the scale-safe default — VERDICT r1 #5): the
    # uncapped exactness variant stays in dedup_ngram_jaccard
    d = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.1,
                                max_shingle_df=50).select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    return connected_components(edges).orderBy("doc_id")


def _er_pipeline_matches(spark, sf_dir):
    """Full ER pipeline matches (blocking union + iterator-UDF scoring).
    No SQL oracle (the default xxhash64 MinHash hash has no DuckDB
    equivalent), but content is HARD-GATED: the result must match a
    committed golden value-hash at the correctness scales or this
    raises (ditto_spark.golden) — and the SAME multi-pass DAG is
    hash-exact vs DuckDB in er_pipeline_full (portable md5 hash family)
    with its clustering tail in er_pipeline_entities."""
    from ditto_spark.golden import content_gate
    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline

    docs = _spans_docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "spans")
    out = run_pipeline(spark, docs, PipelineConfig(sn_window=2))
    res = out["scored"].select("left_id", "right_id", "match",
                               F.round("match_confidence", 6)
                               .alias("match_confidence"))
    return content_gate(res, "er_pipeline_matches", sf_dir)


def _er_dk(spark, sf_dir):
    """DK injection (P8) over a derived token stream containing int /
    float / ID tokens (the raw corpus has none)."""
    from ditto_spark.operators.knowledge import dk_inject

    d = _t(spark, sf_dir, "documents")
    enriched = F.concat_ws(
        " ", F.col("text"), F.col("n_chars").cast("string"),
        F.format_string("%.3f", F.col("n_chars") / 7.0),
        F.concat(F.lit("SKU"), F.col("doc_id").cast("string"), F.lit("X"),
                 (F.col("n_chars") * 3).cast("string")),
    )
    return d.select("doc_id", dk_inject(enriched).alias("dk_text"))


def _er_summarize(spark, sf_dir):
    """TF-IDF summarizer (P7 + A1): corpus idf -> greedy top-idf budget of
    8 tokens per doc, order preserved."""
    from ditto_spark.operators.summarize import build_idf, summarize_column

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    idf, dflt = build_idf(spark, d)
    out = summarize_column(d, idf, dflt, ["text"], max_len=8)
    return out.select("doc_id", F.col("text").alias("summary"))


def _er_serialize_flat(spark, sf_dir):
    from ditto_spark.operators.serialize import serialize_flat

    c = _t(spark, sf_dir, "customer")
    return serialize_flat(
        c, ["c_name", "c_mktsegment", "c_nationkey"]
    ).select("c_custkey", "text")


def _er_table_roundtrip(spark, sf_dir):
    """S1 catalog parity (VERDICT r5 #1): documents parquet ->
    ``saveAsTable`` into the session catalog (the in-sandbox stand-in
    for a Hive/Iceberg metastore) -> ``read_table`` -> ``flat_to_docs``
    (one span per attribute) -> full span serialization. The oracle
    rebuilds the COL/VAL string straight from the raw parquet, so the
    catalog hop and the flat->spans bridge must both be
    content-transparent (hive_ditto_standalone.py:289-311)."""
    from ditto_spark.operators.serialize import flat_to_docs, serialize_docs
    from ditto_spark.sources.io import read_table

    from ditto_spark.sources.io import drop_table

    d = _t(spark, sf_dir, "documents")
    drop_table(spark, "er_cat_documents")
    d.write.saveAsTable("er_cat_documents")
    t = read_table(spark, "er_cat_documents")
    docs = flat_to_docs(t, id_col="doc_id",
                        attr_cols=["text", "lang", "source", "n_chars"])
    return serialize_docs(docs, drop_empty=True).select("doc_id", "text")


def _er_table_prod_scores(spark, sf_dir):
    """S1 production-layout catalog e2e (VERDICT r5 #1): a pre-paired
    *_left/*_right metastore table -> ``run_table_pipeline`` auto-
    detects 'production' -> ``split_production`` -> whole-stage-codegen
    surrogate scoring (hive_ditto_standalone.py:68-115 detect +
    :117-164 convert). Pairs = adjacent documents; ``use_dk=False`` so
    the oracle shares the pipeline entries' scoring-math CTEs."""
    from ditto_spark.plans.pipeline import PipelineConfig, run_table_pipeline

    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("pid"), F.col("text").alias("text_left"))
    b = d.select((F.col("doc_id") - 1).alias("pid"),
                 F.col("text").alias("text_right"))
    paired = a.join(b, "pid").select("pid", "text_left", "text_right")
    from ditto_spark.sources.io import drop_table

    drop_table(spark, "er_cat_paired")
    paired.write.saveAsTable("er_cat_paired")
    out = run_table_pipeline(spark, "er_cat_paired", id_col="pid",
                             cfg=PipelineConfig(use_dk=False))
    return out["scored"].select(
        "left_id", "right_id", "match", F.round("p1", 6).alias("p1r"))


def _er_labelgen_counts(spark, sf_dir):
    from ditto_spark.operators.labelgen import class_counts, labeled_pairs

    d = _t(spark, sf_dir, "documents")
    key = F.concat_ws("_", F.col("lang"), F.col("source"))
    lp = labeled_pairs(d.select(F.col("doc_id").cast("string").alias("doc_id"),
                                "text", key.alias("k")),
                       F.col("k"), overlap_threshold=0.3)
    return class_counts(lp)


def _er_threshold_sweep(spark, sf_dir):
    """A5/M4: F1-vs-threshold grid over jaccard-scored pairs with
    jaccard>=0.2 as the pseudo-label."""
    d = _t(spark, sf_dir, "documents")
    scored = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.1,
                                 max_shingle_df=None).select(
        F.col("jaccard").alias("p"),
        (F.col("jaccard") >= 0.2).cast("int").alias("y"))
    grid = F.transform(F.sequence(F.lit(0), F.lit(19)),
                       lambda i: i.cast("double") * 0.05)
    ex = scored.select("p", "y", F.explode(grid).alias("th")).withColumn(
        "pred", (F.col("p") > F.col("th")).cast("int"))
    return (
        ex.groupBy("th")
        .agg(
            F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 1), 1)
                  .otherwise(0)).alias("tp"),
            F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 1), 1)
                  .otherwise(0)).alias("fp"),
            F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 0), 1)
                  .otherwise(0)).alias("fn"),
        )
        .select(
            "th",
            F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                   F.round(2 * F.col("tp")
                           / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
                           6)).otherwise(F.lit(0.0)).alias("f1"),
        )
    )


def _q_cube_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.cube("event_type", F.date_trunc("month", F.col("ts")).alias("mon"))
        .agg(F.count("*").alias("n"),
             F.round(F.sum(_dec(F.col("value"))).cast("double"), 2)
             .alias("sum_value"))
    )


def _er_two_table_topk(spark, sf_dir):
    """J4/M7: hashed-BoW encode two tables (even/odd doc split), top-3
    most-similar left rows per right row (blocker.py:43-80 contract)."""
    from ditto_spark.operators.embed import two_table_topk_blocking

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("id"), "text",
        F.col("doc_id").alias("k"))
    a = d.filter(F.col("k") % 2 == 0).select("id", "text")
    b = d.filter((F.col("k") % 2 == 1) & (F.col("k") < 100)).select(
        "id", "text")
    return two_table_topk_blocking(a, b, k=3, dim=64)


def _er_match_stats(spark, sf_dir):
    """A3: aggregate match statistics over threshold-decided pairs
    (hive_ditto_standalone.py:262-286 as one set-based aggregate)."""
    from ditto_spark.operators.embed import match_stats

    d = _t(spark, sf_dir, "documents")
    scored = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.1,
                                 max_shingle_df=None)
    decided = scored.select(
        (F.col("jaccard") >= 0.2).cast("int").alias("match"),
        F.when(F.col("jaccard") >= 0.2, F.col("jaccard"))
        .otherwise(F.round(1 - F.col("jaccard"), 6))
        .alias("match_confidence"),
    )
    return match_stats(decided)


def _corpus_clean(spark, sf_dir):
    """Composite training-data prep: quality filter + language filter +
    near-dup removal (keep the smallest doc_id of each near-dup group) —
    the one-pass 'clean corpus' materialization a pretraining pipeline
    runs before tokenization."""
    from ditto_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    tk = F.col("_toks")
    scored = d.select(
        "doc_id", "text", ws_tokens(F.col("text")).alias("_toks"),
    ).select(
        "doc_id",
        token_count_ws(F.col("text"), tk).alias("n_tokens"),
        lang_id(F.col("text"), tk).alias("lang_guess"),
        quality_score(F.col("text"), tk).alias("quality"),
    )
    dups = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3,
                               max_shingle_df=50).select(
        F.col("right_id").alias("doc_id"))
    return (
        scored.filter((F.col("quality") >= 0.8)
                      & (F.col("lang_guess") == "en"))
        .join(dups, "doc_id", "left_anti")
        .select("doc_id", "n_tokens", "quality")
    )


def _q_set_ops(spark, sf_dir):
    """Relational INTERSECT / EXCEPT / UNION over customer key sets
    (engine surface beyond the reference's python set ops, SURVEY §2.6)."""
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_nationkey")
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_nationkey")
    both = building.intersect(machinery).withColumn("set_op", F.lit("both"))
    # set EXCEPT (subtract), not EXCEPT ALL: 'building_only' must mean
    # the key appears in NO machinery row, not merely more often
    only_b = building.subtract(machinery).withColumn(
        "set_op", F.lit("building_only"))
    return both.unionByName(only_b).select("set_op", "c_nationkey")


def _q_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM {o}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        o=o,
    )


def _q_string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("uname"),
        F.substring(F.col("p_name"), 1, 5).alias("prefix5"),
        F.length(F.col("p_name")).alias("name_len"),
        F.regexp_replace(F.col("p_name"), r"[aeiou]", "_").alias("devowel"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


def _q_correlated(spark, sf_dir):
    """Correlated scalar subquery (TPC-H q2/q17 shape) through Spark SQL
    — Catalyst decorrelates it into an aggregate + join."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_brand,
               (SELECT MAX(l.l_quantity) FROM {li} l
                WHERE l.l_partkey = p.p_partkey) AS max_qty
        FROM {p} p
        WHERE (SELECT MAX(l.l_quantity) FROM {li} l
               WHERE l.l_partkey = p.p_partkey) >= 48
        """,
        p=p, li=li,
    )


def _q_date_arithmetic(spark, sf_dir):
    """Date/interval surface: extraction, truncation, day arithmetic."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30),
                      "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("age_days"),
    )


def _q_array_funcs(spark, sf_dir):
    """Array-function surface over derived token arrays."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda t: t != F.lit(""))
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.element_at(F.array_sort(F.array_distinct(toks)), 1)
        .alias("first_token"),
        F.element_at(F.array_sort(F.array_distinct(toks)), -1)
        .alias("last_token"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(toks)), 1, 3))
        .alias("top3_sorted"),
    )


def _q_events_lag_delta(spark, sf_dir):
    """lag/lead analytics: per-user inter-event gap statistics."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts")
           - F.unix_timestamp(F.lag("ts").over(w))).cast("long")
    return (
        e.withColumn("gap", gap)
        .filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(F.min("gap").alias("min_gap"), F.max("gap").alias("max_gap"),
             F.sum("gap").alias("sum_gap"), F.count("*").alias("n_gaps"))
    )


# ---------------------------------------------------------------------------
# round-2 additions: NER-typed DK, reference-exact summarizer, SQL-surface
# ER pipeline, verified threshold tuning, capped (scale-safe) jaccard
# ---------------------------------------------------------------------------

_DK_SUFFIX = ("met maria at acme corp in tokyo on january 2021 "
              "at 10:30 buying 5 kg of iphone stock with "
              "Rossi Bianchi of Zorblax Inc in texas")


def _er_dk_general(spark, sf_dir):
    """NER-typed DK injection (GeneralDKInjector analog, knowledge.py:
    110-168): entity labels + number normalization + ID tagging over an
    enriched token stream exercising every label branch."""
    from ditto_spark.operators.knowledge import dk_inject_general

    d = _t(spark, sf_dir, "documents")
    enriched = F.concat_ws(
        " ", F.col("text"), F.col("n_chars").cast("string"),
        F.format_string("%.3f", F.col("n_chars") / 7.0),
        F.concat(F.lit("SKU"), F.col("doc_id").cast("string"), F.lit("X"),
                 (F.col("n_chars") * 3).cast("string")),
        F.lit(_DK_SUFFIX),
    )
    return d.select("doc_id", dk_inject_general(enriched).alias("dk_text"))


def _er_summarize_ref(spark, sf_dir):
    """Reference-exact pair summarizer (summarize.py:54-109 semantics):
    per-pair shared idf counter, sentence-piece budget with marker
    charge, break-on-overflow, emit-once. Pairs = consecutive documents;
    ASCII token pattern so the DuckDB oracle's RE2 \\w matches Java's."""
    from ditto_spark.operators.summarize_ref import (
        build_ref_tfidf, summarize_pairs_ref,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("pair_id"), F.col("text").alias("left_text"))
    b = d.select((F.col("doc_id") - 1).alias("pair_id"),
                 F.col("text").alias("right_text"))
    pairs = a.join(b, "pair_id")
    entries = pairs.select(F.col("left_text").alias("text")).unionAll(
        pairs.select(F.col("right_text").alias("text")))
    vocab = build_ref_tfidf(spark, entries,
                            token_pattern=r"\b\w\w+\b")
    # weight_round=9: a 1-ulp libm log() difference between engines must
    # not flip near-tied candidate ranks (operator default stays exact)
    out = summarize_pairs_ref(pairs, vocab, max_len=12, weight_round=9)
    return out.select("pair_id",
                      F.col("left_text").alias("left_summary"),
                      F.col("right_text").alias("right_summary"))


def _er_pipeline_sql(spark, sf_dir):
    """SQL-surface flagship: serialize -> sorted-neighborhood blocking ->
    NATIVE surrogate scoring -> decisions, end-to-end hash-exact vs the
    DuckDB twin (the full multi-pass pipeline with MinHash-LSH stays in
    er_pipeline_matches as a rows-only entry — xxhash64 has no DuckDB
    equivalent)."""
    from ditto_spark.operators.scoring import score_pairs_native

    ser = _er_serialize(spark, sf_dir).select(
        "doc_id", F.col("serialized").alias("text"))
    pairs = sorted_neighborhood(ser, F.lower(F.col("text")), window=2)
    scored = score_pairs_native(pairs, 0.5)
    return scored.select("left_id", "right_id", "match",
                         F.round("p1", 6).alias("p1r"))


def _er_pipeline_entities(spark, sf_dir):
    """Full-DAG content check reaching the CLUSTERING stage (VERDICT r2
    #3): serialize -> sorted-neighborhood blocking -> native scoring ->
    transitive connected components -> (doc_id, entity_id), hash-exact
    vs a DuckDB oracle whose closure is a recursive CTE. Complements
    er_pipeline_sql (which stops at pair decisions); the MinHash pass
    stays rows-only in er_pipeline_matches (xxhash64 has no DuckDB
    equivalent)."""
    from ditto_spark.operators.clustering import assign_entities
    from ditto_spark.operators.scoring import score_pairs_native

    ser = _er_serialize(spark, sf_dir).select(
        "doc_id", F.col("serialized").alias("text"))
    pairs = sorted_neighborhood(ser, F.lower(F.col("text")), window=2)
    scored = score_pairs_native(pairs, 0.5)
    return assign_entities(ser.select("doc_id"), scored)


def _er_pipeline_full(spark, sf_dir):
    """The COMPLETE multi-pass flagship with a content oracle: MinHash-
    LSH (portable md5 hash family) UNION sorted-neighborhood -> native
    scoring -> decisions, hash-exact vs one DuckDB query that recomputes
    the shingle/signature/band pipeline. Closes the er_pipeline_matches
    rows-only gap: same operators, engine-portable token hash
    (blocking.minhash_band_buckets token_hash='portable')."""
    from ditto_spark.operators.blocking import (attach_texts,
                                                minhash_lsh_blocking,
                                                union_candidates)
    from ditto_spark.operators.scoring import score_pairs_native

    ser = _er_serialize(spark, sf_dir).select(
        "doc_id", F.col("serialized").alias("text"))
    mh = minhash_lsh_blocking(ser, n_hashes=24, bands=6, shingle_n=3,
                              max_bucket_rows=200, with_texts=False,
                              token_hash="portable")
    sn = sorted_neighborhood(ser, F.lower(F.col("text")), window=2,
                             with_texts=False)
    cand = union_candidates(mh, sn)
    scored = score_pairs_native(attach_texts(cand, ser), 0.5)
    return scored.select("left_id", "right_id", "match",
                         F.round("p1", 6).alias("p1r"))


def _er_threshold_verified(spark, sf_dir):
    """M4 + the reference's sanity re-predict (matcher.py:229-251): the
    sweep's winning threshold, cross-checked against the decision path;
    raises on drift."""
    from ditto_spark.operators.scoring import tune_threshold_verified

    d = _t(spark, sf_dir, "documents")
    scored = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.1,
                                 max_shingle_df=None).select(
        F.col("jaccard").alias("p1"),
        (F.col("jaccard") >= 0.2).cast("int").alias("label"))
    th, swept_f1, re_f1 = tune_threshold_verified(scored)
    return spark.createDataFrame(
        [(round(th, 6), round(swept_f1, 6), round(re_f1, 6))],
        "best_th double, swept_f1 double, repredicted_f1 double")


def _er_blocking_quality(spark, sf_dir):
    """Blocker evaluation (pair completeness + reduction ratio) of the
    flagship's two-pass blocking — portable MinHash-LSH UNION
    sorted-neighborhood — against exhaustive capped 3-gram-Jaccard
    near-dups (threshold 0.3) as ground truth. The recall/cost dial the
    reference's blocker k/threshold (blocking/blocker.py:96-99)
    controls but never measures."""
    from ditto_spark.operators.blocking import (blocking_quality,
                                                minhash_lsh_blocking,
                                                sorted_neighborhood,
                                                union_candidates)
    from ditto_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    ser = _er_serialize(spark, sf_dir).select(
        "doc_id", F.col("serialized").alias("text"))
    mh = minhash_lsh_blocking(ser, n_hashes=24, bands=6, shingle_n=3,
                              max_bucket_rows=200, with_texts=False,
                              token_hash="portable")
    sn = sorted_neighborhood(ser, F.lower(F.col("text")), window=2,
                             with_texts=False)
    truth = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3,
                                max_shingle_df=50)
    return blocking_quality(union_candidates(mh, sn), truth, d)


def _er_lsh_tuning_curve(spark, sf_dir):
    """The MinHash banding s-curve measured on the real corpus: pair
    completeness vs reduction ratio for bands in {2, 6, 12} over the
    same 24-permutation portable signature (rows/band 12, 4, 2),
    scored against capped 3-gram-Jaccard truth. The quantitative form
    of the recall dial the reference's blocker exposes as k/threshold
    (blocking/blocker.py:96-99)."""
    from ditto_spark.operators.blocking import lsh_tuning_curve
    from ditto_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    ser = _er_serialize(spark, sf_dir).select(
        "doc_id", F.col("serialized").alias("text"))
    truth = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3,
                                max_shingle_df=50)
    return lsh_tuning_curve(ser, truth, d, band_configs=[2, 6, 12],
                            n_hashes=24, token_hash="portable")


def _dedup_repeated_spans(spark, sf_dir):
    """Exact-substring dedup (Lee et al. 2022): every full 4-token
    window occurring in >= 2 distinct documents, with position — the
    repeated-span inventory a training pipeline trims before near-dup
    passes. One hash-agg global stage; oracle recomputes the rolling
    windows + portable hash in DuckDB."""
    from ditto_spark.operators.dedup import repeated_ngram_spans

    d = _t(spark, sf_dir, "documents")
    return repeated_ngram_spans(d, "doc_id", "text", n=4, min_df=2)


def _dedup_span_coverage(spark, sf_dir):
    """Per-doc fraction of tokens inside cross-document repeated 4-gram
    windows (exact interval-union coverage) — the drop/trim decision
    metric for exact-substring dedup."""
    from ditto_spark.operators.dedup import repeated_span_coverage

    d = _t(spark, sf_dir, "documents")
    return repeated_span_coverage(d, "doc_id", "text", n=4, min_df=2)


def _dedup_contamination(spark, sf_dir):
    """Train/test decontamination (GPT-3 appendix C's n-gram collision
    check as a set operation): even doc_ids = train, odd = test; per
    test doc, its full 4-token windows that occur anywhere in train.
    Train reduces to distinct gram hashes (8 bytes/gram), so the check
    against a 100TB train corpus never carries text past the gram
    stage."""
    from ditto_spark.operators.dedup import cross_corpus_contamination

    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    return cross_corpus_contamination(train, test, "doc_id", "text",
                                      n=4, min_hits=1)


def _dedup_ngram_jaccard_capped(spark, sf_dir):
    """The scale-safe form of n-gram jaccard: shingles with document
    frequency above the cap are dropped BEFORE set sizes are counted
    (dedup.py:79-84) — bounded join fanout, the default at 100TB."""
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3,
                               max_shingle_df=50).orderBy(
        "left_id", "right_id")


def _er_model_scores(spark, sf_dir):
    """M1-M3 with the REAL (numpy) transformer cross-encoder through the
    distributed mapInPandas path: SN candidates scored batched+padded per
    worker. Deterministic (frozen seed-0 weights) but not one SQL query —
    content is HARD-GATED against a committed golden value-hash at the
    correctness scales (ditto_spark.golden; a perturbed weight or
    plumbing drift raises), and fidelity to the unpadded single-node
    forward is separately gated by tests/test_model_gate.py."""
    from ditto_spark.golden import content_gate
    from ditto_spark.operators.npmodel import NumpyDittoBackend, make_weights
    from ditto_spark.operators.scoring import score_pairs

    w = make_weights(seed=0)
    ser = _er_serialize(spark, sf_dir).select(
        "doc_id", F.col("serialized").alias("text"))
    pairs = sorted_neighborhood(ser, F.lower(F.col("text")), window=1)
    scored = score_pairs(pairs, 0.10,
                         lambda: NumpyDittoBackend(w, micro_batch=64))
    res = scored.select("left_id", "right_id", "match",
                        F.round("p1", 6).alias("p1r"))
    return content_gate(res, "er_model_scores", sf_dir)


def _sim_ann_lsh(spark, sf_dir):
    """RP-LSH ANN top-k (J4/similarity scale path) through the
    VECTORIZED sign-matrix bucketing (dim=64): probes join only their
    own bucket, exact cosine re-rank inside. The oracle recomputes the
    deterministic ±1 projections from the portable md5 hash — the
    bucketing needs no stored matrix on either engine."""
    from ditto_spark.operators.similarity import ann_topk_lsh

    e = _t(spark, sf_dir, "embeddings")
    return ann_topk_lsh(e, e.filter(F.col("vec_id") < 20), k=5,
                        n_bits=8, dim=64)


def _rp_proj_sql(b: int) -> str:
    # exact int64 quantized projection — mirrors similarity.RP_QUANT
    # (floor(v * 2^20) per element, integer sum): bit-identical to the
    # engine regardless of summation order (ADVICE r4 knife-edge fix)
    sign = (f"CASE WHEN (('0x' || substr(md5('rp{b}_' || "
            f"CAST(i AS VARCHAR)), 1, 15))::BIGINT) % 2 = 0 "
            f"THEN 1 ELSE -1 END")
    return (f"list_sum(list_transform(range(len(embedding)), "
            f"i -> floor(embedding[i+1]::DOUBLE * 1048576.0)::BIGINT"
            f" * ({sign})))")


def _ann_lsh_oracle_sql(n_bits: int = 8, k: int = 5) -> str:
    bucket = " + ".join(
        f"(CASE WHEN ({_rp_proj_sql(b)}) > 0 THEN {2 ** b} ELSE 0 END)"
        for b in range(n_bits))
    return f"""
        WITH bkt AS (
          SELECT vec_id, embedding, ({bucket}) AS bucket
          FROM embeddings),
        scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 {_COS} AS cosine
          FROM bkt a JOIN bkt b
            ON a.bucket = b.bucket AND a.vec_id != b.vec_id
          WHERE a.vec_id < 20),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {k}
    """


def _sim_ann_lsh_multiprobe(spark, sf_dir):
    """Hamming-1 multi-probe variant of sim_ann_lsh: each query also
    probes every 1-bit-flip bucket (recall lever; candidate volume
    bounded at 1 + n_bits probe buckets, base index untouched). The
    oracle reproduces the probing with a cross-join against the 9
    xor masks."""
    from ditto_spark.operators.similarity import ann_topk_lsh

    e = _t(spark, sf_dir, "embeddings")
    return ann_topk_lsh(e, e.filter(F.col("vec_id") < 20), k=5,
                        n_bits=8, dim=64, multiprobe=True)


def _ann_lsh_multiprobe_oracle_sql(n_bits: int = 8, k: int = 5) -> str:
    bucket = " + ".join(
        f"(CASE WHEN ({_rp_proj_sql(b)}) > 0 THEN {2 ** b} ELSE 0 END)"
        for b in range(n_bits))
    masks = ", ".join(["(0)"] + [f"({1 << b})" for b in range(n_bits)])
    return f"""
        WITH bkt AS (
          SELECT vec_id, embedding, ({bucket}) AS bucket
          FROM embeddings),
        probes AS (
          SELECT vec_id, embedding, xor(bucket, m.mask) AS bucket
          FROM bkt, (VALUES {masks}) AS m(mask)
          WHERE vec_id < 20),
        scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 {_COS} AS cosine
          FROM probes a JOIN bkt b
            ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {k}
    """


def _sim_near_dups_lsh(spark, sf_dir):
    """Embedding near-dup SCALE path: RP-LSH bucket join (multiprobe
    Hamming-1) + exact cosine filter — one equi-join on bucket id where
    sim_near_dups (the audit baseline) crosses all pairs. The oracle
    reproduces bucketing + probing + dedupe portably from the md5 sign
    recipe."""
    from ditto_spark.operators.similarity import embedding_near_dups_lsh

    e = _t(spark, sf_dir, "embeddings")
    return embedding_near_dups_lsh(e, threshold=0.45, n_bits=8, dim=64,
                                   multiprobe=True)


def _near_dups_lsh_oracle_sql(n_bits: int = 8,
                              threshold: float = 0.45) -> str:
    bucket = " + ".join(
        f"(CASE WHEN ({_rp_proj_sql(b)}) > 0 THEN {2 ** b} ELSE 0 END)"
        for b in range(n_bits))
    masks = ", ".join(["(0)"] + [f"({1 << b})" for b in range(n_bits)])
    return f"""
        WITH bkt AS (
          SELECT vec_id, embedding, ({bucket}) AS bucket
          FROM embeddings),
        probes AS (
          SELECT vec_id, embedding, xor(bucket, m.mask) AS bucket
          FROM bkt, (VALUES {masks}) AS m(mask)),
        pairs AS (
          SELECT DISTINCT a.vec_id AS left_id, b.vec_id AS right_id
          FROM probes a JOIN bkt b ON a.bucket = b.bucket
          WHERE a.vec_id < b.vec_id),
        scored AS (
          SELECT p.left_id, p.right_id, {_COS} AS cosine
          FROM pairs p
          JOIN embeddings a ON a.vec_id = p.left_id
          JOIN embeddings b ON b.vec_id = p.right_id)
        SELECT left_id, right_id, cosine
        FROM scored WHERE cosine >= {threshold}
    """


def _er_incremental_entities(spark, sf_dir):
    """§2.8 streaming, entity tail (engine addition; the reference is
    batch-only): stream 200 docs in 3 micro-batches through
    incremental_entities (band-index candidate join + localized-CC label
    merge per batch), then HARD-ASSERT the resolved labels equal the
    batch pipeline's labels over the same corpus and candidate
    generation — a self-contained Python oracle, so the driver's
    rows-only record is backed by an in-entry content check (raises on
    any divergence). No SQL oracle: Structured Streaming + xxhash64
    MinHash are not one DuckDB query."""
    import shutil
    import tempfile

    from ditto_spark.operators.blocking import (attach_texts,
                                                minhash_lsh_blocking)
    from ditto_spark.operators.clustering import assign_entities
    from ditto_spark.operators.scoring import score_pairs
    from ditto_spark.streaming.incremental_er import (incremental_entities,
                                                      read_entity_labels)

    docs = _spans_docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        F.col("doc_id").cast("string").alias("doc_id"), "spans")
    tmp = tempfile.mkdtemp(prefix="er_inc_")
    try:
        rows = docs.collect()
        third = (len(rows) + 2) // 3
        for i in range(3):
            chunk = rows[i * third:(i + 1) * third]
            (spark.createDataFrame(chunk, docs.schema).coalesce(1)
             .write.mode("append").parquet(f"{tmp}/in"))
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in"))
        incremental_entities(spark, stream, f"{tmp}/work", f"{tmp}/ck")
        got = {r["doc_id"]: r["entity_id"] for r in read_entity_labels(
            spark, f"{tmp}/work/labels").collect()}
        # batch oracle: same band-bucket candidates, same scorer, global CC
        ser = docs.select(
            "doc_id", serialize_spans(F.col("spans"),
                                      drop_empty=True).alias("text"))
        pairs = minhash_lsh_blocking(ser, n_hashes=24, bands=6, shingle_n=3,
                                     max_bucket_rows=None, with_texts=False)
        scored = score_pairs(attach_texts(pairs, ser), 0.5)
        want = {r["doc_id"]: r["entity_id"] for r in assign_entities(
            ser.select("doc_id"), scored).collect()}
        if got != want:
            diff = {k for k in set(got) | set(want)
                    if got.get(k) != want.get(k)}
            raise AssertionError(
                f"incremental labels diverge from batch pipeline on "
                f"{len(diff)} docs, e.g. {sorted(diff)[:5]}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(sorted(got.items()),
                                 "doc_id string, entity_id string")


def _er_incremental_matches(spark, sf_dir):
    """§2.8 streaming, match tail: stream 250 docs in 3 micro-batches
    through incremental_matches against a 250-doc corpus index, then
    HARD-ASSERT the full canonical match set equals a batch recompute —
    every pair sharing a band key with >=1 stream side, scored by the
    same backend (round 6: the accumulated stream-side index makes
    cross-batch new-new pairs reachable; this oracle fails if they are
    not). Rows-only for the driver; the in-entry Python oracle raises
    on any divergence. No SQL oracle: Structured Streaming + xxhash64
    MinHash are not one DuckDB query."""
    import shutil
    import tempfile

    from ditto_spark.operators.blocking import (attach_texts,
                                                minhash_band_buckets)
    from ditto_spark.operators.scoring import score_pairs
    from ditto_spark.streaming.incremental_er import (build_corpus_index,
                                                      incremental_matches)

    all_docs = _spans_docs(spark, sf_dir)
    corpus = all_docs.filter(F.col("doc_id") >= 250).select(
        F.col("doc_id").cast("string").alias("doc_id"), "spans")
    streamed = all_docs.filter(F.col("doc_id") < 250).select(
        F.col("doc_id").cast("string").alias("doc_id"), "spans")
    tmp = tempfile.mkdtemp(prefix="er_incm_")
    try:
        build_corpus_index(corpus, f"{tmp}/index")
        rows = streamed.collect()
        third = (len(rows) + 2) // 3
        for i in range(3):
            chunk = rows[i * third:(i + 1) * third]
            (spark.createDataFrame(chunk, streamed.schema).coalesce(1)
             .write.mode("append").parquet(f"{tmp}/in"))
        stream = (spark.readStream.schema(streamed.schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in"))
        incremental_matches(spark, stream, f"{tmp}/index", f"{tmp}/out",
                            f"{tmp}/ck")
        got = {(min(r["left_id"], r["right_id"]),
                max(r["left_id"], r["right_id"])): r["match"]
               for r in spark.read.parquet(f"{tmp}/out").collect()}
        # batch oracle: candidates = canonical pairs sharing >=1 band
        # key with at least one STREAM side; same scorer + threshold
        ser_s = streamed.select(
            "doc_id", serialize_spans(F.col("spans"),
                                      drop_empty=True).alias("text"))
        ser_c = corpus.select(
            "doc_id", serialize_spans(F.col("spans"),
                                      drop_empty=True).alias("text"))
        keys_s = minhash_band_buckets(ser_s, "doc_id", "text", 24, 6, 3)
        keys_c = minhash_band_buckets(ser_c, "doc_id", "text", 24, 6, 3)
        all_keys = keys_s.unionByName(keys_c)
        cands = (keys_s.select(F.col("id").alias("pid"), "block_key")
                 .join(all_keys, "block_key")
                 .filter(F.col("pid") != F.col("id"))
                 .select(F.least("pid", "id").alias("left_id"),
                         F.greatest("pid", "id").alias("right_id"))
                 .dropDuplicates(["left_id", "right_id"]))
        scored = score_pairs(
            attach_texts(cands, ser_s.unionByName(ser_c)), 0.5)
        want = {(r["left_id"], r["right_id"]): r["match"]
                for r in scored.collect()}
        if got != want:
            diff = {k for k in set(got) | set(want)
                    if got.get(k) != want.get(k)}
            raise AssertionError(
                f"streamed matches diverge from the batch recompute on "
                f"{len(diff)} pairs, e.g. {sorted(diff)[:5]}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        sorted((lid, rid, m) for (lid, rid), m in got.items()),
        "left_id string, right_id string, match int")


def _sim_incremental_ann(spark, sf_dir):
    """§2.8 streaming, embedding tail (engine addition): stream the
    embeddings table in 3 micro-batches through incremental_ann_topk
    (bucket-hash-partitioned growing RP-LSH index, probe-pruned reads),
    then HARD-ASSERT each batch's streamed top-k equals ann_topk_lsh
    run with base = all vectors arrived so far — an in-entry Python
    oracle, so the driver's rows-only record is content-backed (raises
    on any divergence). No SQL oracle: Structured Streaming is not one
    DuckDB query (the underlying bucketing IS oracle-checked by
    sim_ann_lsh / sim_ann_lsh_multiprobe)."""
    import shutil
    import tempfile

    from ditto_spark.operators.similarity import ann_topk_lsh
    from ditto_spark.streaming.incremental_ann import incremental_ann_topk

    emb = (_t(spark, sf_dir, "embeddings")
           .select(F.col("vec_id").cast("long").alias("vec_id"),
                   "embedding")
           .filter(F.col("vec_id") < 120).orderBy("vec_id"))
    tmp = tempfile.mkdtemp(prefix="sim_inc_ann_")
    try:
        rows = emb.collect()
        third = (len(rows) + 2) // 3
        chunks = [rows[i * third:(i + 1) * third] for i in range(3)]
        for chunk in chunks:
            (spark.createDataFrame(chunk, emb.schema).coalesce(1)
             .write.mode("append").parquet(f"{tmp}/in"))
        stream = (spark.readStream.schema(emb.schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in"))
        incremental_ann_topk(spark, stream, f"{tmp}/work", f"{tmp}/ck",
                             k=5, n_bits=4, multiprobe=True)
        streamed = spark.read.parquet(f"{tmp}/work/topk")
        # per-batch oracle: replay through the batch operator with the
        # corpus accumulated in batch order
        seen = None
        for bid in sorted(r[0] for r in
                          streamed.select("batch").distinct().collect()):
            got = sorted(map(tuple, streamed.filter(
                F.col("batch") == bid).drop("batch").collect()))
            qids = {g[0] for g in got}
            batch_rows = [c for c in chunks
                          if {str(v) for v, _ in c} & qids]
            assert len(batch_rows) == 1, "batch boundary mismatch"
            this = spark.createDataFrame(batch_rows[0], emb.schema).select(
                F.col("vec_id").cast("string").alias("vec_id"),
                "embedding")
            seen = this if seen is None else seen.unionByName(this)
            want = sorted(map(tuple, ann_topk_lsh(
                seen, this, k=5, n_bits=4, multiprobe=True).collect()))
            if got != want:
                raise AssertionError(
                    f"streamed top-k diverges from the batch operator "
                    f"in batch {bid}: {len(got)} vs {len(want)} rows")
        out = sorted(map(tuple, streamed.drop("batch").collect()))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        out, "query_id string, neighbor_id string, cosine double, "
             "rank int")


def _er_stage_metrics(spark, sf_dir):
    """North-rule lineage+metrics surface (VERDICT r4 #8): run the
    store-backed pipeline — every stage checkpointed to parquet with a
    per-file _lineage table and a per-stage _metrics row — then return
    the store's recorded (stage, rows). The DuckDB oracle recomputes
    each stage's row count independently (serialize → portable-hash
    MinHash ∪ SN-window-2 candidate union → 1:1 scoring → one label per
    doc), so the metrics the store records are value-checked, not just
    present. Set-based replacement for the reference's print-based
    stage stats (hive_ditto_standalone.py:262-286) and log.txt timing
    (matcher.py:187-189)."""
    import shutil
    import tempfile

    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
    from ditto_spark.sources.checkpoint import CheckpointStore

    docs = _spans_docs(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="ditto_stage_metrics_")
    try:
        cfg = PipelineConfig(use_dk=False, sn_window=2,
                             token_hash="portable",
                             sn_key_expr=F.lower(F.col("text")))
        store = CheckpointStore(spark, base)
        run_pipeline(spark, docs, cfg, store=store, input_id=sf_dir)
        rows = [(r["stage"], r["rows"]) for r in
                store.metrics().select("stage", "rows")
                .orderBy("stage").collect()]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "stage string, rows long")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_top_unshipped": _q3_top_unshipped,
        "q5_region_revenue": _q5_region_revenue,
        "q_window_top_suppliers": _q_window_top_suppliers,
        "q_rollup_orders": _q_rollup_orders,
        "q_semi_customers": _q_semi_customers,
        "q_anti_customers": _q_anti_customers,
        "q_distinct_priority": _q_distinct_priority,
        "q_events_daily": _q_events_daily,
        "q_events_sessions": _q_events_sessions,
        "q_events_json": _q_events_json,
        "er_serialize": _er_serialize,
        "er_blocking_key_pairs": _er_blocking_key_pairs,
        "er_sorted_neighborhood": _er_sorted_neighborhood,
        "er_minhash": _er_minhash,
        "dedup_exact": _dedup_exact,
        "dedup_ngram_jaccard": _dedup_ngram_jaccard,
        "dedup_simhash": _dedup_simhash,
        "sim_cosine_topk": _sim_cosine_topk,
        "sim_near_dups": _sim_near_dups,
        "text_stats": _text_stats,
        "mm_frame_plan": _mm_frame_plan,
        "cluster_cc": _cluster_cc,
        "er_pipeline_matches": _er_pipeline_matches,
        "er_dk": _er_dk,
        "er_summarize": _er_summarize,
        "er_serialize_flat": _er_serialize_flat,
        "er_labelgen_counts": _er_labelgen_counts,
        "er_threshold_sweep": _er_threshold_sweep,
        "q_cube_events": _q_cube_events,
        "er_two_table_topk": _er_two_table_topk,
        "er_match_stats": _er_match_stats,
        "corpus_clean": _corpus_clean,
        "q_set_ops": _q_set_ops,
        "q_correlated": _q_correlated,
        "q_date_arithmetic": _q_date_arithmetic,
        "q_array_funcs": _q_array_funcs,
        "q_events_lag_delta": _q_events_lag_delta,
        "q_grouping_sets": _q_grouping_sets,
        "q_string_funcs": _q_string_funcs,
        "er_dk_general": _er_dk_general,
        "er_summarize_ref": _er_summarize_ref,
        "er_pipeline_sql": _er_pipeline_sql,
        "er_pipeline_entities": _er_pipeline_entities,
        "er_pipeline_full": _er_pipeline_full,
        "er_threshold_verified": _er_threshold_verified,
        "dedup_ngram_jaccard_capped": _dedup_ngram_jaccard_capped,
        "er_blocking_quality": _er_blocking_quality,
        "er_lsh_tuning_curve": _er_lsh_tuning_curve,
        "dedup_contamination": _dedup_contamination,
        "dedup_repeated_spans": _dedup_repeated_spans,
        "dedup_span_coverage": _dedup_span_coverage,
        "er_model_scores": _er_model_scores,
        "er_incremental_entities": _er_incremental_entities,
        "er_incremental_matches": _er_incremental_matches,
        "sim_incremental_ann": _sim_incremental_ann,
        "sim_ann_lsh": _sim_ann_lsh,
        "sim_ann_lsh_multiprobe": _sim_ann_lsh_multiprobe,
        "sim_near_dups_lsh": _sim_near_dups_lsh,
        "er_stage_metrics": _er_stage_metrics,
        "er_table_roundtrip": _er_table_roundtrip,
        "er_table_prod_scores": _er_table_prod_scores,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_REV = ("round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)) * "
        "CAST(1 - l_discount AS DECIMAL(38,6))) AS DOUBLE), 2)")

_TOKS = ("list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
         "x -> x != '')")

# raw-case tokens (build_idf / _summarize_one do not lowercase)
_RAWTOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"

_SHINGLES = (
    "list_distinct(list_transform(range(greatest(len(w)-3,0)+1), "
    "i -> array_to_string(w[i+1:i+3], ' ')))"
)


def _lang_sql() -> str:
    def hits(lang):
        words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        return (f"len(list_intersect(list_distinct({_TOKS}), [{words}]))")

    return (
        f"CASE WHEN {hits('en')} = 0 AND {hits('es')} = 0 AND "
        f"{hits('fr')} = 0 AND {hits('de')} = 0 THEN 'und' "
        f"WHEN {hits('en')} >= {hits('es')} AND {hits('en')} >= {hits('fr')} "
        f"AND {hits('en')} >= {hits('de')} THEN 'en' "
        f"WHEN {hits('es')} >= {hits('fr')} AND {hits('es')} >= {hits('de')} "
        f"THEN 'es' "
        f"WHEN {hits('fr')} >= {hits('de')} THEN 'fr' ELSE 'de' END"
    )


def _quality_sql() -> str:
    en = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    n_words = f"len({_TOKS})"
    n_chars = "length(text)"
    n_punct = r"len(regexp_extract_all(text, '[^\w\s]'))"
    n_stop = f"len(list_intersect(list_distinct({_TOKS}), [{en}]))"
    wl = (f"CASE WHEN {n_words} > 0 THEN "
          f"CAST({n_chars} - ({n_words} - 1) AS DOUBLE) / {n_words} "
          f"ELSE 0.0 END")
    return (
        f"round(0.4 * (CASE WHEN {n_words} >= 5 AND {n_words} <= 10000 "
        f"THEN 1.0 ELSE 0.3 END) "
        f"+ 0.2 * (CASE WHEN {n_stop} >= 2 THEN 1.0 ELSE 0.5 END) "
        f"+ 0.2 * (CASE WHEN ({wl}) >= 2.0 AND ({wl}) <= 12.0 "
        f"THEN 1.0 ELSE 0.4 END) "
        f"+ 0.2 * (CASE WHEN CAST({n_punct} AS DOUBLE) / {n_chars} <= 0.2 "
        f"THEN 1.0 ELSE 0.6 END), 6)"
    )


_COS = (
    "round(list_sum(list_transform(list_zip(a.embedding, b.embedding), "
    "z -> z[1]::DOUBLE * z[2]::DOUBLE)) / "
    "(sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE*x::DOUBLE))) "
    "* sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE*x::DOUBLE)))"
    "), 6)"
)


def oracle_sql() -> dict[str, str]:
    from ditto_spark.operators.summarize import STOPWORDS

    ph_tok = porthash_sql("tok")
    stop = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    overlap = (
        "CAST(len(list_intersect("
        "list_distinct(list_filter(string_split_regex(lower(a.text), '\\s+'), x -> x != '')), "
        "list_distinct(list_filter(string_split_regex(lower(b.text), '\\s+'), x -> x != '')))) AS DOUBLE) "
        "/ greatest("
        "len(list_distinct(list_filter(string_split_regex(lower(a.text), '\\s+'), x -> x != ''))), "
        "len(list_distinct(list_filter(string_split_regex(lower(b.text), '\\s+'), x -> x != ''))))"
    )
    dk_input = (
        "text || ' ' || CAST(n_chars AS VARCHAR) || ' ' || "
        "printf('%.3f', n_chars / 7.0) || ' SKU' || "
        "CAST(doc_id AS VARCHAR) || 'X' || CAST(n_chars * 3 AS VARCHAR)"
    )
    return {
        "er_dk": f"""
            SELECT doc_id,
                   array_to_string(list_transform(
                     list_filter(string_split_regex({dk_input}, '\\s+'),
                                 x -> x != ''),
                     t -> CASE
                       WHEN regexp_matches(t, '^[-+]?\\d+$')
                         AND length(regexp_replace(t, '[-+]', '', 'g'))
                             <= 18
                         THEN 'NUM ' || CAST(CAST(t AS BIGINT) AS VARCHAR)
                       WHEN regexp_matches(t, '^[-+]?\\d*\\.\\d+$')
                         THEN 'NUM ' || printf('%.2f', CAST(t AS DOUBLE))
                       WHEN regexp_matches(t, '^[A-Za-z0-9\\-]{{8,}}$')
                         AND regexp_matches(t, '[A-Za-z]')
                         AND regexp_matches(t, '\\d')
                         THEN 'ID ' || t
                       ELSE t END), ' ') AS dk_text
            FROM documents
        """,
        # raw-case tokens: build_idf/_summarize_one tokenize WITHOUT
        # lowercasing (only the stopword test lowers), so the oracle
        # must too or any uppercase corpus diverges
        "er_summarize": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_RAWTOKS}) AS tok,
                     generate_subscripts({_RAWTOKS}, 1) AS pos
              FROM documents),
            n AS (SELECT COUNT(*) AS c FROM documents),
            dfreq AS (
              SELECT tok, COUNT(*) AS df
              FROM (SELECT DISTINCT doc_id, tok FROM tok) GROUP BY tok),
            idf AS (
              SELECT tok, ln((1.0 + (SELECT c FROM n)) / (1.0 + df)) + 1.0
                       AS idf
              FROM dfreq),
            cand AS (
              SELECT DISTINCT t.doc_id, t.tok FROM tok t
              WHERE lower(t.tok) NOT IN ({stop})),
            kept AS (
              SELECT doc_id, tok FROM (
                SELECT c.doc_id, c.tok,
                       ROW_NUMBER() OVER (PARTITION BY c.doc_id
                         ORDER BY i.idf DESC, c.tok ASC) AS rk
                FROM cand c JOIN idf i USING (tok))
              WHERE rk <= 8),
            agg AS (
              SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos)
                       AS summary
              FROM tok t JOIN kept k
                ON t.doc_id = k.doc_id AND t.tok = k.tok
              GROUP BY t.doc_id)
            SELECT d.doc_id, COALESCE(a.summary, '') AS summary
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "er_serialize_flat": """
            SELECT c_custkey,
                   concat_ws(' ',
                     CASE WHEN trim(COALESCE(c_name, '')) != ''
                          THEN 'COL c_name VAL ' || trim(c_name) END,
                     CASE WHEN trim(COALESCE(c_mktsegment, '')) != ''
                          THEN 'COL c_mktsegment VAL ' || trim(c_mktsegment)
                          END,
                     CASE WHEN trim(COALESCE(CAST(c_nationkey AS VARCHAR),
                                             '')) != ''
                          THEN 'COL c_nationkey VAL ' ||
                               trim(CAST(c_nationkey AS VARCHAR)) END)
                     AS text
            FROM customer
        """,
        "er_labelgen_counts": f"""
            WITH d AS (
              SELECT CAST(doc_id AS VARCHAR) AS id, text,
                     lang || '_' || source AS k
              FROM documents),
            pos AS (
              SELECT a.id AS left_id, b.id AS right_id
              FROM d a JOIN d b ON a.k = b.k AND a.id < b.id
              WHERE {overlap} > 0.3),
            negc AS (
              SELECT a.id AS left_id, b.id AS right_id,
                     ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY b.id)
                       AS rk
              FROM d a JOIN d b
                ON {porthash_sql('a.id')} % 64 = {porthash_sql('b.id')} % 64
               AND a.id < b.id
              WHERE {porthash_sql("a.id || '|' || b.id")} % 13 = 0),
            neg AS (
              SELECT left_id, right_id FROM negc c
              WHERE rk <= 5 AND NOT EXISTS (
                SELECT 1 FROM pos p
                WHERE p.left_id = c.left_id AND p.right_id = c.right_id)),
            lab AS (
              SELECT left_id, right_id, 1 AS label FROM pos
              UNION ALL
              SELECT left_id, right_id, 0 AS label FROM neg),
            sp AS (
              SELECT label,
                     CASE
                       WHEN {porthash_sql(
                           "'split42|' || left_id || '|' || right_id")}
                            % 100 < 70 THEN 'train'
                       WHEN {porthash_sql(
                           "'split42|' || left_id || '|' || right_id")}
                            % 100 < 85 THEN 'valid'
                       ELSE 'test' END AS split
              FROM lab)
            SELECT split, label, COUNT(*) AS n
            FROM sp GROUP BY 1, 2 ORDER BY split, label
        """,
        "er_threshold_sweep": f"""
            WITH d AS (SELECT doc_id, {_TOKS} AS w FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS s FROM d),
            ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
            pairs AS (
              SELECT a.doc_id AS l, b.doc_id AS r, a.n AS na, b.n AS nb,
                     COUNT(*) AS common
              FROM ex a JOIN ex b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4),
            scored AS (
              SELECT round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                       AS p
              FROM pairs
              WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                    >= 0.1),
            lbl AS (SELECT p, CASE WHEN p >= 0.2 THEN 1 ELSE 0 END AS y
                    FROM scored),
            grid AS (SELECT CAST(i AS DOUBLE) * 0.05 AS th
                     FROM (SELECT unnest(range(20)) AS i)),
            ex2 AS (
              SELECT g.th, l.y,
                     CASE WHEN l.p > g.th THEN 1 ELSE 0 END AS pred
              FROM lbl l CROSS JOIN grid g),
            f AS (
              SELECT th,
                     SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
                       AS tp,
                     SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END)
                       AS fp,
                     SUM(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END)
                       AS fn
              FROM ex2 GROUP BY th)
            SELECT th,
                   CASE WHEN 2 * tp + fp + fn > 0
                        THEN round(2 * tp / (2 * tp + fp + fn), 6)
                        ELSE 0.0 END AS f1
            FROM f
        """,
        "er_two_table_topk": f"""
            WITH d AS (
              SELECT CAST(doc_id AS VARCHAR) AS id, doc_id AS k, text
              FROM documents),
            tok AS (
              SELECT id, k, unnest({_TOKS}) AS tok FROM d),
            cnt AS (
              SELECT id, k,
                     CAST({porthash_sql('tok')} % 64 AS INT) AS dim,
                     CAST(COUNT(*) AS DOUBLE) AS w
              FROM tok GROUP BY 1, 2, 3),
            vecs AS (
              SELECT id, k, map(list(dim), list(w)) AS m
              FROM cnt GROUP BY 1, 2),
            dense AS (
              SELECT id, k,
                     list_transform(range(64),
                       i -> CAST(COALESCE(
                         list_extract(element_at(m, CAST(i AS INT)), 1),
                         0.0) AS DOUBLE)) AS raw
              FROM vecs),
            nrm AS (
              SELECT id, k,
                     list_transform(raw, x -> x /
                       sqrt(list_sum(list_transform(raw, y -> y * y))))
                       AS vec
              FROM dense),
            scored AS (
              SELECT a.id AS left_id, b.id AS right_id,
                     round(
                       list_sum(list_transform(list_zip(a.vec, b.vec),
                         z -> z[1]::DOUBLE * z[2]::DOUBLE)) /
                       (sqrt(list_sum(list_transform(a.vec,
                          x -> x::DOUBLE * x::DOUBLE))) *
                        sqrt(list_sum(list_transform(b.vec,
                          x -> x::DOUBLE * x::DOUBLE)))), 6) AS sim
              FROM nrm a CROSS JOIN nrm b
              WHERE a.k % 2 = 0 AND b.k % 2 = 1 AND b.k < 100),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY right_id
                ORDER BY sim DESC, left_id ASC) AS rank
              FROM scored)
            SELECT left_id, right_id, sim, rank
            FROM ranked WHERE rank <= 3
        """,
        "er_match_stats": f"""
            WITH d AS (SELECT doc_id, {_TOKS} AS w FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS s FROM d),
            ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
            pairs AS (
              SELECT a.doc_id AS l, b.doc_id AS r, a.n AS na, b.n AS nb,
                     COUNT(*) AS common
              FROM ex a JOIN ex b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4),
            scored AS (
              SELECT round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                       AS j
              FROM pairs
              WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                    >= 0.1),
            decided AS (
              SELECT CASE WHEN j >= 0.2 THEN 1 ELSE 0 END AS match,
                     CASE WHEN j >= 0.2 THEN j ELSE round(1 - j, 6) END
                       AS match_confidence
              FROM scored)
            SELECT COUNT(*) AS total_pairs,
                   CAST(SUM(match) AS BIGINT) AS matches,
                   CAST(COUNT(*) - SUM(match) AS BIGINT) AS non_matches,
                   round(SUM(match) / COUNT(*), 6) AS match_rate,
                   round(AVG(match_confidence), 6) AS avg_confidence
            FROM decided
        """,
        "corpus_clean": f"""
            WITH d0 AS (SELECT doc_id, {_TOKS} AS w, text FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS s FROM d0),
            ex0 AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
            kept AS (SELECT shingle FROM ex0 GROUP BY shingle
                     HAVING COUNT(*) <= 50),
            ex1 AS (SELECT ex0.doc_id, ex0.shingle
                    FROM ex0 JOIN kept USING (shingle)),
            nn AS (SELECT doc_id, COUNT(*) AS n FROM ex1 GROUP BY doc_id),
            ex AS (SELECT e.doc_id, nn.n, e.shingle
                   FROM ex1 e JOIN nn USING (doc_id)),
            pairs AS (
              SELECT a.doc_id AS l, b.doc_id AS r, a.n AS na, b.n AS nb,
                     COUNT(*) AS common
              FROM ex a JOIN ex b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4),
            dups AS (
              SELECT DISTINCT r AS doc_id FROM pairs
              WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                    >= 0.3),
            scored AS (
              SELECT doc_id, len({_TOKS}) AS n_tokens,
                     {_lang_sql()} AS lang_guess,
                     {_quality_sql()} AS quality
              FROM documents)
            SELECT s.doc_id, s.n_tokens, s.quality
            FROM scored s
            WHERE s.quality >= 0.8 AND s.lang_guess = 'en'
              AND NOT EXISTS (SELECT 1 FROM dups u
                              WHERE u.doc_id = s.doc_id)
        """,
        "q_date_arithmetic": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(month(o_orderdate) AS INT) AS mon,
                   CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
                   strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY,
                            '%Y-%m-%d') AS due_date,
                   CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                  DATE '2002-01-01') AS INT) AS age_days
            FROM orders
        """,
        "q_array_funcs": f"""
            SELECT doc_id,
                   len(list_distinct({_TOKS})) AS n_distinct,
                   list_sort(list_distinct({_TOKS}))[1] AS first_token,
                   list_sort(list_distinct({_TOKS}))[-1] AS last_token,
                   CASE WHEN list_contains({_TOKS}, 'spark')
                        THEN 1 ELSE 0 END AS has_spark,
                   array_to_string(
                     list_sort(list_distinct({_TOKS}))[1:3], ',')
                     AS top3_sorted
            FROM documents
        """,
        "q_events_lag_delta": """
            -- date_diff('second') == floor(a)-floor(b), matching Spark's
            -- unix_timestamp subtraction; epoch() is fractional and
            -- diverges on sub-second timestamps
            WITH g AS (
              SELECT user_id,
                     date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id), ts) AS gap
              FROM events)
            SELECT user_id, CAST(MIN(gap) AS BIGINT) AS min_gap,
                   CAST(MAX(gap) AS BIGINT) AS max_gap,
                   CAST(SUM(gap) AS BIGINT) AS sum_gap,
                   COUNT(*) AS n_gaps
            FROM g WHERE gap IS NOT NULL GROUP BY 1
        """,
        "q_correlated": """
            SELECT p.p_partkey, p.p_brand,
                   (SELECT MAX(l.l_quantity) FROM lineitem l
                    WHERE l.l_partkey = p.p_partkey) AS max_qty
            FROM part p
            WHERE (SELECT MAX(l.l_quantity) FROM lineitem l
                   WHERE l.l_partkey = p.p_partkey) >= 48
        """,
        "q_set_ops": """
            SELECT 'both' AS set_op, c_nationkey FROM (
              SELECT c_nationkey FROM customer
              WHERE c_mktsegment = 'BUILDING'
              INTERSECT
              SELECT c_nationkey FROM customer
              WHERE c_mktsegment = 'MACHINERY')
            UNION ALL
            SELECT 'building_only' AS set_op, c_nationkey FROM (
              SELECT c_nationkey FROM customer
              WHERE c_mktsegment = 'BUILDING'
              EXCEPT
              SELECT c_nationkey FROM customer
              WHERE c_mktsegment = 'MACHINERY')
        """,
        "q_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "q_string_funcs": """
            SELECT p_partkey,
                   upper(p_name) AS uname,
                   substring(p_name, 1, 5) AS prefix5,
                   length(p_name) AS name_len,
                   regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
                   lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
                   concat_ws('|', p_brand, p_type) AS brand_type
            FROM part
        """,
        "q_cube_events": """
            SELECT event_type, date_trunc('month', ts) AS mon,
                   COUNT(*) AS n,
                   round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                     AS sum_value
            FROM events
            GROUP BY CUBE (event_type, date_trunc('month', ts))
        """,
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
                     AS sum_qty,
                   round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
                         2) AS sum_base_price,
                   {_REV} AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q3_top_unshipped": f"""
            SELECT l.l_orderkey, o.o_orderdate, {_REV} AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "q5_region_revenue": f"""
            SELECT n.n_name, {_REV} AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
            GROUP BY 1 ORDER BY revenue DESC, n_name ASC
        """,
        "q_window_top_suppliers": """
            WITH ranked AS (
              SELECT s_nationkey, s_name,
                     CAST(s_acctbal AS DOUBLE) AS acctbal,
                     ROW_NUMBER() OVER (PARTITION BY s_nationkey
                       ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk
              FROM supplier)
            SELECT n.n_name, r.s_name, r.acctbal, r.rnk
            FROM ranked r JOIN nation n ON r.s_nationkey = n.n_nationkey
            WHERE r.rnk <= 3 ORDER BY n_name, rnk
        """,
        "q_rollup_orders": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
                   round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                     AS total_price
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "q_semi_customers": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        """,
        "q_anti_customers": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "q_distinct_priority": """
            SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        """,
        "q_events_daily": """
            SELECT date_trunc('day', ts) AS day, event_type,
                   COUNT(*) AS n_events,
                   round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                     AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q_events_sessions": """
            -- date_diff('second') matches Spark's truncated
            -- unix_timestamp difference (epoch() is fractional)
            WITH g AS (
              SELECT user_id,
                     CASE WHEN date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id), ts) > 1800
                       OR LAG(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) IS NULL
                     THEN 1 ELSE 0 END AS is_new
              FROM events)
            SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM g GROUP BY 1
        """,
        "q_events_json": """
            SELECT event_type,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
                        AS BIGINT) AS sum_k,
                   MAX(CAST(json_extract_string(props, '$.k') AS INT))
                     AS max_k,
                   COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        "er_serialize": """
            SELECT doc_id,
                   'COL title VAL ' || source || ' COL body VAL ' ||
                   trim(text) ||
                   CASE WHEN doc_id % 5 = 0
                        THEN ' COL media VAL [MEDIA] img://corpus/' ||
                             doc_id || '.jpg'
                        ELSE '' END AS serialized
            FROM documents
        """,
        "er_blocking_key_pairs": """
            WITH keyed AS (
              SELECT doc_id, lang || '_' || source AS block_key,
                     ROW_NUMBER() OVER (PARTITION BY lang || '_' || source
                       ORDER BY doc_id) AS rk
              FROM documents
              WHERE lang || '_' || source IS NOT NULL
                AND lang || '_' || source != ''),
            capped AS (SELECT * FROM keyed WHERE rk <= 50)
            SELECT a.doc_id AS left_id, b.doc_id AS right_id, a.block_key
            FROM capped a JOIN capped b
              ON a.block_key = b.block_key AND a.doc_id < b.doc_id
        """,
        "er_sorted_neighborhood": """
            WITH ranked AS (
              SELECT doc_id, ROW_NUMBER() OVER
                (ORDER BY lower(text), doc_id) AS rn
              FROM documents)
            SELECT LEAST(a.doc_id, b.doc_id) AS left_id,
                   GREATEST(a.doc_id, b.doc_id) AS right_id
            FROM ranked a JOIN ranked b
              ON b.rn - a.rn BETWEEN 1 AND 2
        """,
        "er_minhash": f"""
            WITH tok AS (
              SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok
              FROM documents)
            SELECT doc_id,
                   MIN({porthash_seed_sql('tok', 0)}) AS h0,
                   MIN({porthash_seed_sql('tok', 1)}) AS h1,
                   MIN({porthash_seed_sql('tok', 2)}) AS h2,
                   MIN({porthash_seed_sql('tok', 3)}) AS h3
            FROM tok GROUP BY doc_id
        """,
        "dedup_exact": """
            WITH u AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents
              WHERE doc_id < 100)
            SELECT md5(text) AS text_hash, COUNT(*) AS n_dups,
                   MIN(doc_id) AS representative
            FROM u GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH d AS (SELECT doc_id, {_TOKS} AS w FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS s FROM d),
            ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
            pairs AS (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     a.n AS na, b.n AS nb, COUNT(*) AS common
              FROM ex a JOIN ex b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
            SELECT left_id, right_id,
                   round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                     AS jaccard
            FROM pairs
            WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                  >= 0.1
        """,
        "dedup_simhash": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
            h AS (SELECT doc_id, {ph_tok} AS hv FROM tok),
            bits AS (
              SELECT doc_id, b,
                     SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM h CROSS JOIN (SELECT unnest(range(32)) AS b)
              GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b)
                            ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY 1
        """,
        "sim_cosine_topk": f"""
            WITH scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     {_COS} AS cosine
              FROM embeddings a JOIN embeddings b
                ON a.vec_id != b.vec_id
              WHERE a.vec_id < 10),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, cosine, rank
            FROM ranked WHERE rank <= 5
        """,
        "sim_near_dups": f"""
            SELECT a.vec_id AS left_id, b.vec_id AS right_id,
                   {_COS} AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE {_COS} >= 0.45
        """,
        "text_stats": f"""
            SELECT doc_id,
                   len({_TOKS}) AS n_ws,
                   len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
                   {_lang_sql()} AS lang_guess,
                   {_quality_sql()} AS quality,
                   (SELECT CAST(SUM(({porthash_sql('t.tok')} % {FP_MOD})
                                    * t.i) % {FP_MOD} AS BIGINT)
                    FROM (SELECT unnest({_TOKS}) AS tok,
                                 generate_subscripts({_TOKS}, 1) AS i) t)
                     AS fp
            FROM documents
        """,
        "mm_frame_plan": """
            SELECT doc_id,
                   unnest(generate_series(0,
                     greatest(n_chars * 10 - 1, 0), 500)) AS frame_ts_ms
            FROM documents WHERE doc_id % 7 = 0
        """,
        "cluster_cc": f"""
            WITH RECURSIVE
            d AS (SELECT doc_id, {_TOKS} AS w FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS s FROM d),
            ex0 AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
            kept AS (SELECT shingle FROM ex0 GROUP BY shingle
                     HAVING COUNT(*) <= 50),
            ex1 AS (SELECT ex0.doc_id, ex0.shingle
                    FROM ex0 JOIN kept USING (shingle)),
            nn AS (SELECT doc_id, COUNT(*) AS n FROM ex1 GROUP BY doc_id),
            ex AS (SELECT e.doc_id, nn.n, e.shingle
                   FROM ex1 e JOIN nn USING (doc_id)),
            pairs AS (
              SELECT a.doc_id AS l, b.doc_id AS r,
                     a.n AS na, b.n AS nb, COUNT(*) AS common
              FROM ex a JOIN ex b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4),
            edges AS (
              SELECT l, r FROM pairs
              WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                    >= 0.1),
            und AS (SELECT l AS a, r AS b FROM edges
                    UNION SELECT r, l FROM edges),
            reach(a, b) AS (
              SELECT a, b FROM und
              UNION
              SELECT reach.a, und.b FROM reach
              JOIN und ON reach.b = und.a),
            comp AS (
              SELECT a AS doc_id, LEAST(MIN(b), a) AS entity_id
              FROM reach GROUP BY a)
            SELECT doc_id, entity_id FROM comp ORDER BY doc_id
        """,
        # er_pipeline_matches: intentionally no oracle (iterator-UDF model
        # scoring + multi-pass LSH blocking is not one SQL query); the
        # driver records the weaker rows-only check. er_pipeline_sql is
        # the hash-exact SQL-surface twin (SN blocking + native scorer).
        "er_dk_general": _dk_general_oracle_sql(),
        "er_summarize_ref": _summarize_ref_oracle_sql(),
        "er_pipeline_sql": _pipeline_sql_oracle_sql(),
        "er_pipeline_entities": _pipeline_entities_oracle_sql(),
        "er_pipeline_full": _pipeline_full_oracle_sql(),
        "er_threshold_verified": _threshold_verified_oracle_sql(),
        "dedup_ngram_jaccard_capped": _ngram_capped_oracle_sql(),
        "er_blocking_quality": _blocking_quality_oracle_sql(),
        "er_lsh_tuning_curve": _lsh_tuning_curve_oracle_sql(),
        "dedup_contamination": _contamination_oracle_sql(),
        "dedup_repeated_spans": _repeated_spans_oracle_sql(),
        "dedup_span_coverage": _span_coverage_oracle_sql(),
        "sim_ann_lsh": _ann_lsh_oracle_sql(),
        "sim_ann_lsh_multiprobe": _ann_lsh_multiprobe_oracle_sql(),
        "sim_near_dups_lsh": _near_dups_lsh_oracle_sql(),
        "er_stage_metrics": _stage_metrics_oracle_sql(),
        "er_table_roundtrip": _table_roundtrip_oracle_sql(),
        "er_table_prod_scores": _table_prod_scores_oracle_sql(),
    }


# serialized-entity SQL fragment (same construction as the er_serialize
# oracle — COL/VAL text from the flat documents columns)
_SER_SQL = (
    "'COL title VAL ' || source || ' COL body VAL ' || trim(text) || "
    "CASE WHEN doc_id % 5 = 0 THEN ' COL media VAL [MEDIA] img://corpus/'"
    " || doc_id || '.jpg' ELSE '' END"
)


def _sql_list(words) -> str:
    # double single quotes: stopwords include don't / she's / that'll
    return ", ".join("'{}'".format(w.replace("'", "''"))
                     for w in sorted(words))


def _dk_general_oracle_sql() -> str:
    from ditto_spark.operators.knowledge import (
        LOCATIONS, MONTHS, ORG_SUFFIX, PERSON_FIRST, PRODUCTS, UNITS,
        WEEKDAYS,
    )

    label = f"""CASE
        WHEN lower(__TI__) IN ({_sql_list(PERSON_FIRST)}) THEN 'PERSON'
        WHEN lower(__TI__) IN ({_sql_list(ORG_SUFFIX)}) THEN 'ORG'
        WHEN lower(__TI__) IN ({_sql_list(LOCATIONS)}) THEN 'LOC'
        WHEN lower(__TI__) IN ({_sql_list(PRODUCTS)}) THEN 'PRODUCT'
        WHEN lower(__TI__) IN ({_sql_list(MONTHS)})
             OR lower(__TI__) IN ({_sql_list(WEEKDAYS)})
             OR regexp_matches(__TI__,
                '^(\\d{{4}}-\\d{{2}}-\\d{{2}}|\\d{{1,2}}/\\d{{1,2}}/\\d{{2,4}})$')
             OR regexp_matches(__TI__, '^(19|20)\\d{{2}}$') THEN 'DATE'
        WHEN regexp_matches(__TI__, '^[-+]?\\d+(\\.\\d+)?$')
             AND lower(coalesce(__TN__, '')) IN ({_sql_list(UNITS)})
             THEN 'QUANTITY'
        WHEN regexp_matches(__TI__,
             '^\\d{{1,2}}:\\d{{2}}(:\\d{{2}})?(am|pm)?$')
             THEN 'TIME'
        WHEN regexp_matches(__TI__, '^[A-Z][a-z]+$')
             AND NOT regexp_matches(coalesce(__TP__, ''), '^[A-Z][a-z]+$')
             AND lower(coalesce(__TN__, '')) IN ({_sql_list(ORG_SUFFIX)})
             THEN 'ORG'
        WHEN regexp_matches(__TI__, '^[A-Z][a-z]+$')
             AND NOT regexp_matches(coalesce(__TP__, ''), '^[A-Z][a-z]+$')
             AND regexp_matches(coalesce(__TN__, ''), '^[A-Z][a-z]+$')
             THEN 'PERSON'
        END"""
    norm = """CASE
        WHEN regexp_matches(__TI__, '^[-+]?\\d+$')
             AND length(regexp_replace(__TI__, '[-+]', '', 'g')) <= 18
             THEN CAST(CAST(__TI__ AS BIGINT) AS VARCHAR)
        WHEN regexp_matches(__TI__, '^[-+]?\\d*\\.\\d+$')
             AND CAST(__TI__ AS DOUBLE) = round(CAST(__TI__ AS DOUBLE), 0)
             AND TRY_CAST(CAST(__TI__ AS DOUBLE) AS BIGINT) IS NOT NULL
             THEN CAST(TRY_CAST(CAST(__TI__ AS DOUBLE) AS BIGINT) AS VARCHAR)
        WHEN regexp_matches(__TI__, '^[-+]?\\d*\\.\\d+$')
             THEN printf('%.2f', CAST(__TI__ AS DOUBLE))
        WHEN length(__TI__) >= 7 AND regexp_matches(__TI__, '\\d')
             THEN 'ID ' || __TI__
        ELSE __TI__ END"""
    per_tok = (f"CASE WHEN ({label}) IS NOT NULL THEN ({label}) || ' ' || "
               f"({norm}) ELSE ({norm}) END")
    per_tok = (per_tok.replace("__TI__", "t[i]")
               .replace("__TN__", "t[i+1]")
               .replace("__TP__", "t[i-1]"))
    return f"""
        WITH enr AS (
          SELECT doc_id,
                 text || ' ' || CAST(n_chars AS VARCHAR) || ' ' ||
                 printf('%.3f', n_chars / 7.0) || ' ' ||
                 'SKU' || doc_id || 'X' || (n_chars * 3) || ' ' ||
                 '{_DK_SUFFIX}' AS e
          FROM documents),
        toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(e, '\\s+'),
                             x -> x != '') AS t
          FROM enr)
        SELECT doc_id,
               array_to_string(
                 list_transform(range(1, len(t) + 1), i -> {per_tok}),
                 ' ') AS dk_text
        FROM toks
    """


# value-token extraction for the native surrogate formula: drop ''/'val',
# then drop 'col' and the token directly following it, dedupe
def _vt_sql(col: str) -> str:
    t1 = (f"list_filter(string_split_regex(lower(trim({col})), '\\s+'), "
          "x -> x != '' AND x != 'val')")
    return (
        f"list_distinct(list_filter(list_transform("
        f"range(1, len({t1}) + 1), "
        f"i -> CASE WHEN ({t1})[i] != 'col' AND "
        f"(i = 1 OR ({t1})[i-1] != 'col') THEN ({t1})[i] END), "
        f"x -> x IS NOT NULL))"
    )


def _sn_pair_ctes() -> str:
    """ser (serialize) + ranked + p0 (SN window-2 pairs)."""
    return f"""ser AS (SELECT doc_id, {_SER_SQL} AS text FROM documents),
        ranked AS (
          SELECT doc_id, text,
                 ROW_NUMBER() OVER (ORDER BY lower(text), doc_id) AS rn
          FROM ser),
        p0 AS (
          SELECT LEAST(a.doc_id, b.doc_id) AS left_id,
                 GREATEST(a.doc_id, b.doc_id) AS right_id
          FROM ranked a JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND 2)"""


def _score_ctes(pair_source: str = "p0") -> str:
    """pairs (text attach) -> vt -> sc -> p1c (surrogate probability),
    reading candidate pairs from ``pair_source``."""
    return f"""pairs AS (
          SELECT p.left_id, p.right_id, sa.text AS lt, sb.text AS rt
          FROM {pair_source} p
               JOIN ser sa ON sa.doc_id = p.left_id
               JOIN ser sb ON sb.doc_id = p.right_id),
        {_score_math_ctes()}"""


def _score_math_ctes() -> str:
    """vt -> sc -> p1c: the surrogate-probability math over an existing
    ``pairs(left_id, right_id, lt, rt)`` CTE (shared by the ser-joined
    pipeline oracles and the pre-paired catalog-table oracle, which
    carries its texts in the pair rows)."""
    return f"""vt AS (
          SELECT left_id, right_id,
                 {_vt_sql('lt')} AS a, {_vt_sql('rt')} AS b
          FROM pairs),
        sc AS (
          SELECT left_id, right_id, len(a) AS na, len(b) AS nb,
                 len(list_intersect(a, b)) AS ci,
                 len(list_distinct(list_concat(a, b))) AS cu
          FROM vt),
        p1c AS (
          SELECT left_id, right_id,
                 CASE WHEN na = 0 OR nb = 0 THEN 0.02
                      ELSE 1.0 / (1.0 + exp(-(
                        14.0 * (CAST(ci AS DOUBLE) / cu)
                        + 4.0 * (CAST(ci AS DOUBLE) / LEAST(na, nb))
                        + (CAST(LEAST(na, nb) AS DOUBLE) / GREATEST(na, nb))
                        - 8.0)))
                 END AS p
          FROM sc)"""


def _pipeline_decision_ctes(pair_source: str = "p0") -> str:
    """SN chain + scoring chain in CTE-dependency order."""
    return f"{_sn_pair_ctes()},\n        {_score_ctes(pair_source)}"


def _pipeline_sql_oracle_sql() -> str:
    return f"""
        WITH {_pipeline_decision_ctes()}
        SELECT left_id, right_id,
               CASE WHEN p > 0.5 THEN 1 ELSE 0 END AS match,
               round(p, 6) AS p1r
        FROM p1c
    """


def _minhash_portable_ctes(n_hashes: int = 24, bands: int = 6,
                           prefix: str = "m") -> str:
    """DuckDB recomputation of blocking.minhash_band_buckets with
    token_hash='portable' (default 24 hashes x 6 bands x 4 rows,
    shingle_n=3, max_bucket_rows=200, marker tokens dropped): token
    porthash mod p -> polynomial 3-shingles (short docs keep their
    pos-0 partial shingle, blocking.py complete-shingle filter) ->
    per-permutation min -> raw-signature band keys -> capped buckets ->
    i<j pair join. ``prefix`` namespaces the CTEs so several band
    configs can coexist in one WITH (the tuning-curve oracle); the
    final pair CTE is ``{prefix}hp``."""
    from ditto_spark.operators.blocking import MERSENNE31, _mh_params

    p = MERSENNE31
    rows = n_hashes // bands
    a_c, b_c = _mh_params(n_hashes)
    ph = porthash_sql("x")
    sigs = ",\n                 ".join(
        f"list_min(list_transform(sh, s -> ({a_c[k]} * s + {b_c[k]}) "
        f"% {p})) AS s{k}"
        for k in range(n_hashes))
    bandkeys = ",\n            ".join(
        "'" + str(b) + "_' || " + " || ',' || ".join(
            f"CAST(s{b * rows + r} AS VARCHAR)" for r in range(rows))
        for b in range(bands))
    M = 1_000_003
    m = prefix
    return f"""{m}toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)),
                                                '\\s+'),
                             x -> x != '' AND x != 'col' AND x != 'val')
                   AS t
          FROM ser),
        {m}h AS (
          SELECT doc_id,
                 list_transform(t, x -> {ph} % {p}) AS h,
                 len(t) AS n
          FROM {m}toks),
        {m}sh AS (
          SELECT doc_id,
                 CASE
                   WHEN n >= 3 THEN list_transform(range(1, n - 1),
                     i -> (((h[i] * {M} + h[i + 1]) % {p}) * {M}
                           + h[i + 2]) % {p})
                   WHEN n = 2 THEN
                     [((((h[1] * {M} + h[2]) % {p}) * {M}) % {p})]
                   WHEN n = 1 THEN
                     [((((h[1] * {M}) % {p}) * {M}) % {p})]
                   ELSE []
                 END AS sh
          FROM {m}h),
        {m}sig AS (
          SELECT doc_id,
                 {sigs}
          FROM {m}sh WHERE len(sh) > 0),
        {m}bands AS (
          SELECT doc_id, unnest([
            {bandkeys}
          ]) AS block_key
          FROM {m}sig),
        {m}cap AS (
          SELECT doc_id, block_key FROM (
            SELECT doc_id, block_key,
                   row_number() OVER (PARTITION BY block_key
                                      ORDER BY doc_id) AS rk
            FROM {m}bands)
          WHERE rk <= 200),
        {m}hp AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
          FROM {m}cap a JOIN {m}cap b
            ON a.block_key = b.block_key AND a.doc_id < b.doc_id)"""


def _jaccard_truth_ctes(cap: int = 50, threshold: float = 0.3) -> str:
    """Capped 3-gram-Jaccard ground-truth pair CTEs, ending in
    ``truth`` (left_id, right_id) — the `t`-prefixed twin of
    ``_ngram_capped_oracle_sql``'s chain, namespaced so it composes
    with the blocking CTEs in one WITH."""
    return f"""td AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        tsh AS (SELECT doc_id, {_SHINGLES} AS s FROM td),
        tex0 AS (SELECT doc_id, unnest(s) AS shingle FROM tsh),
        tkept AS (SELECT shingle FROM tex0 GROUP BY shingle
                  HAVING COUNT(*) <= {cap}),
        tex1 AS (SELECT tex0.doc_id, tex0.shingle
                 FROM tex0 JOIN tkept USING (shingle)),
        tnn AS (SELECT doc_id, COUNT(*) AS n FROM tex1 GROUP BY doc_id),
        tex AS (SELECT e.doc_id, tnn.n, e.shingle
                FROM tex1 e JOIN tnn USING (doc_id)),
        tpairs AS (
          SELECT a.doc_id AS l, b.doc_id AS r, a.n AS na, b.n AS nb,
                 COUNT(*) AS common
          FROM tex a JOIN tex b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        truth AS MATERIALIZED (
          SELECT l AS left_id, r AS right_id FROM tpairs
          WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                >= {threshold})"""


def _blocking_quality_oracle_sql(cap: int = 50,
                                 threshold: float = 0.3) -> str:
    """Recompute BOTH sides independently: the two-pass candidate set
    (SN + portable MinHash CTEs) and the capped-Jaccard truth set, then
    the completeness/reduction arithmetic."""
    return f"""
        WITH {_sn_pair_ctes()},
        {_minhash_portable_ctes()},
        allp AS (
          SELECT left_id, right_id FROM p0
          UNION
          SELECT left_id, right_id FROM mhp),
        {_jaccard_truth_ctes(cap, threshold)},
        nt AS (SELECT COUNT(*) AS n_truth FROM truth),
        nh AS (SELECT COUNT(*) AS n_hit
               FROM truth t JOIN allp c
                 ON t.left_id = c.left_id AND t.right_id = c.right_id),
        nc AS (SELECT COUNT(*) AS n_candidates FROM allp),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT n_docs, n_candidates, n_truth, n_hit,
               round(CAST(n_hit AS DOUBLE)
                     / CAST(GREATEST(n_truth, 1) AS DOUBLE), 6)
                 AS pair_completeness,
               round(1.0 - n_candidates
                     / (CAST(n_docs AS DOUBLE)
                        * CAST(n_docs - 1 AS DOUBLE) / 2.0), 6)
                 AS reduction_ratio
        FROM nt, nh, nc, nd
    """


def _lsh_tuning_curve_oracle_sql(band_configs=(2, 6, 12),
                                 n_hashes: int = 24) -> str:
    """One namespaced portable-MinHash CTE chain per banding (prefix
    mb{bands}_), shared truth chain, one quality row per config."""
    chains = ",\n        ".join(
        _minhash_portable_ctes(n_hashes, b, prefix=f"mb{b}_")
        for b in band_configs)
    legs = "\n        UNION ALL\n        ".join(f"""SELECT
            {b} AS bands, {n_hashes // b} AS rows_per_band,
            (SELECT COUNT(*) FROM documents) AS n_docs,
            (SELECT COUNT(*) FROM mb{b}_hp) AS n_candidates,
            (SELECT COUNT(*) FROM truth) AS n_truth,
            (SELECT COUNT(*) FROM truth t JOIN mb{b}_hp c
               ON t.left_id = c.left_id AND t.right_id = c.right_id)
              AS n_hit""" for b in band_configs)
    return f"""
        WITH ser AS (SELECT doc_id, {_SER_SQL} AS text FROM documents),
        {chains},
        {_jaccard_truth_ctes()},
        legs AS (
        {legs})
        SELECT bands, rows_per_band, n_docs, n_candidates, n_truth,
               n_hit,
               round(CAST(n_hit AS DOUBLE)
                     / CAST(GREATEST(n_truth, 1) AS DOUBLE), 6)
                 AS pair_completeness,
               round(1.0 - n_candidates
                     / (CAST(n_docs AS DOUBLE)
                        * CAST(n_docs - 1 AS DOUBLE) / 2.0), 6)
                 AS reduction_ratio
        FROM legs
        ORDER BY bands
    """


def _table_roundtrip_oracle_sql() -> str:
    """COL/VAL serialization of the documents attributes rebuilt from
    the raw parquet — the Spark side must read the same content back
    through the metastore table and the flat->spans bridge."""
    def piece(col: str) -> str:
        v = f"trim(COALESCE(CAST({col} AS VARCHAR), ''))"
        return f"CASE WHEN {v} != '' THEN 'COL {col} VAL ' || {v} END"

    return f"""
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               concat_ws(' ', {piece('text')}, {piece('lang')},
                         {piece('source')}, {piece('n_chars')}) AS text
        FROM documents
    """


def _table_prod_scores_oracle_sql() -> str:
    """Pre-paired adjacent-document pairs scored with the surrogate
    math CTEs; texts serialized inline (split_production's single-field
    COL/VAL form), ids = L/R + the pair id column."""
    lt = ("concat_ws(' ', CASE WHEN trim(COALESCE(a.text, '')) != '' "
          "THEN 'COL text VAL ' || trim(a.text) END)")
    rt = ("concat_ws(' ', CASE WHEN trim(COALESCE(b.text, '')) != '' "
          "THEN 'COL text VAL ' || trim(b.text) END)")
    return f"""
        WITH pairs AS (
          SELECT 'L' || CAST(a.doc_id AS VARCHAR) AS left_id,
                 'R' || CAST(a.doc_id AS VARCHAR) AS right_id,
                 {lt} AS lt, {rt} AS rt
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % 2 = 0),
        {_score_math_ctes()}
        SELECT left_id, right_id,
               CASE WHEN p > 0.5 THEN 1 ELSE 0 END AS match,
               round(p, 6) AS p1r
        FROM p1c
    """


def _pipeline_full_oracle_sql() -> str:
    return f"""
        WITH {_sn_pair_ctes()},
        {_minhash_portable_ctes()},
        allp AS (
          SELECT left_id, right_id FROM p0
          UNION
          SELECT left_id, right_id FROM mhp),
        {_score_ctes(pair_source="allp")}
        SELECT left_id, right_id,
               CASE WHEN p > 0.5 THEN 1 ELSE 0 END AS match,
               round(p, 6) AS p1r
        FROM p1c
    """


def _stage_metrics_oracle_sql() -> str:
    """Independent recount of every checkpointed stage the store-backed
    pipeline records in _metrics: serialized = one row per doc;
    candidates = |portable-MinHash pairs ∪ SN-window-2 pairs| (deduped,
    union_candidates contract); scored = 1:1 with candidates; entities
    = one label per doc (assign_entities contract)."""
    return f"""
        WITH {_sn_pair_ctes()},
        {_minhash_portable_ctes()},
        allp AS (
          SELECT left_id, right_id FROM p0
          UNION
          SELECT left_id, right_id FROM mhp),
        nd AS (SELECT COUNT(*) AS n FROM ser),
        nc AS (SELECT COUNT(*) AS n FROM allp)
        SELECT stage, CAST(n AS BIGINT) AS "rows" FROM (
          SELECT 'serialized' AS stage, (SELECT n FROM nd) AS n
          UNION ALL SELECT 'candidates', (SELECT n FROM nc)
          UNION ALL SELECT 'scored', (SELECT n FROM nc)
          UNION ALL SELECT 'entities', (SELECT n FROM nd))
        ORDER BY stage
    """


def _pipeline_entities_oracle_sql() -> str:
    """Entity closure over the decision chain: undirected reachability
    via a recursive CTE, component label = min reachable id (the same
    min-label contract as clustering.connected_components)."""
    return f"""
        WITH RECURSIVE {_pipeline_decision_ctes()},
        dec AS MATERIALIZED (SELECT left_id, right_id FROM p1c WHERE p > 0.5),
        -- MATERIALIZED: without it DuckDB re-inlines the whole decision
        -- chain into every recursion step of reach (measured: hang)
        bidir AS MATERIALIZED (
          SELECT left_id AS a, right_id AS b FROM dec
          UNION
          SELECT right_id, left_id FROM dec),
        reach(a, b) AS (
          SELECT a, b FROM bidir
          UNION
          SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a),
        comp AS (
          SELECT a AS doc_id, LEAST(MIN(b), a) AS entity_id
          FROM reach GROUP BY a)
        SELECT d.doc_id, COALESCE(c.entity_id, d.doc_id) AS entity_id
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    """


def _summarize_ref_oracle_sql() -> str:
    from ditto_spark.operators.summarize_ref import NLTK_STOPWORDS

    max_len = 12
    return f"""
        WITH pairs AS (
          SELECT a.doc_id AS pair_id, a.text AS lt, b.text AS rt
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % 2 = 0),
        entries AS (
          SELECT pair_id * 2 AS eid, lt AS text FROM pairs
          UNION ALL SELECT pair_id * 2 + 1, rt FROM pairs),
        nent AS (SELECT COUNT(*) AS n FROM entries),
        etok AS (
          SELECT DISTINCT eid,
                 unnest(regexp_extract_all(lower(text),
                                           '\\b\\w\\w+\\b')) AS tok
          FROM entries),
        vocab AS (
          SELECT tok,
                 ln((1.0 + (SELECT n FROM nent)) / (1.0 + COUNT(*)))
                   + 1.0 AS idf
          FROM etok GROUP BY tok),
        sides AS (
          SELECT pair_id, 'L' AS side, string_split(lt, ' ') AS toks
          FROM pairs
          UNION ALL
          SELECT pair_id, 'R', string_split(rt, ' ') FROM pairs),
        pt AS (
          SELECT pair_id, side,
                 unnest(list_transform(range(1, len(toks) + 1),
                        i -> struct_pack(pos := i, tok := toks[i]))) AS s
          FROM sides),
        postok AS (
          SELECT pair_id, side, s.pos AS pos, s.tok AS tok FROM pt),
        charge AS (
          SELECT pair_id, side,
                 SUM(CASE WHEN tok IN ('COL', 'VAL') THEN 1 ELSE 0 END)
                   AS ch
          FROM postok GROUP BY 1, 2),
        cnt AS (
          SELECT p.pair_id, p.tok, SUM(v.idf) AS w
          FROM postok p JOIN vocab v ON v.tok = p.tok
          WHERE p.tok NOT IN ('COL', 'VAL')
            AND p.tok NOT IN ({_sql_list(NLTK_STOPWORDS)})
          GROUP BY 1, 2),
        cand AS (
          SELECT d.pair_id, d.side, d.tok,
                 round(COALESCE(c.w, 0.0), 9) AS w
          FROM (SELECT DISTINCT pair_id, side, tok FROM postok) d
          LEFT JOIN cnt c ON c.pair_id = d.pair_id AND c.tok = d.tok),
        rankd AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY pair_id, side
                    ORDER BY w DESC, tok ASC) AS rk
          FROM cand),
        plen AS (
          SELECT *, CASE WHEN tok = '' THEN 0
                         ELSE GREATEST(1, CAST(ceil(length(tok) / 4.0)
                                               AS INT)) END AS pl
          FROM rankd WHERE rk <= {max_len}),
        cum AS (
          SELECT *, SUM(pl) OVER (PARTITION BY pair_id, side ORDER BY rk
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cl
          FROM plen),
        brk AS (
          SELECT c.*, ch.ch,
                 MIN(CASE WHEN ch.ch + c.cl > {max_len} THEN c.rk END)
                   OVER (PARTITION BY c.pair_id, c.side) AS brk_rk
          FROM cum c JOIN charge ch
            ON ch.pair_id = c.pair_id AND ch.side = c.side),
        kept AS (
          SELECT pair_id, side, tok FROM brk
          WHERE rk < COALESCE(brk_rk, 2147483647)),
        keptpos AS (
          SELECT p.pair_id, p.side, MIN(p.pos) AS pos, p.tok
          FROM postok p JOIN kept k ON k.pair_id = p.pair_id
            AND k.side = p.side AND k.tok = p.tok
          WHERE p.tok NOT IN ('COL', 'VAL')
          GROUP BY p.pair_id, p.side, p.tok),
        markpos AS (
          SELECT pair_id, side, pos, tok FROM postok
          WHERE tok IN ('COL', 'VAL')),
        emit AS (
          SELECT pair_id, side, pos, tok FROM keptpos
          UNION ALL SELECT pair_id, side, pos, tok FROM markpos),
        agg AS (
          SELECT pair_id, side,
                 string_agg(tok, ' ' ORDER BY pos) AS s
          FROM emit GROUP BY 1, 2)
        SELECT p.pair_id,
               COALESCE(l.s, '') AS left_summary,
               COALESCE(r.s, '') AS right_summary
        FROM pairs p
        LEFT JOIN agg l ON l.pair_id = p.pair_id AND l.side = 'L'
        LEFT JOIN agg r ON r.pair_id = p.pair_id AND r.side = 'R'
    """


_NGRAM_SWEEP_CTE = """
        WITH d AS (SELECT doc_id, {toks} AS w FROM documents),
        sh AS (SELECT doc_id, {shingles} AS s FROM d),
        ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        pairs AS (
          SELECT a.doc_id AS l, b.doc_id AS r, a.n AS na, b.n AS nb,
                 COUNT(*) AS common
          FROM ex a JOIN ex b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        scored AS (
          SELECT round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                   AS p
          FROM pairs
          WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                >= 0.1),
        lbl AS (SELECT p, CASE WHEN p >= 0.2 THEN 1 ELSE 0 END AS y
                FROM scored),
        grid AS (SELECT CAST(i AS DOUBLE) * 0.05 AS th
                 FROM (SELECT unnest(range(20)) AS i)),
        ex2 AS (
          SELECT g.th, l.y,
                 CASE WHEN l.p > g.th THEN 1 ELSE 0 END AS pred
          FROM lbl l CROSS JOIN grid g),
        f AS (
          SELECT th,
                 SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS tp,
                 SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS fp,
                 SUM(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS fn
          FROM ex2 GROUP BY th)
"""


def _threshold_verified_oracle_sql() -> str:
    return _NGRAM_SWEEP_CTE.format(toks=_TOKS, shingles=_SHINGLES) + """
        SELECT round(th, 6) AS best_th,
               round(f1x, 6) AS swept_f1,
               round(f1x, 6) AS repredicted_f1
        FROM (SELECT th,
                     CASE WHEN 2 * tp + fp + fn > 0
                          THEN 2.0 * tp / (2 * tp + fp + fn)
                          ELSE 0.0 END AS f1x
              FROM f)
        ORDER BY f1x DESC, th ASC LIMIT 1
    """


def _repeated_grams_cte(n: int = 4, min_df: int = 2) -> str:
    """Shared CTE body: full n-token rolling windows with positions and
    the cross-doc repeated subset (document frequency >= min_df), hashes
    via the portable md5-prefix family (hashing.porthash)."""
    return f"""
        toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
        pos AS (SELECT doc_id, ts, unnest(range(len(ts) - {n} + 1)) AS i
                FROM toks),
        grams AS (
          SELECT doc_id, CAST(i AS INT) AS start_pos,
                 ('0x' || substr(md5(array_to_string(ts[i+1:i+{n}], ' ')),
                  1, 15))::BIGINT AS gram_hash
          FROM pos),
        rep AS (
          SELECT gram_hash, COUNT(DISTINCT doc_id) AS ndocs
          FROM grams GROUP BY 1
          HAVING COUNT(DISTINCT doc_id) >= {min_df})"""


def _contamination_oracle_sql(n: int = 4, min_hits: int = 1) -> str:
    """Both sides' rolling grams recomputed from scratch; train side
    distinct-hashed, per-test-doc hit counts, short docs report 0."""
    gram = (f"('0x' || substr(md5(array_to_string(ts[i+1:i+{n}], ' ')), "
            "1, 15))::BIGINT")
    return f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS ts FROM documents),
        trg AS (
          SELECT DISTINCT {gram} AS gram_hash
          FROM (SELECT doc_id, ts,
                       unnest(range(len(ts) - {n} + 1)) AS i
                FROM toks WHERE doc_id % 2 = 0)),
        teg AS (
          SELECT doc_id, {gram} AS gram_hash
          FROM (SELECT doc_id, ts,
                       unnest(range(len(ts) - {n} + 1)) AS i
                FROM toks WHERE doc_id % 2 = 1)),
        per_doc AS (
          SELECT t.doc_id, COUNT(*) AS n_grams,
                 COUNT(g.gram_hash) AS n_hit_grams
          FROM teg t LEFT JOIN trg g USING (gram_hash)
          GROUP BY 1)
        SELECT d.doc_id,
               COALESCE(p.n_grams, 0) AS n_grams,
               COALESCE(p.n_hit_grams, 0) AS n_hit_grams,
               round(CASE WHEN COALESCE(p.n_grams, 0) > 0
                          THEN COALESCE(p.n_hit_grams, 0)
                               / CAST(p.n_grams AS DOUBLE)
                          ELSE 0.0 END, 6) AS hit_fraction,
               CAST(COALESCE(p.n_hit_grams, 0) >= {min_hits} AS INT)
                 AS contaminated
        FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        LEFT JOIN per_doc p USING (doc_id)
    """


def _repeated_spans_oracle_sql(n: int = 4, min_df: int = 2) -> str:
    return f"""
        WITH {_repeated_grams_cte(n, min_df)}
        SELECT g.doc_id, g.start_pos, g.gram_hash, r.ndocs
        FROM grams g JOIN rep r USING (gram_hash)
    """


def _span_coverage_oracle_sql(n: int = 4, min_df: int = 2) -> str:
    return f"""
        WITH {_repeated_grams_cte(n, min_df)},
        cov AS (
          SELECT doc_id, COUNT(DISTINCT p) AS covered FROM (
            SELECT g.doc_id, g.start_pos + x.x AS p
            FROM grams g JOIN rep r USING (gram_hash),
                 (SELECT unnest(range({n})) AS x) AS x)
          GROUP BY doc_id)
        SELECT t.doc_id, len(t.ts) AS n_tokens,
               COALESCE(c.covered, 0) AS covered,
               CASE WHEN len(t.ts) = 0 THEN 0.0
                    ELSE round(COALESCE(c.covered, 0)::DOUBLE
                               / len(t.ts), 6) END AS coverage
        FROM toks t LEFT JOIN cov c USING (doc_id)
    """


def _ngram_capped_oracle_sql(cap: int = 50, threshold: float = 0.3) -> str:
    return f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES} AS s FROM d),
        ex0 AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        kept AS (SELECT shingle FROM ex0 GROUP BY shingle
                 HAVING COUNT(*) <= {cap}),
        ex1 AS (SELECT ex0.doc_id, ex0.shingle
                FROM ex0 JOIN kept USING (shingle)),
        nn AS (SELECT doc_id, COUNT(*) AS n FROM ex1 GROUP BY doc_id),
        ex AS (SELECT e.doc_id, nn.n, e.shingle
               FROM ex1 e JOIN nn USING (doc_id)),
        pairs AS (
          SELECT a.doc_id AS l, b.doc_id AS r, a.n AS na, b.n AS nb,
                 COUNT(*) AS common
          FROM ex a JOIN ex b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        SELECT l AS left_id, r AS right_id,
               round(CAST(common AS DOUBLE) / (na + nb - common), 6)
                 AS jaccard
        FROM pairs
        WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6)
              >= {threshold}
        ORDER BY left_id, right_id
    """
