"""Deterministic text embeddings + two-table embedding blocking.

The reference's blocker (blocking/blocker.py) encodes entity strings
with a SentenceTransformer (M7), L2-normalizes (:36), then emits top-k
or threshold pairs from a blocked matmul (:43-80). No torch here, so the
encoder surrogate is the classic hashing-trick bag-of-words: dim =
porthash(token) mod D, weight 1, L2-normalized — deterministic, fully
codegen (posexplode + groupBy + pivot-free aggregation), and exactly
reproducible by the SQL oracle. A SentenceTransformer backend slots in
as a mapInPandas encoder with the same output column, mirroring
scoring.py's backend split.

Two-table blocking (the table_a/table_b CLI contract, blocker.py:90-121)
is then a join + window top-k: the distributed form of
`np.argpartition(-sim, k)` (:67-72), including the threshold mode whose
reference implementation crashes on an undefined variable (:74-79 uses
`total` that is never set — behavior re-created from intent, not code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ditto_spark.operators.blocking import tokenize
from ditto_spark.operators.hashing import porthash

# Routing-probe memo: (plan semanticHash, max_rows) -> exceeds? The
# probe is a bounded limit(n+1).count() job; repeated calls on the same
# logical plan (bench best-of-N, a pipeline routing twice over one
# input) answer identically, so memoizing saves one Spark job per
# repeat. Keyed on the ANALYZED plan fingerprint: if the data under an
# identical plan changes (a parquet path overwritten mid-session), the
# memo goes stale — cleared by ``session.clear_operator_caches`` with
# the rest of the between-runs operator state, and bounded so a
# long-lived session cannot grow it without limit.
_probe_cache: dict[tuple[int, int], tuple[DataFrame, bool]] = {}


def clear_probe_cache() -> None:
    """Drop memoized routing probes (between independent runs)."""
    _probe_cache.clear()


def _probe_exceeds(df: DataFrame, max_rows: int) -> bool:
    """True iff ``df`` has more than ``max_rows`` rows, established by a
    bounded limit(n+1) scan (early-terminates after n+1 rows — a full
    .count() on a 10^12-row table is itself a job), memoized per
    analyzed-plan fingerprint.

    The 32-bit ``semanticHash`` alone is not a safe key: a cross-plan
    collision would silently route a DIFFERENT query down the wrong
    exact-vs-ANN path (ADVICE r5), so each hit is verified with
    ``sameSemantics`` against the DataFrame that populated the entry —
    a driver-side plan comparison, no job — and a colliding plan simply
    re-probes uncached. Staleness (same path overwritten mid-session)
    is a scoping contract: bench repeats and the CheckpointStore call
    ``session.clear_operator_caches`` between runs, which drops this
    memo with the rest of the operator state; a caller that overwrites
    an input mid-session must do the same."""
    key = (df.semanticHash(), max_rows)
    hit = _probe_cache.get(key)
    if hit is not None and df.sameSemantics(hit[0]):
        return hit[1]
    if len(_probe_cache) > 256:
        _probe_cache.clear()
    result = df.limit(max_rows + 1).count() > max_rows
    _probe_cache[key] = (df, result)
    return result


def hashed_bow_embed(df: DataFrame, id_col: str, text_col: str,
                     dim: int = 64) -> DataFrame:
    """(id, vec array<double>) — hashing-trick BoW, L2-normalized.

    Plan: posexplode tokens -> dim = porthash(tok) mod D -> groupBy
    (id, dim) counts -> per-id dense vector via groupBy(id) +
    array construction from (dim, count) pairs -> normalize. Two
    aggregations on the same key (single partitioning chain).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    ).withColumn("d", (porthash(F.col("tok")) % dim).cast("int"))
    counts = toks.groupBy("id", "d").agg(
        F.count("*").cast("double").alias("w"))
    pairs = counts.groupBy("id").agg(
        F.map_from_arrays(F.collect_list("d"),
                          F.collect_list("w")).alias("m"))
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    dense = pairs.withColumn(
        "raw",
        F.transform(idx, lambda i: F.coalesce(
            F.element_at(F.col("m"), i.cast("int")), F.lit(0.0))))
    nrm = F.sqrt(F.aggregate(F.col("raw"), F.lit(0.0),
                             lambda a, x: a + x * x))
    return dense.select(
        "id",
        F.transform(F.col("raw"), lambda x: x / nrm).alias("vec"),
    )


def model_embed(df: DataFrame, id_col: str, text_col: str,
                encoder_factory, num_partitions: int | None = None
                ) -> DataFrame:
    """(id, vec array<double>) via a REAL model encoder in one
    Arrow-batched ``mapInPandas`` stage — the SentenceTransformer seam
    ``hashed_bow_embed`` documents (blocking/blocker.py:14-40).
    ``encoder_factory`` builds a backend exposing
    ``encode_batch(texts) -> (n, d) ndarray`` (e.g.
    ``npmodel.NumpySentenceEncoder``; a real torch SentenceTransformer
    wrapper has the identical surface); it is constructed lazily ONCE
    per python worker via the scoring backend cache, so model load is
    paid per executor, not per batch.

    Parallelism is pinned like ``score_pairs``: encode cost is per-row
    CPU that AQE's byte-based coalescing cannot see — without the
    explicit repartition a small-in-bytes text table collapses to 1-2
    tasks and the encoder runs near-serial."""
    import pandas as pd

    from ditto_spark.operators.scoring import _worker_backend

    if num_partitions is None:
        num_partitions = 4 * df.sparkSession.sparkContext.defaultParallelism
    proj = df.select(F.col(id_col).cast("string").alias("id"),
                     F.col(text_col).cast("string").alias("text"))
    proj = proj.repartition(num_partitions)

    def run(batches):
        enc = _worker_backend(encoder_factory)
        for pdf in batches:
            vecs = enc.encode_batch(pdf["text"].fillna("").tolist())
            yield pd.DataFrame({"id": pdf["id"],
                                "vec": [list(map(float, v)) for v in vecs]})

    return proj.mapInPandas(run, "id string, vec array<double>")


def two_table_topk_blocking(
    dfa: DataFrame,
    dfb: DataFrame,
    k: int = 10,
    threshold: float | None = None,
    id_col: str = "id",
    text_col: str = "text",
    dim: int = 64,
    exact: bool | None = None,
    max_exact_rows: int = 50_000,
    n_cells: int = 64,
    n_probe: int = 4,
    size_hint: tuple[int | None, int | None] | None = None,
    encoder_factory=None,
) -> DataFrame:
    """blocker.py:43-80 re-created: encode both tables, emit for each
    right-table row its top-k most-cosine-similar left rows (and/or a
    similarity threshold). Returns (left_id, right_id, sim, rank).

    Routing (the scale contract the reference's dense matmul lacks):
    ``exact=True`` forces the crossJoin + window form — the O(|A|x|B|)
    exact baseline, audit-only at scale. ``exact=False`` routes through
    the IVF coarse-quantizer ANN (one equi-join on cell id). Default
    ``None`` picks exact only while BOTH sides stay under
    ``max_exact_rows``, probed with BOUNDED limit(n+1) scans (a full
    .count() on a 10^12-row table is itself a job; the limit probe
    early-terminates after n+1 rows) and short-circuited so an
    oversized left side skips probing the right entirely; a 100TB run
    can never silently fall into the quadratic form. Callers that
    already know the row counts pass ``size_hint=(rows_a, rows_b)``
    (either element None to probe that side) and pay ZERO probe jobs;
    otherwise probe results are memoized per plan fingerprint so
    repeated routing over the same input costs one job total."""
    from ditto_spark.operators.similarity import cosine_vec, ivf_topk

    if exact is None:
        hint_a, hint_b = size_hint or (None, None)

        def _exceeds(df: DataFrame, hint: int | None) -> bool:
            if hint is not None:
                return hint > max_exact_rows
            return _probe_exceeds(df, max_exact_rows)

        exact = not (_exceeds(dfa, hint_a) or _exceeds(dfb, hint_b))
    if encoder_factory is not None:
        # real-model encode path (M7): same (id, vec) contract, so the
        # exact/ANN routing below is encoder-agnostic
        ea = model_embed(dfa, id_col, text_col, encoder_factory)
        eb = model_embed(dfb, id_col, text_col, encoder_factory)
    else:
        ea = hashed_bow_embed(dfa, id_col, text_col, dim)
        eb = hashed_bow_embed(dfb, id_col, text_col, dim)
    if not exact:
        out = ivf_topk(
            ea, eb, k=k, n_cells=n_cells, n_probe=n_probe,
            id_col="id", vec_col="vec", exclude_self=False,
        ).select(F.col("neighbor_id").alias("left_id"),
                 F.col("query_id").alias("right_id"),
                 F.col("cosine").alias("sim"), "rank")
        if threshold is not None:
            out = out.filter(F.col("sim") >= threshold)
        return out
    ea = ea.select(F.col("id").alias("left_id"), F.col("vec").alias("va"))
    eb = eb.select(F.col("id").alias("right_id"), F.col("vec").alias("vb"))
    scored = ea.crossJoin(eb).withColumn(
        "sim", F.round(cosine_vec(F.col("va"), F.col("vb")), 6))
    if threshold is not None:
        scored = scored.filter(F.col("sim") >= threshold)
    w = Window.partitionBy("right_id").orderBy(F.desc("sim"),
                                               F.asc("left_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("left_id", "right_id", "sim", "rank")
    )


def match_stats(scored: DataFrame) -> DataFrame:
    """A3: one-row match statistics (hive_ditto_standalone.py:262-286's
    printed stats as a set-based aggregate)."""
    return scored.agg(
        F.count("*").alias("total_pairs"),
        F.sum("match").alias("matches"),
        (F.count("*") - F.sum("match")).alias("non_matches"),
        F.round(F.sum("match") / F.count("*"), 6).alias("match_rate"),
        F.round(F.avg("match_confidence"), 6).alias("avg_confidence"),
    )
