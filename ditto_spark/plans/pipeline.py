"""End-to-end ER pipeline: the Spark re-creation of the reference's
matcher/standalone flow (SURVEY.md §3.1, §3.3).

    docs -> serialize (P1) -> [summarize P7] -> [dk P8]
         -> block (J3 sorted-neighborhood ∪ J4 minhash-LSH)
         -> score (M1-M3 iterator UDF)
         -> threshold decisions -> cluster (connected components)

One lazy DataFrame chain per stage; optional CheckpointStore makes every
stage resumable with lineage + metrics (the Iceberg choreography that
replaces the reference's PVC/file handoff, ditto_kubeflow_pipeline.py:
521-589).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ditto_spark.operators import blocking as B
from ditto_spark.operators.clustering import assign_entities
from ditto_spark.operators.knowledge import dk_inject_df
from ditto_spark.operators.scoring import (SurrogateBackend,
                                           score_id_pairs_native,
                                           score_pairs)
from ditto_spark.operators.serialize import serialize_docs
from ditto_spark.operators.summarize import build_idf, summarize_column
from ditto_spark.sources.checkpoint import CheckpointStore, fingerprint_of


@dataclass
class PipelineConfig:
    threshold: float = 0.5
    use_summarizer: bool = False       # needs a corpus pass; optional
    summarizer_max_len: int = 64
    use_dk: bool = True
    # 6 bands x 4 rows: P(candidate) ≈ 81% per pass at jaccard 0.7 (real
    # near-dups; the SN pass covers the rest) but ~1% at jaccard 0.2 —
    # 2-row bands admit 28% of j=0.2 noise pairs, which at 100k docs
    # meant 27 candidates/doc (measured)
    minhash_hashes: int = 24
    minhash_bands: int = 6
    shingle_n: int = 3
    sn_window: int = 4
    max_bucket_rows: int = 200
    backend_factory: object = field(default=SurrogateBackend)
    # With the default SurrogateBackend, score via the identical-formula
    # native expression (whole-stage codegen, no Python workers). A real
    # model backend (torch) always routes through the mapInPandas path.
    native_scorer: bool = True
    # reference-exact PAIR summarizer applied to candidates before
    # scoring (the reference's .su stage ordering, summarize.py:63-109);
    # required for bit-compatibility with checkpoints trained with
    # summarization. Off by default: the showcase pipeline uses the
    # order-preserving per-doc variant via use_summarizer.
    ref_summarizer: bool = False
    ref_summarizer_max_len: int = 128
    # Parallelism of the model-scoring stage (mapInPandas path only; the
    # native codegen path needs no pin). None = score_pairs' default of
    # 4 x defaultParallelism — right on local[N] and on moderate
    # clusters, where it opts out of AQE's byte-based coalescing (which
    # otherwise collapses the narrow candidate table to 1-2 partitions
    # and serializes model inference) and absorbs pair-length skew. On
    # LARGE clusters (defaultParallelism = total cores, petabyte-scale
    # pair counts) set it explicitly: 4x total cores may over-shard the
    # candidate shuffle, and conversely a cluster scoring billions of
    # pairs may want partitions sized to ~100k pairs each regardless of
    # core count. See docs/PLANS.md "score_pairs parallelism".
    score_partitions: int | None = None
    # Token hash family for the MinHash pass: "xxhash64" (JVM-native,
    # fastest) or "portable" (md5-derived — reproducible outside the
    # JVM, used by the oracle-checked entries so DuckDB can recompute
    # the band keys bit-exactly).
    token_hash: str = "xxhash64"
    # Override of the sorted-neighborhood sort key (a Column over the
    # serialized `text`); None = the production sn_key() (first value
    # tokens). The oracle-checked stage-metrics entry passes
    # lower(text) so the SQL twin can reproduce the global order.
    sn_key_expr: object = None
    # Measured auto-banding (VERDICT r5 #6): when True, the MinHash
    # banding is CHOSEN per run from a sampled LSH s-curve instead of
    # taken from minhash_bands — blocking.lsh_tuning_curve measures
    # pair-completeness vs candidate volume for each candidate banding
    # on a corpus sample against a jaccard pseudo-truth, and
    # choose_banding picks the cheapest config meeting the completeness
    # target (else the most complete). Turns the s-curve theory knob
    # users hand-tune into a measurement. The chosen value enters the
    # blocking stage fingerprint, so a data-driven banding change
    # correctly invalidates downstream checkpoints.
    auto_bands: bool = False
    # completeness target the chosen banding must meet on the sample
    auto_bands_target: float = 0.95
    # candidate bandings (non-divisors of minhash_hashes are skipped)
    auto_bands_configs: tuple = (2, 4, 6, 12)
    # corpus fraction the curve is measured on. 1.0 = exact s-curve on
    # the full corpus (fine at test scale); at 10^12 docs sample small
    # (the curve is a ratio estimate — a 10^-4 sample of a corpus that
    # size still measures millions of docs). Seeded, so a fixed
    # partitioning reproduces its choice.
    auto_bands_sample: float = 1.0
    # jaccard threshold defining the pseudo-truth duplicate pairs the
    # completeness is measured against (uncapped-exactness not needed:
    # the capped shingle-df form keeps the estimate unbiased)
    auto_bands_truth_jaccard: float = 0.3
    # Bound on the driver-collected ref-TFIDF vocabulary (top-df tokens).
    # The oracle entries keep max_vocab=None for sklearn-exactness, but
    # the pipeline default must never collect an unbounded vocab at
    # corpus scale — under the cap, dropped rare tokens become OOV and
    # contribute 0 to the pair counter (summarize_ref.build_ref_tfidf
    # documents the semantics). 1M tokens ≈ tens of MB broadcast.
    ref_tfidf_max_vocab: int | None = 1_000_000


def _native_capable(factory) -> bool:
    """True iff the backend's decisions are exactly reproduced by the
    codegen expression in ``score_id_pairs_native``: the default
    ``SurrogateBackend`` class, a plain instance of it, or any factory
    that explicitly declares ``native_equivalent = True``. Subclasses do
    NOT inherit the claim — an overridden ``score_batch`` must not be
    silently replaced by the surrogate formula."""
    if factory is SurrogateBackend or type(factory) is SurrogateBackend:
        return True
    return getattr(factory, "native_equivalent", False) is True


def sn_key(text_col: str = "text"):
    """Sorted-neighborhood key: first value tokens of the serialized doc,
    normalized (the reference's lastname-equality analog,
    csv_to_matching_format.py:71-74)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: (t != "col") & (t != "val") & (t != ""),
    )
    return F.concat_ws(" ", F.slice(toks, 2, 3))


class _Stages(dict):
    """Pipeline result dict with DEFERRED tail stages.

    Connected components is a driver-side iteration loop — merely
    CONSTRUCTING the entities DataFrame runs the whole clustering job,
    so a caller that only consumes ``out["scored"]`` (e.g. the
    er_pipeline_matches driver entry, or any match-export workflow)
    must not pay for CC it never reads. Deferral is free for consumers:
    the deferred builder closes over the already-materialized scored
    checkpoint, so first access computes exactly what the eager path
    would have, once, and caches the frame in the dict.

    Deferred keys stay visible to every dict protocol (``in``, ``get``,
    ``keys``, ``len``) without triggering the build; only value access
    (``[]``, ``items``, ``values``) computes them — so a caller that
    inspects the result shape pays nothing, and one that iterates values
    gets exactly what an eager dict would have held."""

    def __init__(self, eager: dict, deferred: dict):
        super().__init__(eager)
        self._deferred = deferred

    def __getitem__(self, key):
        if not super().__contains__(key) and key in self._deferred:
            self[key] = self._deferred.pop(key)()
        return super().__getitem__(key)

    def __contains__(self, key):
        return super().__contains__(key) or key in self._deferred

    def __len__(self):
        return super().__len__() + len(self._deferred)

    def get(self, key, default=None):
        return self[key] if key in self else default

    def keys(self):
        return list(super().keys()) + list(self._deferred.keys())

    def __iter__(self):
        return iter(self.keys())

    def items(self):
        return [(k, self[k]) for k in self.keys()]

    def values(self):
        return [self[k] for k in self.keys()]


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    cfg: PipelineConfig | None = None,
    store: CheckpointStore | None = None,
    input_id: str = "",
) -> dict[str, DataFrame]:
    """Returns {'serialized', 'candidates', 'scored', 'matches',
    'entities'} DataFrames. With ``store`` set, every stage checkpoints
    and resumes idempotently.

    Stage fingerprints CHAIN: each includes its upstream stage's
    fingerprint plus its own config, and the root includes ``input_id``
    (an identifier of the input table — path, snapshot id, …). A change
    to any upstream config or to the input invalidates every downstream
    checkpoint; pass the same ``input_id`` only for the same input.
    """
    cfg = cfg or PipelineConfig()

    def ck(name: str, fp: str, build, partition_by=None) -> DataFrame:
        if store is None:
            # no checkpoint store: still materialize each stage once —
            # serialized feeds two blocking passes and candidates feed
            # scoring + clustering (the in-memory analog of the
            # reference's .su/.dk stage caches, summarize.py:129-135).
            # EAGER: lazy checkpoints let concurrent downstream branches
            # of one action race to compute the same partitions —
            # measured 3x slower at 32 cores than eager materialization.
            from ditto_spark.cachereg import cache_scope

            with cache_scope():
                # eager: materialized before the scope releases the
                # operator-internal self-join caches the build registered
                return build().localCheckpoint(eager=True)
        return store.stage(name, fp, build, partition_by)

    # a factory can carry an explicit identity (e.g. torch checkpoint
    # path + lm) via a `fingerprint` attribute; __name__ alone cannot
    # distinguish two closures over different model paths. Instances
    # without a fingerprint fall back to their CLASS qualname — never
    # repr(), whose memory address changes per process and would make
    # every checkpoint resume miss (recompute + rewrite on each run).
    backend_name = (
        getattr(cfg.backend_factory, "fingerprint", None)
        or getattr(cfg.backend_factory, "__name__", None)
        or type(cfg.backend_factory).__qualname__
    )

    # 1. serialize (drop_empty per reference matcher.py:53-57)
    fp_ser = fingerprint_of("serialize", input_id, cfg.use_dk,
                            cfg.use_summarizer, cfg.summarizer_max_len)
    serialized = ck("serialized", fp_ser,
                    lambda: _preprocess(spark, docs, cfg))

    # 2. blocking: two passes paired on ids only, unioned + deduped. The
    # candidates table stays (left_id, right_id, block_key) — the bucket
    # joins, pair dedup, and the checkpointed stage never carry the wide
    # serialized strings; scoring joins texts + per-doc token arrays back
    # in one pass.
    bands = (auto_select_bands(spark, serialized, cfg) if cfg.auto_bands
             else cfg.minhash_bands)

    def build_candidates() -> DataFrame:
        # dedup_pairs=False: union_candidates' groupBy(left, right)
        # dedupes the union anyway — the per-pass dropDuplicates was a
        # second exchange + aggregation over the same pair keys
        mh = B.minhash_lsh_blocking(
            serialized, n_hashes=cfg.minhash_hashes, bands=bands,
            shingle_n=cfg.shingle_n, max_bucket_rows=cfg.max_bucket_rows,
            with_texts=False, token_hash=cfg.token_hash,
            dedup_pairs=False,
        )
        key = cfg.sn_key_expr if cfg.sn_key_expr is not None else sn_key()
        sn = B.sorted_neighborhood(serialized, key, window=cfg.sn_window,
                                   with_texts=False)
        return B.union_candidates(mh, sn)

    # "block-v3": the stage content changed (hash family + SN key are
    # now config) — old checkpoints must invalidate. str(Column) is a
    # stable expression string; repr would embed a memory address.
    # With auto_bands the fingerprint carries the CHOSEN banding: a
    # data-driven change re-blocks instead of resuming a stale layout.
    fp_cand = fingerprint_of("block-v3", fp_ser, cfg.minhash_hashes,
                             bands, cfg.shingle_n,
                             cfg.sn_window, cfg.max_bucket_rows,
                             cfg.token_hash,
                             "default" if cfg.sn_key_expr is None
                             else str(cfg.sn_key_expr))
    if store is None:
        # candidates has exactly ONE downstream consumer (scoring), so
        # without a checkpoint store it stays lazy and fuses into the
        # scored stage — materializing the widest table (pairs + both
        # texts) into the block manager and reading it back costs more
        # than the dedup groupBy it would save. With a store it persists
        # as its own resumable stage.
        candidates = build_candidates()
    else:
        candidates = ck("candidates", fp_cand, build_candidates)

    # 3. score
    use_native = cfg.native_scorer and _native_capable(cfg.backend_factory)
    fp_scored = fingerprint_of("score", fp_cand, cfg.threshold,
                               backend_name, cfg.ref_summarizer,
                               cfg.ref_summarizer_max_len,
                               cfg.ref_tfidf_max_vocab)

    def build_scored() -> DataFrame:
        if cfg.ref_summarizer or not use_native:
            # text-carrying path: model backends (and the reference pair
            # summarizer) consume left_text/right_text
            cands = B.attach_texts(candidates, serialized)
            if cfg.ref_summarizer:
                from ditto_spark.operators.summarize_ref import (
                    build_ref_tfidf, summarize_pairs_ref,
                )

                vocab = build_ref_tfidf(spark, serialized, text_col="text",
                                        max_vocab=cfg.ref_tfidf_max_vocab)
                cands = summarize_pairs_ref(
                    cands, vocab, max_len=cfg.ref_summarizer_max_len)
            return score_pairs(cands, cfg.threshold, cfg.backend_factory,
                               num_partitions=cfg.score_partitions)
        # native path: per-doc token arrays joined onto id pairs
        return score_id_pairs_native(candidates, serialized, cfg.threshold)

    scored = ck("scored", fp_scored, build_scored)
    matches = scored.select("left_id", "right_id", "match",
                            "match_confidence")

    # 4. transitive clustering
    fp_ent = fingerprint_of("cluster", fp_scored)

    def build_entities() -> DataFrame:
        return ck("entities", fp_ent,
                  lambda: assign_entities(docs.select("doc_id"), scored))

    eager = {
        "serialized": serialized,
        "candidates": candidates,
        "scored": scored,
        "matches": matches,
    }
    if store is not None:
        # resumability contract: a store-backed run persists EVERY
        # stage (the CLI/cluster path) — keep entities eager
        eager["entities"] = build_entities()
        return _Stages(eager, {})
    return _Stages(eager, {"entities": build_entities})


def auto_select_bands(spark: SparkSession, serialized: DataFrame,
                      cfg: PipelineConfig) -> int:
    """Measure the LSH s-curve on a (sampled) corpus and pick the
    banding (VERDICT r5 #6): pseudo-truth = capped n-gram-jaccard pairs
    at ``auto_bands_truth_jaccard``; per candidate banding,
    ``lsh_tuning_curve`` measures pair completeness + candidate volume;
    ``choose_banding`` takes the cheapest config meeting
    ``auto_bands_target`` (else the most complete). Driver-side cost is
    one bounded collect of len(configs) rows; all measurement is
    distributed and scales with the SAMPLE."""
    from ditto_spark.cachereg import cache_scope
    from ditto_spark.operators.dedup import ngram_jaccard_pairs

    configs = [b for b in cfg.auto_bands_configs
               if b > 0 and cfg.minhash_hashes % b == 0]
    if not configs:
        raise ValueError(
            f"auto_bands_configs {cfg.auto_bands_configs} has no divisor "
            f"of minhash_hashes={cfg.minhash_hashes}")
    with cache_scope():
        sample = serialized
        if cfg.auto_bands_sample < 1.0:
            sample = serialized.sample(cfg.auto_bands_sample, seed=7)
        # materialize once: the sample feeds the pseudo-truth, every
        # banding's signature pass, and the quality denominators
        sample = sample.select("doc_id", "text").localCheckpoint(eager=True)
        truth = ngram_jaccard_pairs(
            sample, "doc_id", "text", n=cfg.shingle_n,
            threshold=cfg.auto_bands_truth_jaccard,
            max_shingle_df=cfg.max_bucket_rows)
        curve = B.lsh_tuning_curve(
            sample, truth, sample, configs, n_hashes=cfg.minhash_hashes,
            shingle_n=cfg.shingle_n, max_bucket_rows=cfg.max_bucket_rows,
            token_hash=cfg.token_hash)
        return int(B.choose_banding(curve, cfg.auto_bands_target)["bands"])


def run_table_pipeline(
    spark: SparkSession,
    table: str | None = None,
    cfg: PipelineConfig | None = None,
    store: CheckpointStore | None = None,
    limit: int | None = None,
    id_col: str | None = None,
    output_table: str | None = None,
    df: DataFrame | None = None,
):
    """Catalog-table ER entry — full S1 parity with the reference's
    production flow (hive_ditto_standalone.py:289-311 extract,
    :68-115 layout detect, :371-454 result save):

      SELECT * FROM <table> [LIMIT n]
        -> strip ``tablename.column`` prefixes
        -> layout auto-detect:
             production (*_left/*_right pairs): split to pre-paired
                 candidates (no blocking) -> score -> matches
             testing (flat records): one span per attribute
                 (``flat_to_docs``) -> the FULL docs pipeline
                 (serialize/summarize/DK/block/score/cluster), stage-
                 checkpointed when ``store`` is given
        -> optional set-based result table (``output_table``)

    Returns the stage dict (production: serialized-candidates 'scored'
    + 'matches'; testing: everything ``run_pipeline`` returns) plus a
    'layout' key. ``df`` substitutes an already-loaded frame for the
    catalog read (tests; programmatic callers)."""
    from ditto_spark.operators.serialize import (detect_layout,
                                                 flat_to_docs,
                                                 split_production,
                                                 strip_column_prefixes)
    from ditto_spark.sources.io import (read_table,
                                        write_matches_catalog_table)

    cfg = cfg or PipelineConfig()
    if df is None:
        df = read_table(spark, table, limit)
    df = strip_column_prefixes(df)
    layout = detect_layout(df)
    input_id = f"table:{table}:limit={limit}"

    if layout == "production":
        # pre-paired rows: the engine's J5 path — no blocking join; the
        # scorer consumes the split projections, with the same optional
        # preprocessing the reference matcher applies per pair
        # (matcher.py:51-60 to_str's dk/summarize flags)
        def build_scored() -> DataFrame:
            cands = split_production(df, id_col=id_col)
            if cfg.use_dk:
                cands = dk_inject_df(cands, ["left_text", "right_text"])
            if cfg.ref_summarizer:
                from ditto_spark.operators.summarize_ref import (
                    build_ref_tfidf, summarize_pairs_ref,
                )

                corpus = (cands.select(F.col("left_text").alias("text"))
                          .unionAll(cands.select(
                              F.col("right_text").alias("text"))))
                vocab = build_ref_tfidf(spark, corpus, text_col="text",
                                        max_vocab=cfg.ref_tfidf_max_vocab)
                cands = summarize_pairs_ref(
                    cands, vocab, max_len=cfg.ref_summarizer_max_len)
            if cfg.native_scorer and _native_capable(cfg.backend_factory):
                from ditto_spark.operators.scoring import score_pairs_native

                return score_pairs_native(cands, cfg.threshold)
            return score_pairs(cands, cfg.threshold, cfg.backend_factory,
                               num_partitions=cfg.score_partitions)

        backend_name = (
            getattr(cfg.backend_factory, "fingerprint", None)
            or getattr(cfg.backend_factory, "__name__", None)
            or type(cfg.backend_factory).__qualname__
        )
        fp = fingerprint_of("table-prod-score", input_id, id_col,
                            cfg.threshold, backend_name, cfg.use_dk,
                            cfg.ref_summarizer, cfg.ref_summarizer_max_len)
        if store is None:
            from ditto_spark.cachereg import cache_scope

            with cache_scope():
                scored = build_scored().localCheckpoint(eager=True)
        else:
            scored = store.stage("scored", fp, build_scored)
        out = {
            "layout": "production",
            "scored": scored,
            "matches": scored.select("left_id", "right_id", "match",
                                     "match_confidence"),
        }
    else:
        docs = flat_to_docs(df, id_col=id_col)
        out = run_pipeline(spark, docs, cfg, store=store,
                           input_id=input_id)
        out["layout"] = "testing"

    if output_table:
        write_matches_catalog_table(out["matches"], output_table)
    return out


def _preprocess(spark: SparkSession, docs: DataFrame,
                cfg: PipelineConfig) -> DataFrame:
    out = serialize_docs(docs, drop_empty=True).select("doc_id", "text")
    if cfg.use_summarizer:
        idf, dflt = build_idf(spark, out)
        out = summarize_column(out, idf, dflt, ["text"],
                               cfg.summarizer_max_len)
    if cfg.use_dk:
        out = dk_inject_df(out, ["text"])
    return out
