"""Candidate-pair generation (SURVEY.md §2.3 J1-J4) as DataFrame joins.

Reference behaviors re-expressed Spark-first:
  J1 cartesian pair join (two tables)      hive_data_extractor.py:130-153
  J2 all-pairs self join (i<j)             csv_to_all_pairs.py:50-138,
                                           csv_to_matching_format.py:100-111
  J3 heuristic key blocking                csv_to_matching_format.py:59-84
     + sorted-neighborhood generalization
  J4 similarity blocking (embedding top-k) blocking/blocker.py:43-80
     -> here: MinHash-LSH over token shingles (portable hash family) and
        embedding LSH/top-k in operators/similarity.py

Scale design (the part the reference never faces — its pairing is
in-memory Python/numpy):
  * every blocking pass emits (left_id, right_id, ...) with left_id <
    right_id so union + dropDuplicates dedupes across passes;
  * equal-key self joins are shuffle hash joins on the key; heavy keys are
    capped (pairs-per-block bound) and salted before the join;
  * sorted-neighborhood avoids the single-partition global window via
    two-phase rank: range-partition by key, rank within partition, add
    broadcast per-partition offsets (a DataFrame zipWithIndex);
  * MinHash signatures are computed with native array expressions
    (transform + array_min) — no explode of (shingle x seed), no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ditto_spark.cachereg import cache_registered
from ditto_spark.operators.hashing import porthash


# ---------------------------------------------------------------------------
# J1/J2 exact pair joins (small inputs / test harness)
# ---------------------------------------------------------------------------

def cross_pairs(left: DataFrame, right: DataFrame) -> DataFrame:
    """All pairs A x B (hive_data_extractor.py:147-152). Only sane for
    tiny tables — blocking replaces this at scale."""
    l = left.select(F.col("doc_id").alias("left_id"),
                    F.col("text").alias("left_text"))
    r = right.select(F.col("doc_id").alias("right_id"),
                     F.col("text").alias("right_text"))
    return l.crossJoin(r)


def self_pairs(df: DataFrame) -> DataFrame:
    """All unordered i<j pairs of one table (csv_to_all_pairs.py:94-117
    emitted ordered pairs; csv_to_matching_format.py:100-111 unordered)."""
    a = df.select(F.col("doc_id").alias("left_id"),
                  F.col("text").alias("left_text"))
    b = df.select(F.col("doc_id").alias("right_id"),
                  F.col("text").alias("right_text"))
    return a.join(b, F.col("left_id") < F.col("right_id"))


# ---------------------------------------------------------------------------
# J3a: equal-key blocking with skew control
# ---------------------------------------------------------------------------

def key_blocking(
    df: DataFrame,
    key: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_block_rows: int | None = 1000,
    salt_above: int | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Pair rows sharing a normalized blocking key.

    Reference analog: equal-lastname blocking (csv_to_matching_format.py:
    71-74). Scale contract: a block of b rows emits O(b^2) pairs, so rows
    beyond ``max_block_rows`` within one key are dropped deterministically
    (rank by id) — the cap the reference's in-memory loop never needed.
    The self-join is an equi-join on the key (shuffle hash / sort-merge,
    AQE splits residual skew).
    """
    keyed = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt"),
        key.alias("block_key"),
    ).filter(F.col("block_key").isNotNull() & (F.col("block_key") != ""))
    if salt_above is not None:
        keyed = salt_hot_keys(keyed, "block_key", salt_above, n_salts)
    if max_block_rows is not None:
        w = Window.partitionBy("block_key").orderBy("id")
        keyed = (keyed.withColumn("_rk", F.row_number().over(w))
                 .filter(F.col("_rk") <= max_block_rows).drop("_rk"))
    keyed = cache_registered(keyed)  # feeds both sides of the self-join
    a = keyed.select(F.col("id").alias("left_id"),
                     F.col("txt").alias("left_text"), "block_key")
    b = keyed.select(F.col("id").alias("right_id"),
                     F.col("txt").alias("right_text"),
                     F.col("block_key").alias("bk2"))
    return (
        a.join(b, (F.col("block_key") == F.col("bk2"))
               & (F.col("left_id") < F.col("right_id")))
        .drop("bk2")
    )


def salt_hot_keys(
    df: DataFrame,
    key_col: str = "block_key",
    max_rows_per_key: int = 1000,
    n_salts: int = 16,
    id_col: str = "id",
) -> DataFrame:
    """Rewrite hot blocking keys as `key#salt` so no single join group
    exceeds ~max_rows_per_key rows.

    Real-world blocking keys are Zipfian (SURVEY.md §7 'hard parts'); a
    hot key makes the self-join O(b^2) on one task. Salting splits a hot
    block into n_salts sub-blocks (pairing then happens within sub-blocks
    only — a recall-bounded tradeoff vs key_blocking's deterministic row
    cap, which drops rows outright). Hot keys are found with one cheap
    aggregate and broadcast back; salt assignment is the portable hash of
    the row id, so results are partition-independent. AQE skew-join
    splitting still backs this up at runtime for residual skew.
    """
    hot = (
        df.groupBy(key_col).agg(F.count("*").alias("_c"))
        .filter(F.col("_c") > max_rows_per_key)
        .select(key_col, "_c")
    )
    out = df.join(F.broadcast(hot), key_col, "left")
    salt = porthash(F.col(id_col).cast("string")) % n_salts
    return out.withColumn(
        key_col,
        F.when(F.col("_c").isNotNull(),
               F.concat_ws("#", F.col(key_col), salt.cast("string")))
        .otherwise(F.col(key_col)),
    ).drop("_c")


# ---------------------------------------------------------------------------
# J3b: sorted-neighborhood (distributed rank, no global single-partition sort)
# ---------------------------------------------------------------------------

def global_rank(df: DataFrame, key: Column, id_col: str = "doc_id",
                n_parts: int = 0) -> DataFrame:
    """Add a dense global rank ``rn`` ordered by ``(key, id)`` without a
    global single-partition window: range-partition, sort within
    partition, number rows with ``monotonically_increasing_id`` (its
    layout is partition_index * 2^33 + row-offset-in-iteration-order, so
    after the in-partition sort it IS the per-partition rank — round 7:
    the previous ``row_number() over (partition by spark_partition_id)``
    forced a SECOND full exchange of the corpus on _pid plus a window,
    because Catalyst cannot know each physical partition holds exactly
    one _pid value), then add broadcast per-partition offsets
    (DataFrame-native zipWithIndex). Deterministic because the order key
    is total."""
    if not n_parts:
        # scale-adaptive partition count (guide: derive from input size,
        # not a constant): ~64 MB of input per range partition, capped
        # at the session's shuffle parallelism. A corpus-sized input
        # keeps the full configured parallelism; a small one avoids
        # paying range-boundary sampling + per-partition bookkeeping
        # over dozens of near-empty partitions. Plan-statistics probe
        # only — no job.
        conf_parts = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
        try:
            est = int(str(df._jdf.queryExecution().optimizedPlan()
                          .stats().sizeInBytes()))
        except Exception:
            est = None
        if est is None or est <= 0:
            n_parts = conf_parts
        else:
            n_parts = max(1, min(conf_parts,
                                 -(-est // (64 * 1024 * 1024))))
    parted = (
        df.withColumn("_k", key)
        .repartitionByRange(int(n_parts), F.col("_k"), F.col(id_col))
        .sortWithinPartitions(F.col("_k"), F.col(id_col))
    )
    # cache BEFORE branching into (ranked, counts): repartitionByRange
    # samples to pick boundaries, and a re-executed exchange (AQE may not
    # reuse it) can sample DIFFERENT boundaries — offsets keyed on _pid
    # would then disagree with the main branch and produce duplicate or
    # missing ranks (observed at sf0.1). monotonically_increasing_id is
    # non-deterministic-tagged, so the optimizer cannot reorder it past
    # the sort; the cache freezes its values for both consumers.
    mid = F.monotonically_increasing_id()
    ranked = cache_registered(
        parted.withColumn("_mid", mid)
        .withColumn("_pid", F.shiftright(F.col("_mid"), 33).cast("int"))
        .withColumn("_rn_in",
                    (F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
                     + F.lit(1)))
        .drop("_mid"))
    if int(n_parts) == 1:
        # single partition: the in-partition row number IS the global
        # rank — skip the range-sampling and counts-collect jobs
        return ranked.withColumn("rn", F.col("_rn_in")).drop(
            "_pid", "_rn_in")
    # per-partition offsets: the counts frame has exactly n_parts rows, so
    # the prefix sum is driver-side metadata (a bounded collect), not a
    # single-partition window over data
    counts = ranked.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    off, offs = 0, {}
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offs[row["_pid"]] = off
        off += row["_cnt"]
    spark = df.sparkSession
    offsets = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offs.items()], "_pid int, _off long")
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn("rn", F.col("_off") + F.col("_rn_in"))
        .drop("_pid", "_rn_in", "_off")
    )


def attach_texts(pairs: DataFrame, docs: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Join left_text/right_text onto id-only candidate pairs.

    Blocking passes pair on IDS ONLY and texts are attached once, after
    cross-pass dedup — shuffling wide serialized-entity strings through
    every bucket join / dedup costs ~10x the bytes of the id columns and
    measured 6x slower at high parallelism (the texts relation also fell
    under the broadcast threshold and was broadcast-built per join)."""
    texts = docs.select(F.col(id_col).alias("_tid"),
                        F.col(text_col).alias("_ttxt"))
    out = (
        pairs.join(texts.withColumnRenamed("_tid", "left_id")
                   .withColumnRenamed("_ttxt", "left_text"), "left_id")
        .join(texts.withColumnRenamed("_tid", "right_id")
              .withColumnRenamed("_ttxt", "right_text"), "right_id")
    )
    cols = ["left_id", "right_id", "left_text", "right_text"]
    extra = [c for c in pairs.columns if c not in ("left_id", "right_id")]
    return out.select(*cols, *extra)


def sorted_neighborhood(
    df: DataFrame,
    key: Column,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_texts: bool = True,
) -> DataFrame:
    """Pair each row with its ``window`` successors in global key order.

    Generalizes the reference's substring-containment heuristic
    (csv_to_matching_format.py:71-74) into the classic sorted-neighborhood
    pass. The neighbor match is an equi-join: each row exposes target
    ranks rn+1..rn+window via a tiny explode, so Catalyst plans a shuffle
    hash join on rank — no range-join, no global window. The rank fanout
    and join carry ids only; texts attach at the end (with_texts=False for
    multi-pass flows that attach once after union dedup).
    """
    ranked = global_rank(df.select(id_col, text_col), key, id_col=id_col
                         ).select(F.col(id_col).alias("id"),
                                  "rn", F.col("_k").alias("block_key")
                                  )
    ranked = cache_registered(ranked)  # probe + target sides
    probes = ranked.select(
        F.col("id").alias("left_id"),
        F.col("block_key"),
        F.explode(F.sequence(F.col("rn") + 1, F.col("rn") + window)
                  ).alias("target_rn"),
    )
    targets = ranked.select(F.col("id").alias("right_id"),
                            F.col("rn").alias("target_rn"))
    pairs = probes.join(targets, "target_rn").drop("target_rn")
    # normalize orientation so multi-pass union dedupes
    pairs = pairs.select(
        F.least("left_id", "right_id").alias("left_id"),
        F.greatest("left_id", "right_id").alias("right_id"),
        "block_key",
    )
    if not with_texts:
        return pairs
    return attach_texts(pairs, df, id_col, text_col)


# ---------------------------------------------------------------------------
# J4: MinHash-LSH over token shingles (portable hash family)
# ---------------------------------------------------------------------------

def tokenize(col: Column, drop_markers: bool = False) -> Column:
    """Lowercase word tokens. Mirrors the reference's whitespace-token
    view (summarize.py:70-75). drop_markers=True removes the COL/VAL
    scaffolding tokens — REQUIRED for similarity blocking over serialized
    entities: marker tokens appear in every document, so shingles built
    over them ('col name val', 'name val …') are near-universal and
    collapse MinHash bands into one global bucket (measured: 65
    candidates/doc at 100k docs with markers vs ~5 without)."""
    toks = F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != F.lit("")
    )
    if drop_markers:
        toks = F.filter(toks, lambda t: (t != "col") & (t != "val"))
    return toks


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings; docs shorter than n yield the
    whole-token join (so short docs still block)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        )
    )


MERSENNE31 = 2_147_483_647


def _mh_params(n_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic universal-hash coefficients (a odd, a/b < p)."""
    import hashlib

    a, b = [], []
    for i in range(n_hashes):
        h = int(hashlib.md5(f"mh{i}".encode()).hexdigest()[:15], 16)
        a.append((h % (MERSENNE31 - 2)) | 1)
        b.append((h >> 30) % MERSENNE31)
    return a, b


def shingle_base_hashes(sh: Column) -> Column:
    """One portable hash per shingle, reduced mod 2^31-1 — the shared
    base for all MinHash permutations. Materialize this as its own column
    so the md5 pass runs once per row."""
    return F.transform(sh, lambda s: porthash(s) % MERSENNE31)


def minhash_signature(base_hashes: Column, n_hashes: int = 16) -> Column:
    """MinHash signature via a universal hash family over precomputed
    base hashes:  h_i(x) = (a_i * x + b_i) mod p,  p = 2^31-1.

    Each permutation is two integer ops per shingle (vs n_hashes md5
    passes); a_i * x < 2^62 so ANSI arithmetic never overflows."""
    a_c, b_c = _mh_params(n_hashes)
    a_arr = F.array(*[F.lit(x).cast("long") for x in a_c])
    b_arr = F.array(*[F.lit(x).cast("long") for x in b_c])
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                base_hashes,
                lambda h: (F.element_at(a_arr, i + 1) * h
                           + F.element_at(b_arr, i + 1)) % MERSENNE31,
            )
        ),
    )


def minhash_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    drop_marker_tokens: bool = True,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """(id, band_key) — one row per LSH band per doc, computed entirely
    inside whole-stage codegen (no interpreted higher-order lambdas,
    which cost ~10-100x on this hot path):

      posexplode tokens -> hash -> window lead() to combine each
      shingle's token hashes polynomially -> one groupBy(id) with
      n_hashes min() aggregates (the MinHash signature) -> band keys.

    The window and the aggregate share hashpartitioning(id): ONE shuffle
    of (id, pos, hash) longs for the whole signature computation.
    Duplicate shingles need no dedupe — they cannot change a min.

    token_hash: 'xxhash64' (default, fastest — one JVM hash) or
    'portable' (md5-derived porthash, reproducible by an external SQL
    engine; band keys are then the raw signature concat, not an xxhash
    compaction). Use 'portable' when blocking output must be verified
    against a DuckDB oracle; the candidate SETS differ between the two
    hashes, the statistics do not.
    """
    a_c, b_c = _mh_params(n_hashes)
    rows = n_hashes // bands
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokenize(F.col(text_col),
                              drop_markers=drop_marker_tokens)
                     ).alias("pos", "tok"),
    )
    if token_hash == "portable":
        from ditto_spark.operators.hashing import porthash

        toks = toks.withColumn("h", porthash(F.col("tok"))
                               % F.lit(MERSENNE31))
    else:
        toks = toks.withColumn("h", F.pmod(F.xxhash64("tok"),
                                           F.lit(MERSENNE31)))
    w = Window.partitionBy("id").orderBy("pos")
    shingled = toks
    for j in range(1, shingle_n):
        shingled = shingled.withColumn(f"_l{j}", F.lead("h", j).over(w))
    sh = F.col("h")
    for j in range(1, shingle_n):
        sh = F.pmod(sh * F.lit(1_000_003)
                    + F.coalesce(F.col(f"_l{j}"), F.lit(0)),
                    F.lit(MERSENNE31))
    shingled = shingled.withColumn("sh", sh)
    if shingle_n > 1:
        # complete shingles only; pos==0 kept so short docs still block
        shingled = shingled.filter(
            F.col(f"_l{shingle_n - 1}").isNotNull() | (F.col("pos") == 0)
        )
    aggs = [
        F.min((F.lit(a_c[i]) * F.col("sh") + F.lit(b_c[i])) % MERSENNE31
              ).alias(f"_h{i}")
        for i in range(n_hashes)
    ]
    sig = shingled.groupBy("id").agg(*aggs)
    if token_hash == "portable":
        # raw signature string as the band key — longer than the xxhash
        # compaction but engine-portable
        bkeys = F.array(*[
            F.concat_ws(
                "_", F.lit(str(b)),
                F.concat_ws(
                    ",", *[F.col(f"_h{b * rows + r}") for r in range(rows)]),
            )
            for b in range(bands)
        ])
    else:
        bkeys = F.array(*[
            F.concat_ws(
                "_", F.lit(str(b)),
                F.xxhash64(F.concat_ws(
                    ",", *[F.col(f"_h{b * rows + r}") for r in range(rows)])),
            )
            for b in range(bands)
        ])
    return sig.select("id", F.explode(bkeys).alias("block_key"))


def minhash_lsh_blocking(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_rows: int | None = 200,
    drop_marker_tokens: bool = True,
    with_texts: bool = True,
    token_hash: str = "xxhash64",
    dedup_pairs: bool = True,
) -> DataFrame:
    """Candidate pairs whose MinHash signatures collide in >=1 band.

    Spark plan: codegen'd signature + band keys (minhash_band_buckets)
    -> join texts back on id -> bucket self-join (equi-join on band key)
    -> dropDuplicates. Bucket size capped like key_blocking to bound the
    quadratic worst case; at 100TB the bucket join shuffles once on the
    band key and AQE handles stragglers and skew.

    drop_marker_tokens=True is the serialized-entity default (COL/VAL
    scaffolding must not enter the signatures); pass False for raw-text
    corpora where 'col'/'val' are legitimate content words.

    ``dedup_pairs=False`` skips the per-pass dropDuplicates (one
    exchange + aggregate over the pair stream): for callers that feed
    ``union_candidates``, whose groupBy(left_id, right_id) dedupes the
    union anyway, the per-pass dedup is a second aggregation on the
    same keys (round 7). Pairs sharing k bands then appear k times and
    block_key becomes the min over ALL shared band keys (the per-pass
    dedup kept an arbitrary one), which downstream min-aggregation
    makes deterministic.
    """
    keys = minhash_band_buckets(df, id_col, text_col, n_hashes, bands,
                                shingle_n, drop_marker_tokens, token_hash)
    if max_bucket_rows is not None:
        w = Window.partitionBy("block_key").orderBy("id")
        keys = (keys.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= max_bucket_rows).drop("_rk"))
    # the (id, band_key) table feeds both sides of the self-join: cache it
    # so the signature computation runs once, not twice. Ids only — texts
    # attach after dedup (see attach_texts).
    buckets = cache_registered(keys)
    a = buckets.select(F.col("id").alias("left_id"), "block_key")
    b = buckets.select(F.col("id").alias("right_id"),
                       F.col("block_key").alias("bk2"))
    pairs = (
        a.join(b, (F.col("block_key") == F.col("bk2"))
               & (F.col("left_id") < F.col("right_id")))
        .drop("bk2")
    )
    if dedup_pairs:
        pairs = pairs.dropDuplicates(["left_id", "right_id"])
    if not with_texts:
        return pairs
    return attach_texts(pairs, df, id_col, text_col)


# ---------------------------------------------------------------------------
# multi-pass union
# ---------------------------------------------------------------------------

def union_candidates(*passes: DataFrame) -> DataFrame:
    """Union blocking passes and dedupe pairs; keeps the first pass's
    block_key per pair (deterministic via min). Works on id-only passes
    (with_texts=False) or text-carrying ones; output carries texts only
    when every pass does."""
    with_texts = all("left_text" in p.columns for p in passes)
    cols = (["left_id", "right_id", "left_text", "right_text", "block_key"]
            if with_texts else ["left_id", "right_id", "block_key"])
    out = passes[0].select(*cols)
    for p in passes[1:]:
        out = out.unionByName(p.select(*cols))
    aggs = [F.min("block_key").alias("block_key")]
    if with_texts:
        aggs += [F.first("left_text", ignorenulls=True).alias("left_text"),
                 F.first("right_text", ignorenulls=True).alias("right_text")]
    return (
        out.groupBy("left_id", "right_id")
        .agg(*aggs)
        .select(*cols)
    )


def blocking_quality(
    candidates: DataFrame,
    truth: DataFrame,
    corpus: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Standard blocker evaluation: one row with **pair completeness**
    (the fraction of ground-truth duplicate pairs the blocker retained —
    the recall a downstream matcher can never exceed) and **reduction
    ratio** (the fraction of the n·(n-1)/2 all-pairs comparison space
    the blocker pruned). The two numbers a user tuning bands/window/caps
    trades against each other; the reference exposes the same dial only
    implicitly via the blocker's k/threshold (blocking/blocker.py:96-99)
    and never measures it.

    ``candidates``/``truth`` are pair frames (any orientation or
    duplication — pairs are canonicalized and deduped here);
    ``corpus`` is the blocked table (row count sets the all-pairs
    denominator). Fully declarative: three bounded single-row
    aggregates crossJoined — no driver-side collect, scales to any
    corpus the inputs scale to.
    """
    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(left_col), F.col(right_col)).alias("l"),
            F.greatest(F.col(left_col), F.col(right_col)).alias("r"),
        ).distinct()

    # each canonical set feeds TWO consumers (its count and the hit
    # join); registry-cached so the upstream blocking/truth DAG — the
    # expensive part — executes once, released with the other operator
    # caches (cachereg scoping)
    c = cache_registered(canon(candidates))
    t = cache_registered(canon(truth))
    hits = t.join(c, ["l", "r"], "left_semi")
    allp = (F.col("n_docs").cast("double")
            * (F.col("n_docs") - 1).cast("double") / 2.0)
    return (
        t.agg(F.count("*").alias("n_truth"))
        .crossJoin(hits.agg(F.count("*").alias("n_hit")))
        .crossJoin(c.agg(F.count("*").alias("n_candidates")))
        .crossJoin(corpus.agg(F.count("*").alias("n_docs")))
        .select(
            "n_docs", "n_candidates", "n_truth", "n_hit",
            F.round(F.col("n_hit")
                    / F.greatest(F.col("n_truth"), F.lit(1)).cast("double"),
                    6).alias("pair_completeness"),
            # n_docs < 2 => empty comparison space: a blocker that
            # emitted nothing pruned nothing, so report 0.0 (ADVICE r5
            # — the unguarded n·(n-1)/2 denominator was 0 here and the
            # metric came back null/NaN instead of a defined value)
            F.when(F.col("n_docs") >= 2,
                   F.round(1.0 - F.col("n_candidates") / allp, 6))
            .otherwise(F.lit(0.0)).alias("reduction_ratio"),
        )
    )


def lsh_tuning_curve(
    ser: DataFrame,
    truth: DataFrame,
    corpus: DataFrame,
    band_configs: list[int],
    n_hashes: int = 24,
    shingle_n: int = 3,
    max_bucket_rows: int = 200,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """The MinHash-LSH s-curve, measured: one ``blocking_quality`` row
    per banding of the same ``n_hashes``-permutation signature. With r
    rows per band a true pair of Jaccard s becomes a candidate with
    P = 1-(1-s^r)^b (MMDS ch.3) — more bands / fewer rows buys recall
    with candidate volume. This turns that theory into the two measured
    numbers a user actually trades (pair completeness vs reduction
    ratio) on THEIR corpus. The config loop is driver-side over a
    handful of literals — the per-config work is fully distributed and
    the signature shuffle shape is identical across configs."""
    # truth feeds every config's quality row — cache it once here so
    # the sweep pays the (expensive) truth DAG a single time instead of
    # once per banding
    truth = cache_registered(truth)
    out = None
    for bands in band_configs:
        mh = minhash_lsh_blocking(
            ser, n_hashes=n_hashes, bands=bands, shingle_n=shingle_n,
            max_bucket_rows=max_bucket_rows, with_texts=False,
            token_hash=token_hash)
        q = blocking_quality(mh, truth, corpus).select(
            F.lit(bands).alias("bands"),
            F.lit(n_hashes // bands).alias("rows_per_band"),
            "n_docs", "n_candidates", "n_truth", "n_hit",
            "pair_completeness", "reduction_ratio")
        out = q if out is None else out.unionByName(q)
    return out.orderBy("bands")


def choose_banding(curve: DataFrame, target_completeness: float) -> dict:
    """Pick the cheapest banding meeting a completeness target from an
    ``lsh_tuning_curve`` result: fewest candidates among configs with
    pair_completeness >= target, else the highest-completeness config
    (ties -> fewer candidates). Driver-side over the handful of swept
    configs (bounded by the config list, never by the corpus)."""
    rows = [r.asDict() for r in curve.collect()]
    ok = [r for r in rows if r["pair_completeness"]
          >= target_completeness]
    if ok:
        return min(ok, key=lambda r: r["n_candidates"])
    return max(rows, key=lambda r: (r["pair_completeness"],
                                    -r["n_candidates"]))
