"""Similarity search over embedding columns (array<float>).

The reference's embedding blocking (blocking/blocker.py:43-80) is an
in-memory numpy matmul with top-k/threshold selection; these operators
re-express it distributed:

  cosine           native dot/norm expression (zip_with + aggregate)
  cosine_topk      brute-force top-k per query (window rank) — exact
                   baseline; one shuffle on query id
  rp_lsh_buckets   random-hyperplane LSH bucket ids (deterministic ±1
                   projections from the portable hash — reproducible in
                   SQL, no stored projection matrix)
  ann_topk_lsh     bucketed approximate top-k: probe joins only its
                   bucket, then exact cosine + rank inside the bucket

Scale design: brute force is O(Q x N) — fine for sampled audits; the LSH
path shuffles once on bucket id and bounds per-bucket fanout, which is
the 100TB-shaped plan (bucket count scales with N, probes hit one
bucket; multi-probe = explode neighbor buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ditto_spark.operators.hashing import porthash


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _cosine_np(qs: pd.Series, ns: pd.Series) -> pd.Series:
    """Vectorized twin of ``cosine`` — BIT-IDENTICAL by construction
    (guide §4.2: hand whole Arrow batches to numpy instead of running
    interpreted HOF lambdas per pair, measured ~10x on the pair-scoring
    stages): elementwise float64 products (same IEEE ops as zip_with's
    cast-and-multiply), then ``np.cumsum`` along the row — a sequential
    left-fold, the exact addition order of the ``aggregate`` expression.
    ``np.sqrt``/division are correctly-rounded IEEE like the JVM's.
    Rounding stays in the JVM (callers wrap in F.round) so Spark's
    HALF_UP semantics are untouched."""
    if len(qs) == 0:
        return pd.Series([], dtype="float64")
    if qs.isna().any() or ns.isna().any():
        # null vector -> null cosine, matching the expression path
        out = pd.Series([None] * len(qs), index=qs.index, dtype="float64")
        mask = ~(qs.isna() | ns.isna())
        if mask.any():
            out[mask] = _cosine_np(qs[mask], ns[mask])
        return out
    A = np.asarray(qs.tolist(), dtype=np.float64)
    B = np.asarray(ns.tolist(), dtype=np.float64)
    dots = np.cumsum(A * B, axis=1)[:, -1]
    na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
    nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
    return pd.Series(dots / (na * nb), index=qs.index)


# DataType instance, not a DDL string: string return types are parsed
# through the active SparkContext, which does not exist at import time
from pyspark.sql.types import DoubleType as _DoubleType

_cosine_batch = F.pandas_udf(_cosine_np, _DoubleType())


def cosine_vec(a: Column, b: Column) -> Column:
    """Arrow-batched ``cosine`` for pair-scoring hot paths. Same value,
    different execution: one numpy pass per batch instead of per-row
    interpreted lambdas. Requires fixed-dimension, non-ragged vectors
    (every embedding source in this engine)."""
    return _cosine_batch(a, b)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self): the distributed
    form of blocker.py:67-72's argpartition. Join fanout Q x N, ranked by
    a window partitioned on the query id (repartition on query id comes
    free from the shuffle)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("nv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_vec(F.col("qv"), F.col("nv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# Projections are bucketed on the sign of an EXACT int64 sum of
# per-element quantized terms floor(v * 2^20): each term is one IEEE
# double multiply + floor (bit-identical on any IEEE engine), and
# integer addition is associative — so the bucket id is reproducible
# across numpy, Spark expressions and SQL oracles regardless of
# summation order. A float-double sum instead leaves a knife-edge: a
# projection within 1 ulp of 0 can flip its sign bit between engines
# that sum in different orders (ADVICE r4). 2^20 keeps |term| ≤ ~2^40
# for |v| ≤ ~2^20, far from int64 overflow at any realistic dim.
RP_QUANT = float(1 << 20)


def _sign(seed: int, dim_idx: Column) -> Column:
    """Deterministic ±1 (as long) from the portable hash of (seed, dim)."""
    return F.when(
        porthash(F.concat(F.lit(f"rp{seed}_"), dim_idx.cast("string")))
        % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1)).cast("long")


def rp_projection(vec: Column, seed: int) -> Column:
    """Signed random-hyperplane projection over the QUANTIZED vector:
    sum_i floor(v[i] * RP_QUANT) * sign(seed, i), exact in int64."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    terms = F.zip_with(
        vec, idx,
        lambda v, i: F.floor(v.cast("double") * F.lit(RP_QUANT))
        * _sign(seed, i))
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


def rp_sign_matrix(n_bits: int, dim: int) -> "np.ndarray":
    """The (dim, n_bits) ±1 projection matrix, computed driver-side
    BIT-IDENTICALLY to the ``_sign`` column expression: porthash is
    md5-prefix, so ``int(md5(f"rp{b}_{i}")[:15], 16) % 2`` reproduces
    the JVM's conv(substring(md5(...)))."""
    import hashlib

    s = np.empty((dim, n_bits), dtype=np.int64)
    for b in range(n_bits):
        for i in range(dim):
            h = int(hashlib.md5(f"rp{b}_{i}".encode()).hexdigest()[:15], 16)
            s[i, b] = 1 if h % 2 == 0 else -1
    return s


def rp_lsh_buckets(emb: DataFrame, n_bits: int = 8,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   dim: int | None = None) -> DataFrame:
    """(id, bucket int) — bucket = sign bits of n_bits projections.

    ``dim=None`` keeps the pure-expression path: SQL-reproducible (no
    stored projection matrix) but interpreted — every element evaluates
    an md5 porthash inside a HOF lambda, n_bits x dim interpreted ops
    per row. Passing ``dim`` (the embedding dimensionality) switches to
    ONE numpy matmul per Arrow batch against the broadcast ±1 sign
    matrix — the scale path, same family as the IVF assignment fix.
    BIT-IDENTICAL to the expression path and any SQL oracle: both
    quantize each element to floor(v * RP_QUANT) and sum in int64, so
    the sign — hence the bucket — is exact (no float-order knife edge;
    ADVICE r4)."""
    if dim is not None:
        spark = emb.sparkSession
        bc = spark.sparkContext.broadcast(rp_sign_matrix(n_bits, dim))
        powers = np.power(2, np.arange(n_bits), dtype=np.int64)

        @F.pandas_udf("long")
        def buckets(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype="int64")
            v = np.asarray(vs.tolist(), dtype=np.float64)
            q = np.floor(v * RP_QUANT).astype(np.int64)
            proj = q @ bc.value
            return pd.Series(((proj > 0) @ powers).astype("int64"),
                             index=vs.index)

        return emb.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("vec"),
                          buckets(F.col(vec_col)).alias("bucket"))
    bucket = F.lit(0)
    for b in range(n_bits):
        bucket = bucket + F.when(
            rp_projection(F.col(vec_col), b) > 0, F.lit(2 ** b)
        ).otherwise(F.lit(0))
    return emb.select(F.col(id_col).alias("id"),
                      F.col(vec_col).alias("vec"),
                      bucket.alias("bucket"))


def _make_literal_assign(centers: list[list[float]]):
    """Cell assignment as a pure codegen projection: centroids embedded
    as an array-of-arrays LITERAL, distances via interpreted HOF lambdas.
    Right for SMALL cell counts (the expression is O(n_cells x dim) per
    row and interpreted); above IVF_BROADCAST_ASSIGN_MIN_CELLS the numpy
    path wins by ~an order of magnitude."""
    n_cells = len(centers)
    cent_arr = F.array(*[
        F.array(*[F.lit(x) for x in c]) for c in centers
    ])

    def dist2(v, c):
        return F.aggregate(
            F.zip_with(v, c, lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda a, x: a + x)

    def assign(df, n_keep):
        with_d = df.withColumn(
            "_ds", F.transform(cent_arr, lambda c: dist2(F.col("vec"), c)))
        if n_keep == 1:
            # argmin: first index of the minimum (deterministic ties)
            cell = (F.array_position(F.col("_ds"), F.array_min(F.col("_ds")))
                    - 1).cast("int")
            return with_d.select("id", "vec", cell.alias("cell"))
        ranked = F.slice(
            F.array_sort(
                F.zip_with(
                    F.col("_ds"),
                    F.sequence(F.lit(0), F.lit(n_cells - 1)),
                    lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
                )
            ),
            1, n_keep,
        )
        return (with_d.select("id", "vec",
                              F.explode(ranked).alias("_r"))
                .select("id", "vec", F.col("_r.cell").alias("cell")))

    return assign


def _make_numpy_assign(spark, centers: list[list[float]]):
    """Cell assignment as ONE numpy distance block per Arrow batch
    against a BROADCAST centroid matrix — the scale path (VERDICT r3
    #2): per row the work is a BLAS row x matrix product instead of
    n_cells x dim interpreted lambda evaluations. Same plan shape as
    the literal path (a per-row projection, no shuffle); ties break by
    lowest cell index on both paths (np.argsort kind='stable' /
    argmin-first matches array_position-of-min and the struct sort)."""
    cent = np.asarray(centers, dtype=np.float64)          # (C, dim)
    cent_sq = (cent * cent).sum(axis=1)                   # (C,)
    bc = spark.sparkContext.broadcast((cent, cent_sq))

    def assign(df, n_keep):
        @F.pandas_udf("array<int>")
        def topcells(vs: pd.Series) -> pd.Series:
            C, Csq = bc.value
            if len(vs) == 0:
                return pd.Series([], dtype=object)
            V = np.asarray(vs.tolist(), dtype=np.float64)  # (B, dim)
            # squared distance via the expansion ||v||^2 - 2 v.C + ||c||^2;
            # the ||v||^2 term is constant per row, irrelevant to ranking
            d2 = Csq[None, :] - 2.0 * (V @ C.T)
            if n_keep == 1:
                idx = d2.argmin(axis=1).astype("int32")[:, None]
            else:
                idx = np.argsort(d2, axis=1, kind="stable")[
                    :, :n_keep].astype("int32")
            return pd.Series(list(idx))

        out = df.withColumn("_cells", topcells(F.col("vec")))
        if n_keep == 1:
            return out.select(
                "id", "vec",
                F.element_at(F.col("_cells"), 1).alias("cell"))
        return (out.select("id", "vec",
                           F.explode(F.col("_cells")).alias("cell")))

    return assign


# Above this cell count, IVF cell assignment switches from the codegen
# centroid-literal expression to one numpy matmul per Arrow batch
# against a broadcast centroid matrix. The literal path evaluates an
# interpreted higher-order lambda per (row, cell) — measured ~10x
# codegen cost per op in this repo (BENCH.md r1) and ~260k interpreted
# ops/row at the auto-path's 4096-cell cap — while BLAS does the same
# distance block in microseconds.
IVF_BROADCAST_ASSIGN_MIN_CELLS = 256


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int | None = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float = 1.0,
    exclude_self: bool = True,
    broadcast_assign: bool | None = None,
) -> DataFrame:
    """IVF-style ANN: k-means coarse quantizer -> probe the n_probe
    nearest cells -> exact cosine re-rank inside them.
    ``exclude_self=False`` keeps same-id pairs (two-table callers, where
    a left id may legitimately equal a right id).

    Scale shape: centroids are trained once on a sample (pyspark.ml
    KMeans) and shipped to every task (literal expression below
    ``IVF_BROADCAST_ASSIGN_MIN_CELLS`` cells, broadcast numpy matrix
    above — ``broadcast_assign`` forces either); cell assignment is a
    per-row projection with NO shuffle of the corpus by anything but
    cell id; the probe join is an equi-join on cell. Recall grows with
    n_probe (n_probe = n_cells degenerates to brute force).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_cells is None:
        # cells must GROW with the corpus or cells get crowded and the
        # probe join degenerates quadratic: target ~sqrt(n) rows/cell
        # (IVF convention), floor 16; the 4096 cap bounds the broadcast
        # centroid block (4096 x dim doubles — KBs to a few MB)
        n = emb.count()
        n_cells = int(min(max(16, round(n ** 0.5)), 4096))

    train = emb.select(array_to_vector(
        F.col(vec_col).cast("array<double>")).alias("features"))
    if sample_fraction < 1.0:
        train = train.sample(sample_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    if broadcast_assign is None:
        broadcast_assign = n_cells > IVF_BROADCAST_ASSIGN_MIN_CELLS
    if broadcast_assign:
        assign = _make_numpy_assign(emb.sparkSession, centers)
    else:
        assign = _make_literal_assign(centers)

    base = assign(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        1)
    probes = assign(
        queries.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("vec")),
        n_probe)
    cands = (
        probes.select(F.col("id").alias("query_id"),
                      F.col("vec").alias("qv"), "cell")
        .join(base.select(F.col("id").alias("neighbor_id"),
                          F.col("vec").alias("nv"), "cell"), "cell")
    )
    if exclude_self:
        cands = cands.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.withColumn(
        "cosine", F.round(cosine_vec(F.col("qv"), F.col("nv")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dups_lsh(
    emb: DataFrame,
    threshold: float = 0.45,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    multiprobe: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (cosine >= threshold) via RP-LSH bucketing —
    the SCALE path for dedup.embedding_near_dups' brute-force baseline:
    one equi-join on bucket id instead of an all-pairs cross.
    Approximate by construction: only pairs whose sketches land in the
    same bucket (or, with ``multiprobe``, within Hamming distance 1)
    are examined — a near-dup split by >=2 hyperplanes is missed, the
    recall/cost dial being n_bits and probing. Multiprobe emits each
    qualifying pair from up to two probe directions, so pairs are
    canonicalized (left < right) and deduped. Pass ``dim`` for the
    vectorized sign-matrix bucketing (see rp_lsh_buckets)."""
    base = rp_lsh_buckets(emb, n_bits, id_col, vec_col, dim)
    probes = base.select(F.col("id").alias("left_id"),
                         F.col("vec").alias("va"), "bucket")
    if multiprobe:
        variants = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << b))
              for b in range(n_bits)])
        probes = probes.select(
            "left_id", "va", F.explode(variants).alias("bucket"))
    cands = (
        probes.join(base.select(F.col("id").alias("right_id"),
                                F.col("vec").alias("vb"), "bucket"),
                    "bucket")
        .filter(F.col("left_id") < F.col("right_id"))
        .dropDuplicates(["left_id", "right_id"])
    )
    return (
        cands.withColumn("cosine",
                         F.round(cosine_vec(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("left_id", "right_id", "cosine")
    )


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: probes join only their own LSH bucket, exact
    cosine re-rank inside. Recall < 1 by construction; pass
    ``multiprobe=True`` to also probe every Hamming-distance-1 bucket
    (the standard multi-probe LSH recall lever: a near-neighbor that
    landed across ONE hyperplane is recovered without growing the
    index). Cost model at scale: candidate volume grows ~(1 + n_bits)x
    the single-probe volume while the base-side index is UNCHANGED —
    the explode is on the (small) query side only, stays whole-stage
    codegen, and each probe bucket is distinct so the equi-join yields
    no duplicate pairs. Pass ``dim`` to bucket via the vectorized numpy
    projection (scale path; see rp_lsh_buckets)."""
    base = rp_lsh_buckets(emb, n_bits, id_col, vec_col, dim)
    probes = rp_lsh_buckets(queries, n_bits, id_col, vec_col, dim).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qv"), "bucket")
    if multiprobe:
        variants = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << b))
              for b in range(n_bits)])
        probes = probes.select(
            "query_id", "qv", F.explode(variants).alias("bucket"))
    cands = probes.join(
        base.select(F.col("id").alias("neighbor_id"),
                    F.col("vec").alias("nv"), "bucket"),
        "bucket",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.withColumn(
        "cosine", F.round(cosine_vec(F.col("qv"), F.col("nv")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
