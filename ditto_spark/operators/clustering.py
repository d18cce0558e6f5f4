"""Transitive clustering: connected components over match edges.

The reference emits independent pairwise decisions and stops
(matcher.py:156-160); the north_star adds transitive clustering into
entity ids. GraphFrames is not available here, so this is the
alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) implemented as
pure DataFrame joins:

  large-star: for each node, link every LARGER neighbor to the minimum
              of the neighborhood (including self);
  small-star: link every smaller-or-equal neighbor to the minimum.

Each iteration is two groupBy/aggregate + join rounds; convergence in
O(log n) iterations. ``localCheckpoint`` truncates the lineage each
round (mandatory for iterative Spark plans). Labels are the component's
minimum doc_id — deterministic, reproducible across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set, canonical (min, max) orientation, no loops."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    bidir = edges.union(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
    nbr_min = bidir.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        bidir.join(nbr_min, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient toward larger: src > dst
    pointed = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    )
    nbr_min = pointed.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m"))
    linked = (
        pointed.join(nbr_min, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_link = nbr_min.select(F.col("src"), F.col("m").alias("dst"))
    return linked.union(self_link).filter(
        F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame, max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges(src, dst) -> (doc_id, entity_id) with entity_id = the
    component's minimum node id. Nodes appearing only as singletons must
    be handled by the caller (outer-join docs afterwards).

    Lineage truncation per round: ``localCheckpoint`` by default —
    executor-local block storage, fastest, fine single-JVM — but blocks
    are LOST on executor death, which at cluster scale kills a long CC
    job late in its run. Pass ``checkpoint_dir`` (HDFS/S3 path) for
    RELIABLE checkpointing via ``sparkContext.setCheckpointDir`` +
    ``.checkpoint()``: each round's edge set is written to the reliable
    store so recovery replays from the last round, not from raw edges."""
    from ditto_spark.operators.hashing import porthash

    cleanup_dir = None
    if checkpoint_dir is not None:
        import uuid

        spark = edges.sparkSession
        sc = spark.sparkContext
        # scope this run's files under a unique subdir: up to max_iter
        # rounds each write a full edge-set copy and Spark does not
        # clean reliable checkpoints by default
        # (spark.cleaner.referenceTracking.cleanCheckpoints=false) — at
        # design scale that is a multi-TB leak; the subdir is deleted
        # in the finally block once labels derive from the last round's
        # materialized frame
        cleanup_dir = f"{checkpoint_dir.rstrip('/')}/cc-{uuid.uuid4().hex}"
        sc.setCheckpointDir(cleanup_dir)

        def _truncate(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def _truncate(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    def _fingerprint(e: DataFrame) -> tuple:
        """(count, hash-sum) of the edge set — one cheap agg instead of
        union/subtract/intersect set algebra per iteration. Callers pass
        an already-canonical, already-distinct edge set (_canon output or
        _small_star output, whose rows all satisfy src > dst pre-least/
        greatest and are distinct) so no extra shuffle is spent here."""
        row = e.agg(
            F.count("*").alias("n"),
            # mod keeps the sum far from int64 overflow (ANSI mode) even
            # at billions of edges
            F.sum(porthash(F.concat_ws("|", "src", "dst"))
                  % 1_000_000_007).alias("h"),
        ).first()
        return (row["n"], row["h"])

    # eager localCheckpoint measured faster than lazy here: the lazy
    # variant re-plans the un-materialized frame inside the star joins
    cur = _truncate(_canon(edges))
    prev_fp = _fingerprint(cur)
    for _ in range(max_iter):
        nxt = _truncate(_small_star(_large_star(cur)))
        fp = _fingerprint(nxt)
        cur = nxt
        if fp == prev_fp:
            break
        prev_fp = fp
    # _small_star output is already oriented (src=member > dst=min) and
    # distinct; _canon here is only orientation bookkeeping for the
    # max_iter=0 / immediately-converged path
    comp = _canon(cur)
    members = comp.select(F.col("dst").alias("doc_id"),
                          F.col("src").alias("entity_id")).union(
        comp.select(F.col("src").alias("doc_id"),
                    F.col("src").alias("entity_id")))
    labels = (
        members.groupBy("doc_id")
        .agg(F.min("entity_id").alias("entity_id"))
    )
    if cleanup_dir is not None:
        # materialize the O(nodes) label table, then delete this run's
        # per-round edge copies (the caller should persist labels
        # promptly — the iterations, not the epilogue, were the
        # fault-exposed part the reliable mode protects)
        labels = labels.localCheckpoint(eager=True)
        jvm = sc._jvm
        jsc = sc._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(cleanup_dir)
        path.getFileSystem(jsc).delete(path, True)
    return labels


def assign_entities(docs: DataFrame, matches: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """(docs, positive matches) -> (doc_id, entity_id); unmatched docs
    become singleton entities labeled by their own id."""
    edges = matches.filter(F.col("match") == 1).select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    comp = connected_components(edges)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("entity_id", F.col("doc_id")).alias("entity_id"),
        )
    )
