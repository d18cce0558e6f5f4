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

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Reliable-checkpoint mode mutates JVM-GLOBAL state
# (sparkContext.setCheckpointDir); two concurrent reliable-mode CC runs
# in one process would redirect each other's .checkpoint() calls into a
# directory the other run deletes on exit. The lock serializes them —
# correctness over concurrency for the rare same-process case (separate
# Spark applications are unaffected; they own their own JVM).
_RELIABLE_CC_LOCK = threading.Lock()


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
    small_graph_threshold: int | None = 1_000_000,
) -> DataFrame:
    """edges(src, dst) -> (doc_id, entity_id) with entity_id = the
    component's minimum node id. Nodes appearing only as singletons must
    be handled by the caller (outer-join docs afterwards).

    Small-graph routing: when the edge set fits under
    ``small_graph_threshold`` (counted on the already-materialized
    canonical edge set — a metadata-cheap job, not a recompute), the
    edges are collected to the driver
    and solved with union-find — identical output contract
    (component-minimum labels), none of the iteration's per-round
    shuffle/checkpoint jobs. The alternating-star iteration on a
    260-edge graph measured 3.6-8.5s at local[32] (5 rounds x several
    jobs x 32 near-empty tasks); union-find solves it in milliseconds.
    This is the same bounded-collect pattern as the blocking auto-route
    (embed.two_table_topk_blocking): the default 1M-edge bound is a few
    tens of MB moved via ONE Arrow transfer (toPandas) plus an O(E α(E))
    pure-python solve — measured 1.8x faster than the distributed
    iteration even at 330k edges on 32 cores, and far below any sane
    driver heap (the dict + lists peak well under 1 GB). A 100-TB run
    whose match graph exceeds the bound takes the distributed path
    automatically. It also makes the per-micro-batch
    LOCALIZED CC in streaming ER (merge_entity_updates — small by
    construction) near-free. Pass ``small_graph_threshold=None`` to
    force the distributed iteration.

    Lineage truncation per round: ``localCheckpoint`` by default —
    executor-local block storage, fastest, fine single-JVM — but blocks
    are LOST on executor death, which at cluster scale kills a long CC
    job late in its run. Pass ``checkpoint_dir`` (HDFS/S3 path) for
    RELIABLE checkpointing via ``sparkContext.setCheckpointDir`` +
    ``.checkpoint()``: each round's edge set is written to the reliable
    store so recovery replays from the last round, not from raw edges.

    Session-state hygiene (``setCheckpointDir`` is JVM-global): the
    session's previous checkpoint dir is saved and RESTORED on exit
    (success or failure), this run's per-round edge copies live under a
    unique subdir deleted in a ``finally`` (Spark never cleans reliable
    checkpoints itself — at design scale an un-deleted run is a multi-TB
    leak), and concurrent reliable-mode runs in one process serialize on
    a module lock so neither can redirect the other's checkpoints into a
    directory that is about to be deleted."""
    if checkpoint_dir is None:
        # materialize the canonical edge set exactly ONCE: every
        # downstream path re-reads it (the size probe, the driver
        # collect, or round 0 of the iteration) — without this the probe
        # and the consumer each re-ran the full upstream edge-generation
        # DAG (measured 2x the whole cluster_cc entry at sf0.1)
        canon = _canon(edges).localCheckpoint(eager=True)
        if small_graph_threshold is not None:
            if canon.count() <= small_graph_threshold:
                return _cc_driver_union_find(canon)
        # canon is already a localCheckpoint: round 0 needs no re-cut
        return _cc_run(canon, max_iter,
                       lambda df: df.localCheckpoint(eager=True),
                       input_truncated=True)

    import uuid

    spark = edges.sparkSession
    sc = spark.sparkContext
    with _RELIABLE_CC_LOCK:
        # save the session's dir (scala Option) for restoration — a
        # caller using .checkpoint() elsewhere must get ITS dir back,
        # not this run's soon-to-be-deleted subdir
        prev_opt = sc._jsc.sc().getCheckpointDir()
        prev_dir = prev_opt.get() if prev_opt.isDefined() else None
        cleanup_dir = f"{checkpoint_dir.rstrip('/')}/cc-{uuid.uuid4().hex}"
        sc.setCheckpointDir(cleanup_dir)
        try:
            # RELIABLE cut of the canonical edge set (ADVICE r4): in
            # reliable mode the single materialization must itself be
            # recoverable — a localCheckpoint here would make executor-
            # local blocks the only source for the size probe and round
            # 0, so one executor loss in that window would strand the
            # job the reliable store exists to protect.
            canon = _canon(edges).checkpoint(eager=True)
            if small_graph_threshold is not None:
                if canon.count() <= small_graph_threshold:
                    # union-find result is driver-local rows —
                    # independent of the about-to-be-deleted subdir
                    return _cc_driver_union_find(canon)
            labels = _cc_run(canon, max_iter,
                             lambda df: df.checkpoint(eager=True),
                             input_truncated=True)
            # materialize the O(nodes) label table BEFORE the finally
            # deletes the per-round edge copies it derives from (the
            # caller should persist labels promptly — the iterations,
            # not the epilogue, were the fault-exposed part the
            # reliable mode protects)
            return labels.localCheckpoint(eager=True)
        finally:
            # restore first, then delete this run's subdir — always, so
            # a mid-iteration failure cannot leak the per-round copies
            _restore_checkpoint_dir(sc, prev_dir)
            jvm = sc._jvm
            hconf = sc._jsc.hadoopConfiguration()
            path = jvm.org.apache.hadoop.fs.Path(cleanup_dir)
            path.getFileSystem(hconf).delete(path, True)


def _cc_driver_union_find(canon_edges: DataFrame) -> DataFrame:
    """Exact CC for a BOUNDED edge set: collect, union-find with
    min-root union + path compression, return (doc_id, entity_id =
    component minimum) — the identical contract as the distributed
    iteration. Rooting every union at the smaller id makes find(x) the
    component minimum directly."""
    from pyspark.sql.types import StructField, StructType

    spark = canon_edges.sparkSession
    id_type = canon_edges.schema["src"].dataType
    schema = StructType([StructField("doc_id", id_type, False),
                         StructField("entity_id", id_type, False)])
    # Arrow transfer (toPandas), not Row-object collect(): at the
    # routing bound the edge set is a few hundred thousand rows, and
    # row-at-a-time pickling dominated the whole union-find route
    # (measured ~2s of a 5.5s route at 330k edges; Arrow moves the
    # same columns in tens of ms)
    pdf = canon_edges.toPandas()
    src_list = pdf["src"].tolist()
    dst_list = pdf["dst"].tolist()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(src_list, dst_list):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = set(src_list) | set(dst_list)
    # Arrow return path (symmetric with the Arrow ingest): building the
    # label table from a pandas frame moves the columns in one Arrow
    # transfer; the previous row-list createDataFrame pickled up to 2M
    # tuples back through py4j at the 1M-edge routing bound.
    import pandas as pd

    labels = pd.DataFrame({"doc_id": list(nodes)})
    labels["entity_id"] = labels["doc_id"].map(find)
    return spark.createDataFrame(labels, schema)


def _restore_checkpoint_dir(sc, prev_dir: str | None) -> None:
    """Put the session's checkpoint dir back EXACTLY as found.

    The public ``setCheckpointDir`` resolves its argument to a fresh
    UUID subdirectory on every call, so round-tripping through it would
    leave the session pointing one level below where it started (still
    inside the caller's tree, but not bit-identical — and a test can't
    assert it). Setting the scala ``checkpointDir`` var directly
    restores the exact saved value; ``private[spark]`` compiles to a
    public accessor, but fall back to the setter if the JVM refuses."""
    try:
        opt = sc._jvm.scala.Option.apply(prev_dir)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(opt)
    except Exception:  # pragma: no cover - accessor unavailable
        # setCheckpointDir(None) unsets (it wraps the arg in Option)
        sc._jsc.sc().setCheckpointDir(prev_dir)


def _cc_run(edges: DataFrame, max_iter: int, _truncate,
            input_truncated: bool = False) -> DataFrame:
    """The alternating-star iteration itself; ``_truncate`` is the
    per-round lineage cut (local or reliable checkpoint). ``edges`` must
    already be canonical (_canon output) — connected_components
    canonicalizes exactly once. ``input_truncated=True`` skips the
    round-0 cut when the input is already materialized with the SAME
    durability class the iteration uses (localCheckpoint in local mode,
    reliable .checkpoint in reliable mode — so recovery never replays
    raw edge generation either way)."""
    from ditto_spark.operators.hashing import porthash

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
    cur = edges if input_truncated else _truncate(edges)
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
    return (
        members.groupBy("doc_id")
        .agg(F.min("entity_id").alias("entity_id"))
    )


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
