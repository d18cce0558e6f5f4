"""Incremental entity maintenance (VERDICT r3 #4): streaming N batches
must yield the SAME entity labels as the batch pipeline over the same
corpus with the same (band-bucket) candidate generation — plus localized
merge semantics and retry idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F


def _batch_oracle_labels(spark, docs):
    """The batch engine over the full corpus: same MinHash band-bucket
    candidates (uncapped, like the incremental index join), same
    surrogate scorer, global CC."""
    from ditto_spark.operators.blocking import (attach_texts,
                                                minhash_lsh_blocking)
    from ditto_spark.operators.clustering import assign_entities
    from ditto_spark.operators.scoring import score_pairs
    from ditto_spark.operators.serialize import serialize_spans

    ser = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        serialize_spans(F.col("spans"), drop_empty=True).alias("text"))
    pairs = minhash_lsh_blocking(ser, n_hashes=24, bands=6, shingle_n=3,
                                 max_bucket_rows=None, with_texts=False)
    scored = score_pairs(attach_texts(pairs, ser), 0.5)
    ents = assign_entities(ser.select("doc_id"), scored)
    return {r["doc_id"]: r["entity_id"] for r in ents.collect()}


def test_streamed_labels_equal_batch_pipeline(spark, tmp_path):
    """Stream the corpus in 3 micro-batches; resolved labels == the
    batch pipeline's labels on the same corpus."""
    from ditto_spark.schema import DOC_SCHEMA
    from ditto_spark.streaming.incremental_er import (incremental_entities,
                                                      read_entity_labels)
    from ditto_spark.synth import docs_df

    docs = docs_df(spark, n_entities=20, seed=13)
    rows = docs.collect()
    assert len(rows) > 20  # dup structure present
    src = str(tmp_path / "in")
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = [(r.doc_id,
                  [(s.kind, s.text, s.media_ref, s.offset)
                   for s in r.spans])
                 for r in rows[i * third:(i + 1) * third]]
        (spark.createDataFrame(chunk, DOC_SCHEMA).coalesce(1)
         .write.mode("append").parquet(src))

    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    wd, ck = str(tmp_path / "work"), str(tmp_path / "ck")
    incremental_entities(spark, stream, wd, ck)

    # more than one micro-batch actually ran
    import os
    batches = os.listdir(f"{wd}/labels")
    assert len(batches) >= 3, batches

    got = {r["doc_id"]: r["entity_id"]
           for r in read_entity_labels(spark, f"{wd}/labels").collect()}
    want = _batch_oracle_labels(spark, docs)
    assert got == want

    # retry drain with the same checkpoint: labels unchanged (no new
    # files -> no-op; the per-batch overwrites are idempotent anyway)
    stream2 = (spark.readStream.schema(DOC_SCHEMA)
               .option("maxFilesPerTrigger", 1).parquet(src))
    incremental_entities(spark, stream2, wd, ck)
    got2 = {r["doc_id"]: r["entity_id"]
            for r in read_entity_labels(spark, f"{wd}/labels").collect()}
    assert got2 == got


def test_merge_entity_updates_localized(spark):
    """The merge relabels ONLY touched components; disjoint entities
    keep their labels out of the update set entirely."""
    from ditto_spark.streaming.incremental_er import merge_entity_updates

    labels = spark.createDataFrame(
        [("a", "a"), ("b", "a"),      # entity a = {a, b}
         ("x", "x"), ("y", "x"),      # entity x = {x, y}
         ("q", "q")],                 # singleton q
        "doc_id string, entity_id string")
    # new doc 'c' matches 'b' -> joins entity a; new doc 'n' matches
    # nothing
    edges = spark.createDataFrame([("c", "b")], "src string, dst string")
    new_docs = spark.createDataFrame([("c",), ("n",)], "doc_id string")
    upd = {r["doc_id"]: r["entity_id"]
           for r in merge_entity_updates(labels, edges, new_docs).collect()}
    assert upd == {"a": "a", "b": "a", "c": "a", "n": "n"}
    # x, y, q untouched -> absent from the update set (merge-on-read
    # keeps their old labels)
    assert "x" not in upd and "q" not in upd


def test_merge_entity_updates_bridges_two_entities(spark):
    """A new edge bridging two existing entities merges them under the
    global minimum label — the min-label contract holds inductively."""
    from ditto_spark.streaming.incremental_er import merge_entity_updates

    labels = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("m", "m"), ("z", "m")],
        "doc_id string, entity_id string")
    edges = spark.createDataFrame([("b", "z")], "src string, dst string")
    upd = {r["doc_id"]: r["entity_id"]
           for r in merge_entity_updates(labels, edges).collect()}
    assert upd == {"a": "a", "b": "a", "m": "a", "z": "a"}


def test_compact_entity_labels(spark, tmp_path):
    """Compaction folds the update history into one partition with
    identical resolved labels, and resolve-after-compact still works."""
    from ditto_spark.streaming.incremental_er import (compact_entity_labels,
                                                      read_entity_labels)

    lp = str(tmp_path / "labels")
    # batch 0: a->a, b->b ; batch 1: b->a (merge), c->c ; batch 2: d->d
    spark.createDataFrame([("a", "a"), ("b", "b")],
                          "doc_id string, entity_id string"
                          ).write.parquet(f"{lp}/batch=0")
    spark.createDataFrame([("b", "a"), ("c", "c")],
                          "doc_id string, entity_id string"
                          ).write.parquet(f"{lp}/batch=1")
    spark.createDataFrame([("d", "d")],
                          "doc_id string, entity_id string"
                          ).write.parquet(f"{lp}/batch=2")
    want = {r["doc_id"]: r["entity_id"]
            for r in read_entity_labels(spark, lp).collect()}
    assert want == {"a": "a", "b": "a", "c": "c", "d": "d"}
    dropped = compact_entity_labels(spark, lp)
    assert dropped == 2
    import os
    assert sorted(p for p in os.listdir(lp)
                  if p.startswith("batch=")) == ["batch=2"]
    got = {r["doc_id"]: r["entity_id"]
           for r in read_entity_labels(spark, lp).collect()}
    assert got == want
    # compacting an already-compact table is a no-op
    assert compact_entity_labels(spark, lp) == 0
    # empty dir: graceful 0
    assert compact_entity_labels(spark, str(tmp_path / "nope")) == 0


def test_streamed_labels_with_inline_compaction(spark, tmp_path):
    """compact_every folds label history mid-stream without changing
    the resolved labels (still equal to the batch pipeline), and the
    final history is bounded by the compaction cadence."""
    import os

    from ditto_spark.schema import DOC_SCHEMA
    from ditto_spark.streaming.incremental_er import (incremental_entities,
                                                      read_entity_labels)
    from ditto_spark.synth import docs_df

    docs = docs_df(spark, n_entities=15, seed=29)
    rows = docs.collect()
    src = str(tmp_path / "in")
    fifth = (len(rows) + 4) // 5
    for i in range(5):
        chunk = [(r.doc_id,
                  [(s.kind, s.text, s.media_ref, s.offset)
                   for s in r.spans])
                 for r in rows[i * fifth:(i + 1) * fifth]]
        if not chunk:
            continue
        (spark.createDataFrame(chunk, DOC_SCHEMA).coalesce(1)
         .write.mode("append").parquet(src))

    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    wd, ck = str(tmp_path / "work"), str(tmp_path / "ck")
    progress = incremental_entities(spark, stream, wd, ck, compact_every=2)
    assert progress, "recentProgress surfaced for latency diagnostics"

    got = {r["doc_id"]: r["entity_id"]
           for r in read_entity_labels(spark, f"{wd}/labels").collect()}
    want = _batch_oracle_labels(spark, docs)
    assert got == want
    # 5 batches with compact_every=2: folds ran inside batches 1 and 3
    # (each excluding the in-flight partition), so the surviving label
    # history is bounded, not one partition per batch
    parts = [p for p in os.listdir(f"{wd}/labels") if p.startswith("batch=")]
    assert len(parts) < 5, parts


def test_compact_before_batch_preserves_inflight(spark, tmp_path):
    """before_batch compaction folds only completed batches: the
    in-flight partition survives untouched, and a retry-style read that
    excludes it still resolves the full prior history."""
    from ditto_spark.streaming.incremental_er import (compact_entity_labels,
                                                      read_entity_labels)

    lp = str(tmp_path / "labels")
    spark.createDataFrame([("a", "a")], "doc_id string, entity_id string"
                          ).write.parquet(f"{lp}/batch=0")
    spark.createDataFrame([("b", "b")], "doc_id string, entity_id string"
                          ).write.parquet(f"{lp}/batch=1")
    # batch 2 is in flight (partial write already landed)
    spark.createDataFrame([("c", "c")], "doc_id string, entity_id string"
                          ).write.parquet(f"{lp}/batch=2")
    dropped = compact_entity_labels(spark, lp, before_batch=2)
    assert dropped == 1  # batch=0 folded into batch=1; batch=2 untouched
    import os
    assert sorted(p for p in os.listdir(lp) if p.startswith("batch=")) == [
        "batch=1", "batch=2"]
    # a RETRY of batch 2 reads labels excluding its own partition and
    # must still see the full completed history
    retry_view = {r["doc_id"]: r["entity_id"] for r in read_entity_labels(
        spark, lp, before_batch=2).collect()}
    assert retry_view == {"a": "a", "b": "b"}
    full = {r["doc_id"]: r["entity_id"] for r in read_entity_labels(
        spark, lp).collect()}
    assert full == {"a": "a", "b": "b", "c": "c"}


def test_index_partition_pruning(spark, tmp_path):
    """The accumulated band index is written partitioned by band-key
    hash, and a probe's bucket IN-filter prunes the parquet scan to
    those partitions (fewer input files than the full read)."""
    from ditto_spark.schema import DOC_SCHEMA
    from ditto_spark.streaming.incremental_er import (incremental_entities,
                                                      _bk_bucket)
    from ditto_spark.synth import docs_df

    docs = docs_df(spark, n_entities=15, seed=31)
    rows = docs.collect()
    src = str(tmp_path / "in")
    half = (len(rows) + 1) // 2
    for i in range(2):
        chunk = [(r.doc_id,
                  [(s.kind, s.text, s.media_ref, s.offset)
                   for s in r.spans])
                 for r in rows[i * half:(i + 1) * half]]
        (spark.createDataFrame(chunk, DOC_SCHEMA).coalesce(1)
         .write.mode("append").parquet(src))
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    wd, ck = str(tmp_path / "work"), str(tmp_path / "ck")
    incremental_entities(spark, stream, wd, ck)

    full = spark.read.parquet(f"{wd}/index")
    assert "bk_bucket" in full.columns
    all_buckets = sorted(r[0] for r in
                         full.select("bk_bucket").distinct().collect())
    assert len(all_buckets) > 1, "fixture too small to split buckets"
    probe = full.filter(F.col("bk_bucket").isin(all_buckets[:1]))
    # directory pruning: the filtered scan OPENS strictly fewer files
    # (input_file_name reflects execution; inputFiles() lists the
    # relation pre-pruning)
    read_files = {r[0] for r in
                  probe.select(F.input_file_name()).distinct().collect()}
    all_files = {r[0] for r in
                 full.select(F.input_file_name()).distinct().collect()}
    assert read_files and read_files < all_files
    assert all(f"bk_bucket={all_buckets[0]}" in f for f in read_files)
    # and the plan carries the partition filter (static pruning, not a
    # post-scan filter)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bk_bucket" in plan.split(
        "PartitionFilters")[1][:200]


def _pruned_scan_assert(df_full, df_pruned, part_col, want_val):
    """Shared assertion: the pruned scan OPENS strictly fewer files than
    the full scan (directory pruning, not post-scan filtering) and its
    plan carries a PartitionFilters entry on ``part_col``."""
    read_files = {r[0] for r in
                  df_pruned.select(F.input_file_name()).distinct().collect()}
    all_files = {r[0] for r in
                 df_full.select(F.input_file_name()).distinct().collect()}
    assert read_files and read_files < all_files
    assert all(f"{part_col}={want_val}" in f for f in read_files)
    plan = df_pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and part_col in plan.split(
        "PartitionFilters")[1][:200]


def test_docs_labels_partition_pruning(spark, tmp_path):
    """VERDICT r4 #1: the docs, labels, AND member-index stores are
    hash-bucket-partitioned, and the per-batch read pattern (bounded
    bucket IN-filter) prunes each parquet scan to those partitions —
    the text-attach and label-resolve reads are O(batch), not
    O(corpus)."""
    from ditto_spark.schema import DOC_SCHEMA
    from ditto_spark.streaming.incremental_er import (incremental_entities,
                                                      read_entity_labels)
    from ditto_spark.synth import docs_df

    docs = docs_df(spark, n_entities=15, seed=31)
    rows = docs.collect()
    src = str(tmp_path / "in")
    half = (len(rows) + 1) // 2
    for i in range(2):
        chunk = [(r.doc_id,
                  [(s.kind, s.text, s.media_ref, s.offset)
                   for s in r.spans])
                 for r in rows[i * half:(i + 1) * half]]
        (spark.createDataFrame(chunk, DOC_SCHEMA).coalesce(1)
         .write.mode("append").parquet(src))
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    wd, ck = str(tmp_path / "work"), str(tmp_path / "ck")
    incremental_entities(spark, stream, wd, ck)

    # docs store: bucketed by doc-id hash; pruned read opens fewer files
    docs_full = spark.read.parquet(f"{wd}/docs")
    assert "doc_bucket" in docs_full.columns
    dbuckets = sorted(r[0] for r in
                      docs_full.select("doc_bucket").distinct().collect())
    assert len(dbuckets) > 1, "fixture too small to split doc buckets"
    _pruned_scan_assert(
        docs_full, docs_full.filter(F.col("doc_bucket").isin(dbuckets[:1])),
        "doc_bucket", dbuckets[0])

    # labels store: bucketed by doc-id hash; the pruned resolve is exact
    # for docs in the pruned buckets
    lab_full = spark.read.parquet(f"{wd}/labels")
    assert "doc_bucket" in lab_full.columns
    lbuckets = sorted(r[0] for r in
                      lab_full.select("doc_bucket").distinct().collect())
    assert len(lbuckets) > 1
    _pruned_scan_assert(
        lab_full, lab_full.filter(F.col("doc_bucket").isin(lbuckets[:1])),
        "doc_bucket", lbuckets[0])
    pruned = {r["doc_id"]: r["entity_id"] for r in read_entity_labels(
        spark, f"{wd}/labels", doc_buckets=lbuckets[:1]).collect()}
    full = {r["doc_id"]: r["entity_id"] for r in read_entity_labels(
        spark, f"{wd}/labels").collect()}
    assert pruned and all(full[k] == v for k, v in pruned.items())

    # member index: bucketed by entity-id hash
    be_full = spark.read.parquet(f"{wd}/labels_byent")
    assert "ent_bucket" in be_full.columns
    ebuckets = sorted(r[0] for r in
                      be_full.select("ent_bucket").distinct().collect())
    assert len(ebuckets) > 1
    _pruned_scan_assert(
        be_full, be_full.filter(F.col("ent_bucket").isin(ebuckets[:1])),
        "ent_bucket", ebuckets[0])


def test_touched_member_labels_stale_rows(spark, tmp_path):
    """The entity-keyed member index accumulates STALE rows (a doc
    relabeled later keeps its old member row until compaction); the
    touched-member lookup must filter them by current label — a doc
    that LEFT a touched entity must not resurface in it."""
    from pyspark.sql import functions as SF

    from ditto_spark.streaming.incremental_er import (_hash_bucket,
                                                      touched_member_labels)

    wd = str(tmp_path / "work")

    def _write(rows, batch, store, bucket_col, key):
        df = spark.createDataFrame(rows, "doc_id string, entity_id string")
        (df.withColumn(bucket_col, _hash_bucket(key))
         .write.partitionBy(bucket_col)
         .parquet(f"{wd}/{store}/batch={batch}"))

    # batch 0: entity b = {b, z}; batch 1: z moves to entity a
    _write([("b", "b"), ("z", "b")], 0, "labels", "doc_bucket", "doc_id")
    _write([("b", "b"), ("z", "b")], 0, "labels_byent", "ent_bucket",
           "entity_id")
    _write([("z", "a"), ("a", "a")], 1, "labels", "doc_bucket", "doc_id")
    _write([("z", "a"), ("a", "a")], 1, "labels_byent", "ent_bucket",
           "entity_id")

    nodes = spark.createDataFrame([("b",)], "doc_id string")
    got = {r["doc_id"]: r["entity_id"] for r in
           touched_member_labels(spark, wd, nodes).collect()}
    # touched = {b}; z's byent row under entity b is stale — its CURRENT
    # label is a, so it must not appear as a member of b
    assert got == {"b": "b"}

    # and the symmetric lookup from z finds its current entity a with
    # both members
    nodes_z = spark.createDataFrame([("z",)], "doc_id string")
    got_z = {r["doc_id"]: r["entity_id"] for r in
             touched_member_labels(spark, wd, nodes_z).collect()}
    assert got_z == {"z": "a", "a": "a"}


def test_unlabeled_nodes_empty_store(spark, tmp_path):
    """First-batch shape: no label store at all — the touched-member
    lookup returns an empty frame with the right schema."""
    from ditto_spark.streaming.incremental_er import touched_member_labels

    nodes = spark.createDataFrame([("n1",), ("n2",)], "doc_id string")
    out = touched_member_labels(spark, str(tmp_path / "none"), nodes)
    assert out.columns == ["doc_id", "entity_id"]
    assert out.count() == 0


def test_custom_store_bucket_count_and_marker_guard(spark, tmp_path):
    """``n_store_buckets`` sizes every store's hash partitioning (the
    corpus-sized-buckets contract that keeps per-batch reads O(batch));
    labels still equal the batch pipeline, and re-opening the stores
    with a DIFFERENT count fails fast instead of pruning to the wrong
    partitions (which would silently drop rows)."""
    import os

    import pytest

    from ditto_spark.schema import DOC_SCHEMA
    from ditto_spark.streaming.incremental_er import (incremental_entities,
                                                      read_entity_labels)
    from ditto_spark.synth import docs_df

    docs = docs_df(spark, n_entities=12, seed=29)
    rows = docs.collect()
    src = str(tmp_path / "in")
    half = (len(rows) + 1) // 2
    for i in range(2):
        chunk = [(r.doc_id,
                  [(s.kind, s.text, s.media_ref, s.offset)
                   for s in r.spans])
                 for r in rows[i * half:(i + 1) * half]]
        (spark.createDataFrame(chunk, DOC_SCHEMA).coalesce(1)
         .write.mode("append").parquet(src))

    def _stream():
        return (spark.readStream.schema(DOC_SCHEMA)
                .option("maxFilesPerTrigger", 1).parquet(src))

    wd, ck = str(tmp_path / "work"), str(tmp_path / "ck")
    incremental_entities(spark, _stream(), wd, ck, n_store_buckets=8)
    # the count is pinned in a marker and the stores really use it
    assert os.path.isdir(f"{wd}/_n_buckets=8")
    b0 = f"{wd}/labels/batch=0"
    seen = {p for p in os.listdir(b0) if p.startswith("doc_bucket=")}
    assert seen and all(0 <= int(p.split("=")[1]) < 8 for p in seen)

    got = {r["doc_id"]: r["entity_id"]
           for r in read_entity_labels(spark, f"{wd}/labels").collect()}
    assert got == _batch_oracle_labels(spark, docs)

    # a restart with a mismatched bucket count must refuse to run
    with pytest.raises(Exception, match="n_buckets=8"):
        incremental_entities(spark, _stream(), wd, str(tmp_path / "ck2"),
                             n_store_buckets=16)
