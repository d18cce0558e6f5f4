"""Round-6 fix coverage (ADVICE r5): bucket-marker minting semantics
(_check_bucket_meta refuses unmarked non-empty stores; build_corpus_index
marks before data), compact_entity_labels bucket-count verification,
probe-memo collision safety, and the blocking_quality tiny-corpus guard.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# _check_bucket_meta minting semantics
# ---------------------------------------------------------------------------

def test_bucket_meta_mints_on_missing_and_empty(spark, tmp_path):
    from ditto_spark.streaming.incremental_er import _check_bucket_meta

    # missing root: mint
    p = str(tmp_path / "store_a")
    _check_bucket_meta(spark, p, 32)
    assert os.path.isdir(f"{p}/_n_buckets=32")
    # existing but empty root: mint
    q = str(tmp_path / "store_b")
    os.makedirs(q)
    _check_bucket_meta(spark, q, 16)
    assert os.path.isdir(f"{q}/_n_buckets=16")
    # re-check with the same count: pass-through
    _check_bucket_meta(spark, p, 32)
    # mismatched count against a marked store: refuse
    with pytest.raises(ValueError, match="n_buckets=32"):
        _check_bucket_meta(spark, p, 64)


def test_bucket_meta_refuses_unmarked_nonempty_store(spark, tmp_path):
    """A store holding data but no marker (pre-scheme store, or a
    builder that crashed between data and marker) must be REFUSED, not
    certified with the reader's parameter — minting here could bless a
    count the data was not laid out with and silently drop rows on
    every later pruned read."""
    from ditto_spark.streaming.incremental_er import _check_bucket_meta

    p = str(tmp_path / "legacy")
    spark.createDataFrame([("a", 1)], "id string, bk_bucket int") \
        .write.partitionBy("bk_bucket").parquet(p)
    assert not any(n.startswith("_n_buckets=") for n in os.listdir(p))
    with pytest.raises(ValueError, match="no _n_buckets marker"):
        _check_bucket_meta(spark, p, 64)
    # underscore/dot metadata entries alone do NOT count as data
    q = str(tmp_path / "meta_only")
    os.makedirs(f"{q}/_temporary")
    open(f"{q}/_SUCCESS", "w").close()
    _check_bucket_meta(spark, q, 8)
    assert os.path.isdir(f"{q}/_n_buckets=8")


def test_build_corpus_index_marks_before_data(spark, tmp_path):
    """build_corpus_index writes the marker before any data lands and
    a rebuild with a different count re-mints cleanly (explicit delete
    + marker + append, not mode(overwrite) which would strand an
    unmarked window)."""
    from ditto_spark.streaming.incremental_er import (_check_bucket_meta,
                                                      build_corpus_index)
    from ditto_spark.synth import docs_df

    docs = docs_df(spark, n_entities=4, seed=61)
    idx = str(tmp_path / "idx")
    build_corpus_index(docs, idx, n_buckets=8)
    assert os.path.isdir(f"{idx}/_n_buckets=8")
    assert spark.read.parquet(idx).count() > 0
    # reader with the matching count passes; mismatch refuses
    _check_bucket_meta(spark, idx, 8)
    with pytest.raises(ValueError, match="n_buckets=8"):
        _check_bucket_meta(spark, idx, 16)
    # rebuild with another count: old marker + data replaced
    build_corpus_index(docs, idx, n_buckets=16)
    assert os.path.isdir(f"{idx}/_n_buckets=16")
    assert not os.path.isdir(f"{idx}/_n_buckets=8")
    _check_bucket_meta(spark, idx, 16)


# ---------------------------------------------------------------------------
# compact_entity_labels bucket-count verification
# ---------------------------------------------------------------------------

def _write_bucketed_labels(spark, work_dir: str, n_buckets: int) -> str:
    from ditto_spark.streaming.incremental_er import _hash_bucket

    lp = f"{work_dir}/labels"
    for batch, rows in enumerate([[("a", "a"), ("b", "b")], [("b", "a")]]):
        (spark.createDataFrame(rows, "doc_id string, entity_id string")
         .withColumn("doc_bucket", _hash_bucket("doc_id", n_buckets))
         .write.partitionBy("doc_bucket").parquet(f"{lp}/batch={batch}"))
    return lp


def test_compact_refuses_unmarked_bucketed_store(spark, tmp_path):
    from ditto_spark.streaming.incremental_er import compact_entity_labels

    lp = _write_bucketed_labels(spark, str(tmp_path / "wd"), 64)
    with pytest.raises(ValueError, match="no _n_buckets marker"):
        compact_entity_labels(spark, lp, n_buckets=64)


def test_compact_refuses_mismatched_bucket_count(spark, tmp_path):
    from ditto_spark.streaming.incremental_er import (_check_bucket_meta,
                                                      compact_entity_labels)

    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    _check_bucket_meta(spark, wd, 64)  # marker first, like the stream
    lp = _write_bucketed_labels(spark, wd, 64)
    with pytest.raises(ValueError, match="n_buckets=64"):
        compact_entity_labels(spark, lp, n_buckets=32)


def test_compact_verifies_marker_and_compacts(spark, tmp_path):
    from ditto_spark.streaming.incremental_er import (_check_bucket_meta,
                                                      compact_entity_labels,
                                                      read_entity_labels)

    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    _check_bucket_meta(spark, wd, 16)  # marker first, like the stream
    lp = _write_bucketed_labels(spark, wd, 16)
    want = {r["doc_id"]: r["entity_id"]
            for r in read_entity_labels(spark, lp).collect()}
    assert want == {"a": "a", "b": "a"}
    dropped = compact_entity_labels(spark, lp, n_buckets=16)
    assert dropped == 1
    got = {r["doc_id"]: r["entity_id"]
           for r in read_entity_labels(spark, lp).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# atomic checkpoint manifests
# ---------------------------------------------------------------------------

def test_truncated_manifest_recomputes_byte_identical(spark, tmp_path):
    """A crash mid-manifest-write (simulated by truncating the JSON)
    must mean recompute-next-run, not a raised JSONDecodeError; the
    recomputed stage's output equals the original, and the repaired
    manifest resumes again. Manifest publish is temp-file + os.replace,
    so no .tmp litter survives a successful run."""
    from ditto_spark.sources.checkpoint import CheckpointStore

    base = str(tmp_path / "ck")

    def build():
        return spark.range(10).toDF("id")

    s1 = CheckpointStore(spark, base)
    rows1 = sorted(r["id"] for r in s1.stage("s", "fp1", build).collect())
    assert s1.recomputed == ["s"]
    assert not [n for n in os.listdir(base) if ".tmp." in n]

    s2 = CheckpointStore(spark, base)
    s2.stage("s", "fp1", build)
    assert s2.recomputed == []  # clean resume

    mpath = s2._manifest("s")
    content = open(mpath).read()
    with open(mpath, "w") as f:
        f.write(content[: len(content) // 2])  # truncated mid-dump
    s3 = CheckpointStore(spark, base)
    rows3 = sorted(r["id"] for r in s3.stage("s", "fp1", build).collect())
    assert s3.recomputed == ["s"]  # recompute, no raise
    assert rows3 == rows1

    s4 = CheckpointStore(spark, base)
    s4.stage("s", "fp1", build)
    assert s4.recomputed == []  # repaired manifest resumes again


# ---------------------------------------------------------------------------
# probe-memo collision safety
# ---------------------------------------------------------------------------

def test_probe_memo_survives_forced_collision(spark):
    """Force a key collision by planting a colliding entry: the hit is
    verified with sameSemantics, so the colliding plan re-probes
    instead of returning the other plan's routing decision."""
    import ditto_spark.operators.embed as E

    E.clear_probe_cache()
    a = spark.range(10).toDF("id")
    b = spark.range(1).toDF("id")
    assert E._probe_exceeds(a, 5) is True
    # plant b's would-be answer under b's key but with a WRONG cached
    # value and a's frame as the occupant — simulating a 32-bit
    # cross-plan hash collision landing on a's entry
    E._probe_cache[(b.semanticHash(), 5)] = (a, True)
    assert E._probe_exceeds(b, 5) is False  # re-probed, not trusted
    # and a genuine repeat is served from the memo (no recompute path
    # to assert on directly, but the entry's stored frame must match)
    frame, val = E._probe_cache[(a.semanticHash(), 5)]
    assert val is True and frame.sameSemantics(a)
    E.clear_probe_cache()


# ---------------------------------------------------------------------------
# measured auto-banding
# ---------------------------------------------------------------------------

def _dup_corpus(spark, overlap_tokens: int):
    """30 base docs + one dup each sharing ``overlap_tokens`` of 12
    tokens (token-level 3-gram jaccard falls with the overlap)."""
    rows = []
    for i in range(30):
        base = [f"tok{i}_{j}" for j in range(12)]
        dup = base[:overlap_tokens] + [f"alt{i}_{j}" for j in
                                       range(12 - overlap_tokens)]
        rows.append((f"a{i}", " ".join(base)))
        rows.append((f"b{i}", " ".join(dup)))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_auto_bands_adapts_to_corpus_similarity(spark):
    """A low-jaccard dup corpus must select MORE bands (narrower rows,
    more recall) than a high-jaccard one — the measured s-curve doing
    the tuning a user would otherwise hand-guess (VERDICT r5 #6)."""
    from ditto_spark.plans.pipeline import PipelineConfig, auto_select_bands

    cfg = PipelineConfig(auto_bands=True, auto_bands_target=0.95,
                         auto_bands_truth_jaccard=0.25)
    high = auto_select_bands(spark, _dup_corpus(spark, 12), cfg)  # exact dups
    low = auto_select_bands(spark, _dup_corpus(spark, 7), cfg)
    assert low > high, (low, high)
    assert high in cfg.auto_bands_configs and low in cfg.auto_bands_configs


def test_auto_bands_runs_in_pipeline_and_fingerprints(spark, tmp_path):
    """auto_bands=True runs end-to-end, and the chosen banding enters
    the blocking fingerprint: same input resumes; a corpus change that
    flips the choice recomputes blocking."""
    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
    from ditto_spark.sources.checkpoint import CheckpointStore

    from ditto_spark.operators.serialize import flat_to_docs

    docs = flat_to_docs(_dup_corpus(spark, 12), id_col="doc_id",
                        attr_cols=["text"])
    cfg = PipelineConfig(auto_bands=True, auto_bands_truth_jaccard=0.25,
                         use_dk=False)
    base = str(tmp_path / "ck")
    s1 = CheckpointStore(spark, base)
    out1 = run_pipeline(spark, docs, cfg, store=s1, input_id="t1")
    n1 = out1["matches"].count()
    assert n1 > 0
    s2 = CheckpointStore(spark, base)
    out2 = run_pipeline(spark, docs, cfg, store=s2, input_id="t1")
    assert s2.recomputed == []  # same choice -> clean resume
    assert out2["matches"].count() == n1
    # configs with no valid divisor fail loudly
    import pytest as _pytest
    from ditto_spark.plans.pipeline import auto_select_bands

    bad = PipelineConfig(auto_bands=True, auto_bands_configs=(5, 7))
    with _pytest.raises(ValueError, match="divisor"):
        auto_select_bands(spark, _dup_corpus(spark, 12), bad)


# ---------------------------------------------------------------------------
# blocking_quality tiny-corpus guard
# ---------------------------------------------------------------------------

def test_blocking_quality_defined_on_tiny_corpus(spark):
    from ditto_spark.operators.blocking import blocking_quality

    pairs = spark.createDataFrame([], "left_id string, right_id string")
    one_doc = spark.createDataFrame([("a",)], "doc_id string")
    row = blocking_quality(pairs, pairs, one_doc).first()
    assert row["reduction_ratio"] == 0.0
    assert row["pair_completeness"] == 0.0
    empty = spark.createDataFrame([], "doc_id string")
    row0 = blocking_quality(pairs, pairs, empty).first()
    assert row0["reduction_ratio"] == 0.0
