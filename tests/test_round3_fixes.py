"""Round-3 fix coverage: score_pairs schema self-enforcement with
non-string upstream ids, capability-based native-scorer routing,
bounded ref-TFIDF vocab default, reliable CC checkpointing, widened
split_production ids, scoped cache registry, and the GeneralDK
whole-float normalization."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_score_pairs_accepts_long_ids(spark):
    """A valid upstream with bigint ids (parquet doc_id) must flow
    through score_pairs' declared string-id schema — the operator casts
    in its own projection (VERDICT r2 #1: er_model_scores crash)."""
    from ditto_spark.operators.scoring import score_pairs

    pairs = spark.createDataFrame(
        [(1, 2, "COL name VAL acme corp", "COL name VAL acme corporation"),
         (3, 4, "COL name VAL zebra", "COL name VAL xylophone")],
        "left_id long, right_id long, left_text string, right_text string")
    out = score_pairs(pairs, 0.5).collect()
    assert len(out) == 2
    assert all(isinstance(r["left_id"], str) for r in out)
    assert {r["left_id"] for r in out} == {"1", "3"}


def test_score_pairs_accepts_long_ids_numpy_backend(spark):
    """Same contract through the numpy transformer backend — the exact
    shape that crashed er_model_scores in CORRECTNESS_r02."""
    from ditto_spark.operators.npmodel import NumpyDittoBackend, make_weights
    from ditto_spark.operators.scoring import score_pairs

    w = make_weights(seed=0)
    pairs = spark.createDataFrame(
        [(10, 20, "COL a VAL x y z", "COL a VAL x y q"),
         (30, 40, "COL a VAL foo", "COL a VAL bar")],
        "left_id long, right_id long, left_text string, right_text string")
    out = score_pairs(pairs, 0.1,
                      lambda: NumpyDittoBackend(w, micro_batch=2)).collect()
    assert len(out) == 2
    assert all(0.0 <= r["p1"] <= 1.0 for r in out)


def test_native_routing_accepts_instance(spark):
    """PipelineConfig(native_scorer=True) must take the codegen path for
    a SurrogateBackend INSTANCE too, not only the class (VERDICT r2 #4);
    a subclass must NOT silently claim native equivalence."""
    from ditto_spark.operators.scoring import SurrogateBackend
    from ditto_spark.plans.pipeline import _native_capable

    class Sub(SurrogateBackend):
        def score_batch(self, left, right):  # changed semantics
            return super().score_batch(left, right) * 0

    assert _native_capable(SurrogateBackend)
    assert _native_capable(SurrogateBackend())
    assert not _native_capable(Sub)
    assert not _native_capable(Sub())

    class CustomNative:
        native_equivalent = True

    assert _native_capable(CustomNative)
    assert _native_capable(CustomNative())


def test_pipeline_instance_backend_native_path(spark):
    """End-to-end: instance-configured pipeline produces identical
    decisions to the class-configured (native) one."""
    from ditto_spark.operators.scoring import SurrogateBackend
    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
    from ditto_spark.synth import distributed_docs

    docs = distributed_docs(spark, 300, seed=11)
    m_cls = run_pipeline(spark, docs, PipelineConfig())["matches"]
    m_inst = run_pipeline(
        spark, docs,
        PipelineConfig(backend_factory=SurrogateBackend()))["matches"]
    a = {(r["left_id"], r["right_id"], r["match"]) for r in m_cls.collect()}
    b = {(r["left_id"], r["right_id"], r["match"]) for r in m_inst.collect()}
    assert a == b and len(a) > 0


def test_ref_tfidf_vocab_cap():
    """PipelineConfig's default bounds the driver-collected vocab."""
    from ditto_spark.plans.pipeline import PipelineConfig

    assert PipelineConfig().ref_tfidf_max_vocab is not None


def test_cc_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir mode must produce the same components as the
    localCheckpoint default."""
    from ditto_spark.operators.clustering import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")],
        "src string, dst string")
    local = {(r["doc_id"], r["entity_id"])
             for r in connected_components(edges).collect()}
    reliable = {(r["doc_id"], r["entity_id"])
                for r in connected_components(
                    edges, checkpoint_dir=str(tmp_path / "cc_ck")).collect()}
    assert local == reliable
    assert ("c", "a") in local and ("y", "x") in local


def test_split_production_wide_ids_and_duplicates(spark):
    """Duplicate input rows must get DISTINCT pair ids (row_number within
    the 120-bit content hash), and the id multiset must be stable across
    partitionings (ADVICE r2: 60-bit collapse)."""
    from ditto_spark.operators.serialize import split_production

    df = spark.createDataFrame(
        [("a", "x")] * 3 + [("b", "y")],
        "name_left string, name_right string")
    out = split_production(df).collect()
    ids = sorted(r["left_id"] for r in out)
    assert len(ids) == 4 and len(set(ids)) == 4  # duplicates distinct
    ids2 = sorted(r["left_id"]
                  for r in split_production(df.repartition(4)).collect())
    assert ids == ids2  # deterministic multiset across partitionings
    # ~120-bit: two 60-bit decimal hashes joined by 'x' plus '-<n>'
    assert all("x" in i and "-" in i for i in ids)


def test_cache_scope_isolation(spark):
    """release_registered() inside one scope must not unpersist frames
    registered by another scope (ADVICE r2: cachereg cross-release)."""
    from ditto_spark.cachereg import (cache_registered, cache_scope,
                                      release_registered)

    outer = None
    with cache_scope():
        outer = cache_registered(spark.range(10))
        outer.count()
        with cache_scope():
            inner = cache_registered(spark.range(5))
            inner.count()
            assert release_registered() == 1  # only the inner frame
            assert outer.storageLevel.useMemory  # outer untouched
        assert outer.storageLevel.useMemory
    assert not outer.storageLevel.useMemory  # outer scope exit released it


def test_general_dk_whole_float(spark):
    """'5.0' must normalize to '5' (reference knowledge.py like_num
    branch: val == round(val) -> '%d'), '5.25' to '5.25'-> '%.2f'."""
    from ditto_spark.operators.knowledge import dk_inject_general

    df = spark.createDataFrame(
        [("price 5.0 and 5.25 and 1234567x9",)], "t string")
    out = df.select(dk_inject_general(F.col("t")).alias("o")).first()["o"]
    assert " 5 " in f" {out} " or out.startswith("price 5 ")
    assert "5.25" in out and "5.00" not in out
    assert "ID 1234567x9" in out


def test_task_config_registry(tmp_path):
    """configs.json contract (matcher.py:276-278): list -> name-keyed
    dict, last duplicate wins, flags map onto PipelineConfig."""
    import json

    from ditto_spark.configs import (dataset_paths, get_task,
                                     load_task_configs,
                                     task_pipeline_config)

    p = tmp_path / "configs.json"
    p.write_text(json.dumps([
        {"name": "Structured/Beer", "task_type": "classification",
         "vocab": ["0", "1"], "trainset": "data/beer/train.txt",
         "validset": "data/beer/valid.txt", "testset": "data/beer/test.txt"},
        {"name": "dup", "task_type": "classification", "marker": 1},
        {"name": "dup", "task_type": "classification", "marker": 2},
    ]))
    cfgs = load_task_configs(str(p))
    assert cfgs["dup"]["marker"] == 2  # last wins, dict-comp semantics
    conf = get_task(cfgs, "Structured/Beer")
    pc = task_pipeline_config(conf, summarize=True, dk=True, max_len=32)
    assert pc.use_summarizer and pc.use_dk
    assert pc.summarizer_max_len == 32
    paths = dataset_paths(conf, "/base")
    assert paths["trainset"] == "/base/data/beer/train.txt"
    try:
        get_task(cfgs, "nope")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_minhash_portable_mode(spark):
    """token_hash='portable' must find the same planted near-dups the
    default hash family does (statistics match; sets may differ)."""
    from ditto_spark.operators.blocking import minhash_lsh_blocking

    rows = []
    for i in range(40):
        base = f"alpha beta gamma delta epsilon zeta{i} eta theta iota"
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base + " kappa"))  # planted near-dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = minhash_lsh_blocking(df, n_hashes=24, bands=6, shingle_n=3,
                               with_texts=False, token_hash="portable",
                               drop_marker_tokens=False)
    pairs = {(r["left_id"], r["right_id"]) for r in got.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    assert len(planted & pairs) >= 30  # high-jaccard dups must collide


def test_cli_task_registry_e2e(spark, tmp_path):
    """CLI --task resolves through the registry and runs the pipeline
    end-to-end (synthetic docs, surrogate backend)."""
    import json

    from ditto_spark.cli import main

    cfgs = tmp_path / "configs.json"
    cfgs.write_text(json.dumps([
        {"name": "Structured/Synth", "task_type": "classification",
         "vocab": ["0", "1"]},
    ]))
    out = tmp_path / "out"
    rc = main(["--synthetic", "200", "--output", str(out),
               "--task", "Structured/Synth", "--configs", str(cfgs),
               "--dk", "--cores", "0"])
    assert rc == 0
    ents = spark.read.parquet(str(out / "entities"))
    assert ents.count() == 200
