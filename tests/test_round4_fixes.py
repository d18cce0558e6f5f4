"""Round-4 fix coverage: reliable-CC checkpoint-dir scoping (save /
restore + try/finally cleanup), tri-state task-config defaults, and the
split_production hashed-projection cache."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _get_ckpt_dir(spark):
    opt = spark.sparkContext._jsc.sc().getCheckpointDir()
    return opt.get() if opt.isDefined() else None


def test_cc_reliable_restores_unset_dir(spark, tmp_path):
    """A session with NO checkpoint dir must come back with none set,
    and the run's per-round subdir must be deleted."""
    from ditto_spark.operators.clustering import (_restore_checkpoint_dir,
                                                  connected_components)

    _restore_checkpoint_dir(spark.sparkContext, None)
    assert _get_ckpt_dir(spark) is None
    ck = str(tmp_path / "cc_a")
    labels = {r["doc_id"]: r["entity_id"]
              for r in connected_components(
                  _edges(spark, [("b", "a"), ("c", "b")]),
                  checkpoint_dir=ck,
                  small_graph_threshold=None).collect()}
    assert labels == {"a": "a", "b": "a", "c": "a"}
    assert _get_ckpt_dir(spark) is None
    # the run's cc-<uuid> subdir is gone (parent may remain, empty)
    assert not os.path.exists(ck) or os.listdir(ck) == []


def test_cc_reliable_two_runs_different_dirs(spark, tmp_path):
    """Two reliable-mode runs with DIFFERENT dirs in one session: both
    correct, both cleaned up, and a pre-existing session checkpoint dir
    is restored exactly (VERDICT r3 #3 / ADVICE)."""
    from ditto_spark.operators.clustering import (_restore_checkpoint_dir,
                                                  connected_components)

    sc = spark.sparkContext
    mine = str(tmp_path / "caller_own_ckpt")
    os.makedirs(mine)
    _restore_checkpoint_dir(sc, mine)
    assert _get_ckpt_dir(spark) == mine

    ck1, ck2 = str(tmp_path / "cc_1"), str(tmp_path / "cc_2")
    l1 = connected_components(_edges(spark, [("y", "x")]),
                              checkpoint_dir=ck1,
                              small_graph_threshold=None)
    assert _get_ckpt_dir(spark) == mine  # restored between runs
    l2 = connected_components(_edges(spark, [("q", "p"), ("r", "q")]),
                              checkpoint_dir=ck2,
                              small_graph_threshold=None)
    assert {r["entity_id"] for r in l1.collect()} == {"x"}
    assert {r["entity_id"] for r in l2.collect()} == {"p"}
    assert _get_ckpt_dir(spark) == mine
    for ck in (ck1, ck2):
        assert not os.path.exists(ck) or os.listdir(ck) == []
    # the caller's own dir survives untouched
    assert os.path.isdir(mine)
    _restore_checkpoint_dir(sc, None)


def test_cc_reliable_cleanup_on_failure(spark, tmp_path, monkeypatch):
    """A mid-iteration failure must still delete the per-round edge
    copies and restore the previous dir (the ADVICE try/finally leak)."""
    from ditto_spark.operators import clustering

    clustering._restore_checkpoint_dir(spark.sparkContext, None)

    def boom(edges):
        raise RuntimeError("mid-iteration failure")

    monkeypatch.setattr(clustering, "_large_star", boom)
    ck = str(tmp_path / "cc_fail")
    with pytest.raises(RuntimeError, match="mid-iteration"):
        clustering.connected_components(
            _edges(spark, [("b", "a")]), checkpoint_dir=ck,
            small_graph_threshold=None)
    assert _get_ckpt_dir(spark) is None
    assert not os.path.exists(ck) or os.listdir(ck) == []


def test_task_config_defaults_match_pipeline_defaults():
    """task_pipeline_config(conf) with NO flags must resolve to the
    PipelineConfig defaults — the library surface mirrors the CLI's
    tri-state resolution (ADVICE r3, configs.py:58)."""
    from ditto_spark.configs import task_pipeline_config
    from ditto_spark.plans.pipeline import PipelineConfig

    conf = {"name": "t", "task_type": "classification"}
    got = task_pipeline_config(conf)
    dflt = PipelineConfig()
    assert got.use_dk == dflt.use_dk
    assert got.use_summarizer == dflt.use_summarizer
    assert got.summarizer_max_len == dflt.summarizer_max_len
    assert got.threshold == dflt.threshold
    # explicit flags still win
    got2 = task_pipeline_config(conf, dk=False, summarize=True,
                                max_len=9, threshold=0.7)
    assert (got2.use_dk, got2.use_summarizer,
            got2.summarizer_max_len, got2.threshold) == (False, True, 9, 0.7)


def test_split_production_caches_hashed_projection(spark):
    """The duplicate-id path materializes the hashed projection ONCE for
    its three consumers (ADVICE r3, serialize.py:213) — and the cache is
    scope-released, not leaked into the session."""
    from ditto_spark.cachereg import cache_scope
    from ditto_spark.operators.serialize import split_production

    df = spark.createDataFrame(
        [("acme", "acme corp"), ("zeta", "zeta inc"), ("acme", "acme corp")],
        "name_left string, name_right string")
    with cache_scope() as scope:
        out = split_production(df).collect()
        from ditto_spark.cachereg import _SCOPES
        assert len(_SCOPES[scope]) == 1  # the hashed projection
        cached = _SCOPES[scope][0]
        assert cached.storageLevel.useMemory
    # scope exit released it
    assert not cached.storageLevel.useMemory
    assert len(out) == 3
    # duplicate rows got distinct suffixes, unique row suffix '-1'
    ids = sorted(r["left_id"] for r in out)
    assert len(set(ids)) == 3


def test_score_partitions_knob(spark):
    """PipelineConfig.score_partitions pins the model stage's
    parallelism (VERDICT r3 #8: cluster profiles need the knob; 4x
    defaultParallelism stays the default)."""
    from ditto_spark.operators.npmodel import default_numpy_backend
    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
    from ditto_spark.synth import distributed_docs

    docs = distributed_docs(spark, 200, seed=3)
    out = run_pipeline(spark, docs, PipelineConfig(
        sn_window=2, backend_factory=default_numpy_backend,
        native_scorer=False, score_partitions=3))
    assert out["scored"].rdd.getNumPartitions() == 3


def test_checkpoint_state_partition_pure():
    """The torch checkpoint key handling is a pure function (VERDICT r3
    #7): right keys partition cleanly; a missing encoder or an empty
    head raises; the {'model': sd} wrapper unwraps."""
    import pytest as _pytest

    from ditto_spark.operators.scoring import (partition_ditto_state,
                                               unwrap_checkpoint_state)

    sd = {"bert.embeddings.weight": 1, "bert.encoder.layer.0.w": 2,
          "fc.weight": 3, "fc.bias": 4, "optimizer.lr": 9}
    enc, head = partition_ditto_state(sd)
    assert enc == {"embeddings.weight": 1, "encoder.layer.0.w": 2}
    assert head == {"weight": 3, "bias": 4}

    with _pytest.raises(ValueError, match="not a reference-layout"):
        partition_ditto_state({"fc.weight": 3, "fc.bias": 4}, "x.pt")
    with _pytest.raises(ValueError, match="not a reference-layout"):
        partition_ditto_state({"bert.embeddings.weight": 1}, "x.pt")
    with _pytest.raises(ValueError, match="not a reference-layout"):
        partition_ditto_state({"encoder.w": 1, "head.w": 2}, "x.pt")

    assert unwrap_checkpoint_state({"model": sd, "epoch": 3}) is sd
    assert unwrap_checkpoint_state(sd) is sd


def test_stages_dict_protocols():
    """_Stages exposes deferred keys through every dict protocol:
    `in`/`keys`/`len` see them without building; `get`/`items`/`values`
    build on demand; a forced key builds exactly once."""
    from ditto_spark.plans.pipeline import _Stages

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return "ENTITIES"

    s = _Stages({"matches": "M"}, {"entities": build})
    assert "entities" in s and "matches" in s
    assert sorted(s.keys()) == ["entities", "matches"]
    assert sorted(s) == ["entities", "matches"]
    assert len(s) == 2
    assert calls["n"] == 0          # shape inspection is free
    assert s.get("missing") is None
    assert s.get("entities") == "ENTITIES"
    assert calls["n"] == 1
    assert s["entities"] == "ENTITIES"
    assert calls["n"] == 1          # cached after first build
    assert dict(s.items()) == {"matches": "M", "entities": "ENTITIES"}
    assert sorted(s.values()) == ["ENTITIES", "M"]
    assert calls["n"] == 1
