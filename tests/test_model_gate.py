"""Non-circular F1 gate: the DISTRIBUTED scoring path (mapInPandas,
per-worker model pinning, micro-batch padding, threshold decisions) must
reproduce a real transformer cross-encoder's single-node decisions with
F1 >= 0.99 (north_rule). The oracle (tests/reference_model_oracle.py) is
an independent implementation that scores each pair alone, UNPADDED —
so padding-mask, batching, and ordering bugs in the distributed path
make this gate fail (the round-1 surrogate-vs-surrogate gate could not).
Decision contract per /root/reference/matcher.py:108-115,155-159.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ditto_spark.operators.npmodel import (
    NumpyDittoBackend, make_weights, tokenize_pair,
)
from tests.reference_model_oracle import score_one

WEIGHTS = make_weights(seed=0)


def _candidate_pairs(spark, n=400):
    """Labeled-style candidate pairs at a shared blocking key: serialized
    synthetic docs with planted near-dups (the ER-Magellan-style fixture
    shape)."""
    from ditto_spark.operators import blocking as B
    from ditto_spark.operators.serialize import serialize_docs
    from ditto_spark.plans.pipeline import sn_key
    from ditto_spark.synth import distributed_docs

    docs = serialize_docs(distributed_docs(spark, n, seed=23)).select(
        "doc_id", "text")
    return B.sorted_neighborhood(docs, sn_key(), window=3).select(
        "left_id", "right_id", "left_text", "right_text",
        F.lit("bk").alias("block_key"))


def test_padding_invariance_unit():
    """The batched masked forward must equal the unpadded per-pair
    forward regardless of batch composition (attention must not leak
    into pad positions)."""
    import pandas as pd

    rng_pairs = [
        ("COL name VAL anna maria", "COL name VAL anna maria"),
        ("COL a VAL " + "tok " * 40, "COL a VAL xy"),   # long-short pad
        ("COL x VAL 1", "COL y VAL 2"),
        ("", "COL z VAL solo"),
    ]
    backend = NumpyDittoBackend(WEIGHTS, micro_batch=4)
    left = pd.Series([p[0] for p in rng_pairs])
    right = pd.Series([p[1] for p in rng_pairs])
    batched = backend.score_batch(left, right)
    for i, (a, b) in enumerate(rng_pairs):
        solo = score_one(a, b, WEIGHTS)
        assert abs(batched.iloc[i] - solo) < 1e-5, (i, batched.iloc[i],
                                                    solo)


def test_tokenizer_truncation_contract():
    ids = tokenize_pair("a " * 300, "b " * 300, 2048, 128)
    assert len(ids) == 128 and ids[0] == 1


def test_distributed_scoring_f1_gate(spark):
    from ditto_spark.operators.scoring import f1_agg, score_pairs

    cands = _candidate_pairs(spark).collect()
    assert len(cands) > 300
    # oracle decisions, single-node, per-pair unpadded
    oracle_p1 = np.array([
        score_one(r["left_text"], r["right_text"], WEIGHTS) for r in cands
    ])
    threshold = float(np.median(oracle_p1))  # guarantees both classes
    oracle_dec = (oracle_p1 > threshold).astype(int)
    assert 0 < oracle_dec.sum() < len(oracle_dec)

    cdf = spark.createDataFrame(
        [(r["left_id"], r["right_id"], r["left_text"], r["right_text"],
          r["block_key"]) for r in cands],
        "left_id string, right_id string, left_text string, "
        "right_text string, block_key string",
    ).repartition(7)  # batch boundaries unrelated to pair order
    scored = score_pairs(cdf, threshold,
                         lambda: NumpyDittoBackend(WEIGHTS, micro_batch=32))
    got = {(r["left_id"], r["right_id"]): r for r in scored.collect()}

    labels = []
    for r, dec in zip(cands, oracle_dec):
        g = got[(r["left_id"], r["right_id"])]
        labels.append((int(dec), int(g["match"])))
    ldf = spark.createDataFrame(labels, "label int, match int")
    f1 = f1_agg(ldf)
    assert f1 >= 0.99, f1
    # and probability-level agreement (distributed == single-node)
    for r, p in zip(cands, oracle_p1):
        g = got[(r["left_id"], r["right_id"])]
        assert abs(g["p1"] - p) < 1e-5


def test_checkpoint_roundtrip(tmp_path):
    """S10 model checkpoint scan: save -> load -> identical scores; a
    wrong-layout file fails loudly (the TorchDittoBackend contract)."""
    import pandas as pd

    from ditto_spark.operators.npmodel import load_checkpoint, save_checkpoint

    p = str(tmp_path / "ck.npz")
    save_checkpoint(WEIGHTS, p)
    loaded = load_checkpoint(p)
    b1 = NumpyDittoBackend(WEIGHTS)
    b2 = NumpyDittoBackend(loaded)
    s = pd.Series(["COL a VAL x y z"])
    t = pd.Series(["COL a VAL x y w"])
    assert float(b1.score_batch(s, t).iloc[0]) == \
        float(b2.score_batch(s, t).iloc[0])

    import numpy as np2
    np2.savez(str(tmp_path / "bad.npz"),
              _config=np2.array([1, 2, 3, 4, 5, 6]),
              other=np2.zeros(3))
    with pytest.raises(ValueError, match="bert"):
        load_checkpoint(str(tmp_path / "bad.npz"))


@pytest.mark.parametrize("micro_batch", [1, 17, 256])
def test_micro_batch_size_invariance(micro_batch):
    import pandas as pd

    texts = [(f"COL k VAL item {i} alpha", f"COL k VAL item {i} beta")
             for i in range(40)]
    b = NumpyDittoBackend(WEIGHTS, micro_batch=micro_batch)
    out = b.score_batch(pd.Series([t[0] for t in texts]),
                        pd.Series([t[1] for t in texts]))
    ref = NumpyDittoBackend(WEIGHTS, micro_batch=8).score_batch(
        pd.Series([t[0] for t in texts]), pd.Series([t[1] for t in texts]))
    assert np.allclose(out.to_numpy(), ref.to_numpy(), atol=1e-6)
