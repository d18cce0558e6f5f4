"""Reference-checkpoint conversion e2e (VERDICT r5 #5): a synthetic
HF-layout matcher state dict (the exact key family torch.save produces
for ditto_light/ditto.py's DittoModel) round-trips through
tools/convert_checkpoint.convert_state -> .npz -> load_checkpoint ->
NumpyCrossEncoder and scores pairs — so the day a real checkpoint
appears, only the offline torch->npz step is new."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tools.convert_checkpoint import convert_state

V, D, H, FF, L, P = 50, 8, 2, 16, 1, 18  # tiny HF-ish dims


def _hf_state(seed: int = 3, with_extras: bool = True) -> dict:
    rng = np.random.default_rng(seed)

    def m(*shape):
        return rng.normal(0, 0.1, shape).astype(np.float32)

    sd = {
        "bert.embeddings.word_embeddings.weight": m(V, D),
        "bert.embeddings.position_embeddings.weight": m(P, D),
        "bert.embeddings.LayerNorm.weight": np.ones(D, np.float32),
        "bert.embeddings.LayerNorm.bias": np.zeros(D, np.float32),
        "fc.weight": m(2, D),
        "fc.bias": m(2),
    }
    for i in range(L):
        p = f"bert.encoder.layer.{i}."
        sd |= {
            p + "attention.self.query.weight": m(D, D),
            p + "attention.self.query.bias": m(D),
            p + "attention.self.key.weight": m(D, D),
            p + "attention.self.key.bias": m(D),
            p + "attention.self.value.weight": m(D, D),
            p + "attention.self.value.bias": m(D),
            p + "attention.output.dense.weight": m(D, D),
            p + "attention.output.dense.bias": m(D),
            p + "attention.output.LayerNorm.weight": np.ones(D, np.float32),
            p + "attention.output.LayerNorm.bias": np.zeros(D, np.float32),
            p + "intermediate.dense.weight": m(FF, D),
            p + "intermediate.dense.bias": m(FF),
            p + "output.dense.weight": m(D, FF),
            p + "output.dense.bias": m(D),
            p + "output.LayerNorm.weight": np.ones(D, np.float32),
            p + "output.LayerNorm.bias": np.zeros(D, np.float32),
        }
    if with_extras:  # legitimately dropped by conversion
        sd["bert.embeddings.token_type_embeddings.weight"] = m(2, D)
        sd["bert.pooler.dense.weight"] = m(D, D)
        sd["bert.pooler.dense.bias"] = m(D)
        sd["bert.embeddings.position_ids"] = np.arange(P)[None, :]
    return sd


def test_convert_roundtrip_scores_pairs(tmp_path):
    from ditto_spark.operators.npmodel import (NumpyDittoBackend,
                                               load_checkpoint,
                                               save_checkpoint)

    # reference save layout: {'model': sd, 'optimizer': ...}
    weights, dropped = convert_state({"model": _hf_state()}, n_heads=H)
    cfg = [int(x) for x in weights["_config"]]
    assert cfg == [V, D, H, FF, L, P]
    assert {k for k in dropped} == {
        "bert.embeddings.token_type_embeddings.weight "
        "(row 0 folded into position embeddings)",
        "bert.pooler.dense.weight", "bert.pooler.dense.bias",
        "bert.embeddings.position_ids"}
    # the token-type fold is applied, not silently dropped (ADVICE r6):
    # pos_emb' = pos_emb + token_type[0], exact float32 add
    src = _hf_state()
    expected_pe = (
        src["bert.embeddings.position_embeddings.weight"].astype(np.float32)
        + src["bert.embeddings.token_type_embeddings.weight"]
        .astype(np.float32)[0])
    np.testing.assert_array_equal(
        weights["bert.embeddings.position_embeddings.weight"], expected_pe)
    path = str(tmp_path / "conv.npz")
    save_checkpoint(weights, path)
    loaded = load_checkpoint(path)  # consumer-side validation passes
    backend = NumpyDittoBackend(weights=loaded)
    left = pd.Series(["COL name VAL ann smith", "COL name VAL bob"])
    right = pd.Series(["COL name VAL ann smith", "COL name VAL zz qq"])
    p = backend.score_batch(left, right)
    assert p.dtype == "float64" and len(p) == 2
    assert ((p > 0) & (p < 1)).all() and np.isfinite(p).all()
    # deterministic across backend instances
    p2 = NumpyDittoBackend(weights=loaded).score_batch(left, right)
    assert np.allclose(p, p2)


def test_converted_biases_reach_the_forward():
    """The HF projection biases must flow into the numpy forward —
    zeroing them must change scores (a dropped-bias conversion would be
    silently wrong on every real checkpoint)."""
    from ditto_spark.operators.npmodel import NumpyDittoBackend

    weights, _ = convert_state(_hf_state(), n_heads=H)
    zeroed = dict(weights)
    for k in list(zeroed):
        if k.endswith((".q.bias", ".k.bias", ".v.bias", ".out.bias")):
            zeroed[k] = np.zeros_like(zeroed[k])
    left = pd.Series(["COL name VAL alpha beta gamma"])
    right = pd.Series(["COL name VAL alpha beta delta"])
    a = NumpyDittoBackend(weights=weights).score_batch(left, right)[0]
    b = NumpyDittoBackend(weights=zeroed).score_batch(left, right)[0]
    assert a != b


def test_convert_pos_offset_and_errors():
    weights, _ = convert_state(_hf_state(), n_heads=H, pos_offset=2)
    assert int(weights["_config"][5]) == P - 2
    assert weights["bert.embeddings.position_embeddings.weight"].shape == (
        P - 2, D)
    # unknown layer key: refuse, never partially convert
    bad = _hf_state()
    bad["bert.encoder.layer.0.attention.self.rotary.weight"] = \
        np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unrecognized encoder-layer"):
        convert_state(bad, n_heads=H)
    # unknown top-level key: refuse
    bad2 = _hf_state()
    bad2["adapter.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unrecognized checkpoint key"):
        convert_state(bad2, n_heads=H)
    # non-matcher layout (no fc.*): the existing strict partition raises
    nohead = {k: v for k, v in _hf_state().items()
              if not k.startswith("fc.")}
    with pytest.raises(ValueError, match="bert"):
        convert_state(nohead)
    # head count must divide width
    with pytest.raises(ValueError, match="n_heads"):
        convert_state(_hf_state(), n_heads=3)


def test_convert_cli_npz_to_npz(tmp_path, capsys):
    """The tool's no-torch path: an .npz-serialized reference-layout
    state converts from the command line."""
    import numpy as np

    from tools.convert_checkpoint import main

    src = str(tmp_path / "ref_state.npz")
    np.savez(src, **_hf_state())
    dst = str(tmp_path / "model.npz")
    assert main([src, dst, "--n-heads", str(H)]) == 0
    out = capsys.readouterr().out
    assert "dropped 4" in out
    from ditto_spark.operators.npmodel import load_checkpoint

    assert "_config" in load_checkpoint(dst)
