"""Single-node oracle for the numpy cross-encoder gate.

Independent re-implementation of the forward contract (same architecture
and weights as ditto_spark.operators.npmodel, written separately: einsum
attention, per-head loops, and — critically — each pair scored ALONE
with NO padding). If the distributed path's padding mask, batching, or
ordering is wrong, the two disagree and the F1 gate fails. Mirrors the
role of the reference matcher's single-process predict
(/root/reference/matcher.py:73-116) as the decision ground truth.
"""

from __future__ import annotations

import numpy as np

from ditto_spark.operators.npmodel import tokenize_pair


def _ln(x, g, b):
    m = x.mean(axis=-1, keepdims=True)
    s = x.std(axis=-1, keepdims=True)  # population std, ddof=0 == var
    return (x - m) / np.sqrt(s * s + 1e-5) * g + b


def _gelu(x):
    c = np.sqrt(2.0 / np.pi)
    return x * 0.5 * (np.tanh(c * (x + 0.044715 * x * x * x)) + 1.0)


def score_one(left: str, right: str, w: dict) -> float:
    """P(match) for ONE pair, unpadded full-attention forward."""
    cfg = [int(v) for v in np.asarray(w["_config"])]
    vocab, d, n_heads, _, n_layers, max_len = cfg
    ids = np.array(tokenize_pair(left, right, vocab, max_len))
    T = len(ids)
    x = (np.asarray(w["bert.embeddings.word_embeddings.weight"])[ids]
         + np.asarray(w["bert.embeddings.position_embeddings.weight"])[:T])
    x = _ln(x, w["bert.embeddings.LayerNorm.weight"],
            w["bert.embeddings.LayerNorm.bias"])
    hd = d // n_heads
    for i in range(n_layers):
        p = f"bert.encoder.layer.{i}."
        q = np.einsum("td,ed->te", x, np.asarray(w[p + "attention.q.weight"]))
        k = np.einsum("td,ed->te", x, np.asarray(w[p + "attention.k.weight"]))
        v = np.einsum("td,ed->te", x, np.asarray(w[p + "attention.v.weight"]))
        ctx = np.zeros_like(x)
        for h in range(n_heads):
            sl = slice(h * hd, (h + 1) * hd)
            a = q[:, sl] @ k[:, sl].T / np.sqrt(hd)
            a = a - a.max(axis=1, keepdims=True)
            a = np.exp(a)
            a = a / a.sum(axis=1, keepdims=True)
            ctx[:, sl] = a @ v[:, sl]
        ctx = np.einsum("ti,oi->to", ctx,
                        np.asarray(w[p + "attention.out.weight"]))
        x = _ln(x + ctx, w[p + "attention.LayerNorm.weight"],
                w[p + "attention.LayerNorm.bias"])
        f = _gelu(x @ np.asarray(w[p + "ffn.in.weight"]).T
                  + np.asarray(w[p + "ffn.in.bias"]))
        f = f @ np.asarray(w[p + "ffn.out.weight"]).T \
            + np.asarray(w[p + "ffn.out.bias"])
        x = _ln(x + f, w[p + "ffn.LayerNorm.weight"],
                w[p + "ffn.LayerNorm.bias"])
    cls = x[0]
    logits = cls @ np.asarray(w["fc.weight"]).T + np.asarray(w["fc.bias"])
    e = np.exp(logits - logits.max())
    return float((e / e.sum())[1])
