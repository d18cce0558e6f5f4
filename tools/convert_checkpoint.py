"""Convert a reference Ditto matcher checkpoint into the engine's .npz
layout (VERDICT r5 #5).

The reference trains a ``DittoModel`` whose encoder attribute is named
``bert`` (ditto_light/ditto.py:24-35) and saves
``{'model': state_dict, 'optimizer': ..., ...}`` (ditto.py:227-239), so
the state dict carries HF-transformers internals under a ``bert.``
prefix plus the ``fc.*`` classification head. This tool maps those keys
into the layout ``ditto_spark.operators.npmodel.load_checkpoint``
validates and ``NumpyCrossEncoder`` executes:

  bert.embeddings.{word,position}_embeddings.weight      (unchanged)
  bert.embeddings.LayerNorm.{weight,bias}                (unchanged)
  bert.encoder.layer.N.attention.self.query.{weight,bias}
      -> bert.encoder.layer.N.attention.q.{weight,bias}  (k/v alike)
  bert.encoder.layer.N.attention.output.dense.{weight,bias}
      -> ...attention.out.{weight,bias}
  bert.encoder.layer.N.attention.output.LayerNorm.*
      -> ...attention.LayerNorm.*
  bert.encoder.layer.N.intermediate.dense.* -> ...ffn.in.*
  bert.encoder.layer.N.output.dense.*       -> ...ffn.out.*
  bert.encoder.layer.N.output.LayerNorm.*   -> ...ffn.LayerNorm.*
  fc.{weight,bias}                                       (unchanged)

``_config`` is derived from the mapped shapes (vocab/d_model from the
word-embedding table, d_ff from the first FFN, layer count from the max
layer index, max_len from the position table after ``--pos-offset``).

Dropped keys are RETURNED, never silently ignored: token-type
embeddings (the engine's hash tokenizer emits no segment ids; RoBERTa's
table is a single ~zero row), the pooler (Ditto pools raw CLS from
last_hidden_state, ditto.py:52-57 — the pooler never runs), and
non-parameter buffers (position_ids). Any OTHER unmapped key raises —
an unrecognized encoder family must fail loudly, not score with half
its weights.

Known approximation in-sandbox: scores of a converted REAL checkpoint
still go through the engine's hash tokenizer (P10 — the HF tokenizer is
env-blocked), so they are not bit-equal to torch inference; the weight
mapping itself is exact, including every projection bias
(NumpyCrossEncoder honors optional ``attention.*.bias`` keys).

Offline usage (wherever torch exists — only torch.load happens there):

    python tools/convert_checkpoint.py model.pt model.npz \
        [--n-heads 12] [--pos-offset 2]

``--pos-offset 2`` matches RoBERTa's position-id convention (ids start
at padding_idx+1 = 2); BERT-family checkpoints use 0.

In-sandbox the same ``convert_state`` runs on any dict of numpy arrays
(tests feed a synthetic reference-layout state — no torch needed).
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ditto_spark.operators.scoring import (partition_ditto_state,  # noqa: E402
                                           unwrap_checkpoint_state)

# suffix map within one encoder layer (HF BERT/RoBERTa internals)
_LAYER_MAP = {
    "attention.self.query.weight": "attention.q.weight",
    "attention.self.query.bias": "attention.q.bias",
    "attention.self.key.weight": "attention.k.weight",
    "attention.self.key.bias": "attention.k.bias",
    "attention.self.value.weight": "attention.v.weight",
    "attention.self.value.bias": "attention.v.bias",
    "attention.output.dense.weight": "attention.out.weight",
    "attention.output.dense.bias": "attention.out.bias",
    "attention.output.LayerNorm.weight": "attention.LayerNorm.weight",
    "attention.output.LayerNorm.bias": "attention.LayerNorm.bias",
    "intermediate.dense.weight": "ffn.in.weight",
    "intermediate.dense.bias": "ffn.in.bias",
    "output.dense.weight": "ffn.out.weight",
    "output.dense.bias": "ffn.out.bias",
    "output.LayerNorm.weight": "ffn.LayerNorm.weight",
    "output.LayerNorm.bias": "ffn.LayerNorm.bias",
}

_PASSTHROUGH = {
    "bert.embeddings.word_embeddings.weight",
    "bert.embeddings.position_embeddings.weight",
    "bert.embeddings.LayerNorm.weight",
    "bert.embeddings.LayerNorm.bias",
    "fc.weight",
    "fc.bias",
}

# keys a faithful conversion legitimately drops (see module docstring).
# token_type_embeddings is NOT dropped blindly: Ditto calls
# self.bert(x) with token_type_ids=None, so HF adds token-type row 0 to
# EVERY position — for BERT-family checkpoints that row is trained and
# non-zero. convert_state folds row 0 into the position-embedding table
# (exact equivalence at zero runtime cost) and only then records the
# key as dropped (ADVICE r6).
_DROP_PATTERNS = [
    re.compile(r"^bert\.pooler\."),
    re.compile(r"position_ids$"),
]

_TOKEN_TYPE_KEY = "bert.embeddings.token_type_embeddings.weight"

_LAYER_RE = re.compile(r"^bert\.encoder\.layer\.(\d+)\.(.+)$")


def convert_state(sd: dict, n_heads: int | None = None,
                  pos_offset: int = 0,
                  encoder_only: bool = False) -> tuple[dict, list[str]]:
    """Reference-layout state dict (torch tensors or numpy arrays) ->
    (npz-layout weights incl. ``_config``, dropped key list). Raises on
    any unrecognized key or underivable config.

    ``encoder_only=True`` converts a HEADLESS encoder (a
    sentence-transformer blocker, train_blocker.py:32-91): bare HF keys
    (``embeddings.*``/``encoder.layer.*``) are accepted and prefixed
    with ``bert.``, the fc.* requirement is waived, and a ZERO 2-class
    head is minted so ``load_checkpoint``'s layout validation still
    passes — ``NumpySentenceEncoder`` never reads it."""
    sd = unwrap_checkpoint_state(sd)
    if encoder_only:
        if not any(k.startswith("bert.") for k in sd):
            sd = {f"bert.{k}": v for k, v in sd.items()}
    else:
        partition_ditto_state(sd)  # fail loudly on a non-matcher layout
    out: dict = {}
    dropped: list[str] = []
    token_type: "np.ndarray | None" = None
    max_layer = -1
    for key, val in sd.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        if key == _TOKEN_TYPE_KEY:
            token_type = arr.astype(np.float32)
            continue
        if key in _PASSTHROUGH:
            out[key] = arr.astype(np.float32)
            continue
        m = _LAYER_RE.match(key)
        if m:
            idx, suffix = int(m.group(1)), m.group(2)
            if suffix not in _LAYER_MAP:
                raise ValueError(
                    f"unrecognized encoder-layer key {key!r} — unknown "
                    "encoder family; refusing a partial conversion")
            max_layer = max(max_layer, idx)
            out[f"bert.encoder.layer.{idx}.{_LAYER_MAP[suffix]}"] = \
                arr.astype(np.float32)
            continue
        if any(p.search(key) for p in _DROP_PATTERNS):
            dropped.append(key)
            continue
        raise ValueError(
            f"unrecognized checkpoint key {key!r} — unknown encoder "
            "family; refusing a partial conversion")
    if max_layer < 0:
        raise ValueError("no encoder layers found")
    we = out["bert.embeddings.word_embeddings.weight"]
    if encoder_only and "fc.weight" not in out:
        # zero head satisfies load_checkpoint's layout validation; the
        # sentence encoder never reads it
        out["fc.weight"] = np.zeros((2, we.shape[1]), np.float32)
        out["fc.bias"] = np.zeros(2, np.float32)
    pe = out["bert.embeddings.position_embeddings.weight"]
    if pos_offset:
        pe = pe[pos_offset:]
    if token_type is not None:
        # fold: with token_type_ids=None HF adds token-type row 0 at
        # every position, so pos_emb' = pos_emb + tt[0] reproduces the
        # torch embedding sum exactly up to float32 associativity
        # (HF computes (word+tt)+pos; one ≤1-ulp reassociation) —
        # versus silently dropping a trained non-zero vector, the
        # divergence ADVICE r6 flagged. Recorded as dropped only AFTER
        # folding.
        pe = pe + token_type[0]
        dropped.append(_TOKEN_TYPE_KEY + " (row 0 folded into "
                       "position embeddings)")
    out["bert.embeddings.position_embeddings.weight"] = pe
    vocab, d_model = we.shape
    d_ff = out["bert.encoder.layer.0.ffn.in.weight"].shape[0]
    if n_heads is None:
        # HF convention: 64-dim heads (bert/roberta/distilbert alike)
        n_heads = max(1, d_model // 64)
    if d_model % n_heads:
        raise ValueError(f"n_heads={n_heads} does not divide "
                         f"d_model={d_model}; pass --n-heads explicitly")
    out["_config"] = np.array([vocab, d_model, n_heads, d_ff,
                               max_layer + 1, pe.shape[0]])
    return out, dropped


def main(argv: list[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", help=".pt (torch present) or .npz/.npy dict")
    ap.add_argument("dst", help="output .npz path")
    ap.add_argument("--n-heads", type=int, default=None)
    ap.add_argument("--pos-offset", type=int, default=0,
                    help="2 for RoBERTa-family position ids, 0 for BERT")
    ap.add_argument("--encoder-only", action="store_true",
                    help="convert a headless sentence-transformer "
                         "encoder (blocker) — bare HF keys accepted, "
                         "zero classification head minted")
    args = ap.parse_args(argv)

    if args.src.endswith(".npz"):
        with np.load(args.src, allow_pickle=False) as z:
            sd = {k: z[k] for k in z.files}
    else:
        import torch  # offline conversion box only

        sd = torch.load(args.src, map_location="cpu", weights_only=True)
    weights, dropped = convert_state(sd, n_heads=args.n_heads,
                                     pos_offset=args.pos_offset,
                                     encoder_only=args.encoder_only)
    from ditto_spark.operators.npmodel import load_checkpoint, save_checkpoint

    save_checkpoint(weights, args.dst)
    load_checkpoint(args.dst)  # self-check: the consumer validates it
    cfg = [int(x) for x in weights["_config"]]
    print(f"wrote {args.dst}: vocab={cfg[0]} d={cfg[1]} heads={cfg[2]} "
          f"ff={cfg[3]} layers={cfg[4]} max_len={cfg[5]}; "
          f"dropped {len(dropped)} non-inference keys: {dropped}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
