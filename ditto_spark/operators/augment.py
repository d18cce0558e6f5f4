"""Training-data augmentation over COL/VAL token streams (SURVEY.md M6).

Re-creates the reference's operator set (ditto_light/augment.py:13-231;
op table README.md:66-77) as deterministic, seed-stable batch functions:

  del        delete a random value span           augment.py:35-52
  drop_col   remove one COL..VAL.. attribute      augment.py:55-75
  append_col move one attribute's value into another  augment.py:78-105
  swap       swap two tokens in a value           augment.py:108-125
  drop_token delete a random non-marker token     augment.py:128-139
  drop_len   delete the longest token             augment.py:142-151
  drop_sym   strip symbols from tokens            augment.py:154-158
  drop_same  delete tokens present on both sides  augment.py:161-183 (:96)
  ins        duplicate a random token             augment.py:186-187
  all        RandAugment: N=3 random ops          augment.py:222-227
  pair flip  50% swap left/right                  augment.py:203-206

Determinism: the reference seeds a global RNG; here every decision is a
pure function of (seed, pair_id, op) so results are identical across
partitionings and re-runs. Execution is an Arrow-batched mapInPandas —
augmentation is a training-data pipeline stage, not a per-row UDF chain.
"""

from __future__ import annotations

import random
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OPS = ["del", "drop_col", "append_col", "swap", "drop_token", "drop_len",
       "drop_sym", "drop_same", "ins"]


def _attrs(text: str) -> list[tuple[str, list[str]]]:
    """Parse COL/VAL stream to [(attr, value_tokens)] preserving order."""
    out: list[tuple[str, list[str]]] = []
    toks = text.split()
    i = 0
    while i < len(toks):
        if toks[i] == "COL" and i + 2 < len(toks) and toks[i + 2] == "VAL":
            attr = toks[i + 1]
            j = i + 3
            vals = []
            while j < len(toks) and toks[j] != "COL":
                vals.append(toks[j])
                j += 1
            out.append((attr, vals))
            i = j
        else:  # malformed tail: treat as an anonymous value
            out.append(("", toks[i:]))
            break
    return out


def _emit(attrs: list[tuple[str, list[str]]]) -> str:
    return " ".join(
        " ".join(["COL", a, "VAL", *v]) if a else " ".join(v)
        for a, v in attrs
    )


def augment_one(text: str, other: str, op: str, rng: random.Random) -> str:
    """One op applied to `text` (`other` is the pair's opposite side, used
    by drop_same). Pure given (text, other, op, rng state)."""
    attrs = _attrs(text)
    if not attrs:
        return text
    if op == "del":
        k = rng.randrange(len(attrs))
        attrs[k] = (attrs[k][0], [])
        return _emit(attrs)
    if op == "drop_col":
        k = rng.randrange(len(attrs))
        del attrs[k]
        return _emit(attrs) if attrs else text
    if op == "append_col":
        if len(attrs) < 2:
            return text
        src = rng.randrange(len(attrs))
        dst = rng.randrange(len(attrs) - 1)
        dst = dst if dst < src else dst + 1
        attrs[dst] = (attrs[dst][0], attrs[dst][1] + attrs[src][1])
        attrs[src] = (attrs[src][0], [])
        return _emit(attrs)
    if op == "swap":
        k = rng.randrange(len(attrs))
        vals = attrs[k][1]
        if len(vals) >= 2:
            i = rng.randrange(len(vals) - 1)
            vals[i], vals[i + 1] = vals[i + 1], vals[i]
        return _emit(attrs)
    if op == "drop_token":
        k = rng.randrange(len(attrs))
        vals = attrs[k][1]
        if vals:
            del vals[rng.randrange(len(vals))]
        return _emit(attrs)
    if op == "drop_len":
        all_vals = [(ai, vi) for ai, (a, v) in enumerate(attrs)
                    for vi in range(len(v))]
        if not all_vals:
            return text
        ai, vi = max(all_vals, key=lambda p: (len(attrs[p[0]][1][p[1]]),
                                              -p[0], -p[1]))
        del attrs[ai][1][vi]
        return _emit(attrs)
    if op == "drop_sym":
        return " ".join(
            re.sub(r"[^\w\s]", "", t) if t not in ("COL", "VAL") and t else t
            for t in text.split()
        )
    if op == "drop_same":
        other_tokens = set(other.split()) - {"COL", "VAL"}
        for a, v in attrs:
            other_tokens.discard(a)
        new = [(a, [t for t in v if t not in other_tokens])
               for a, v in attrs]
        return _emit(new)
    if op == "ins":
        k = rng.randrange(len(attrs))
        vals = attrs[k][1]
        if vals:
            i = rng.randrange(len(vals))
            vals.insert(i, vals[i])
        return _emit(attrs)
    raise ValueError(f"unknown op {op}")


def augment_pairs(
    pairs: DataFrame,
    op: str = "all",
    seed: int = 42,
    flip: bool = True,
) -> DataFrame:
    """(pair_id, left_text, right_text, ...) -> same schema, augmented.

    op='all' applies RandAugment N=3 (augment.py:222-227); flip swaps
    sides with p=0.5 (augment.py:203-206). Every random draw is seeded by
    (seed, pair_id) — partition-independent determinism the reference's
    global RNG does not have.
    """
    schema = pairs.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lefts, rights = [], []
            for pid, lt, rt in zip(pdf["pair_id"], pdf["left_text"],
                                   pdf["right_text"]):
                rng = random.Random(f"{seed}|{pid}")
                ops = ([rng.choice(OPS) for _ in range(3)] if op == "all"
                       else [op])
                l, r = lt or "", rt or ""
                for o in ops:
                    l = augment_one(l, r, o, rng)
                if flip and rng.random() < 0.5:
                    l, r = r, l
                lefts.append(l)
                rights.append(r)
            pdf = pdf.assign(left_text=lefts, right_text=rights)
            yield pdf

    return pairs.mapInPandas(run, schema)
