"""Independent single-node implementation of the reference decision
pipeline, written against the SPEC (reference file:line cited), not
against ditto_spark code. Used as the oracle for the F1>=0.99 gate:
if the engine and this module drift apart, the gate fails even though
both 'pass their own tests'.

Spec points implemented:
  serialization  COL <kind> VAL <value>, order by offset, skip blank,
                 media refs as '[MEDIA] <ref>' typed tokens
                 (matcher.py:51-60 + input_hint media rule)
  dk injection   ints -> 'NUM %d', floats -> 'NUM %.2f', long alnum
                 mixes -> 'ID <tok>' (knowledge.py:91-103)
  scoring        p1 = sigmoid(14*jaccard + 4*containment + len_ratio - 8)
                 over value tokens; decision p1 > threshold; confidence
                 of the predicted class (matcher.py:108-115, 155-159,
                 surrogate spec in operators/scoring.py docstring)
"""

from __future__ import annotations

import math
import re


def serialize(spans: list[dict]) -> str:
    parts = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s.get("media_ref"):
            parts.append(f"COL {s['kind']} VAL [MEDIA] {s['media_ref']}")
        else:
            t = (s.get("text") or "").strip()
            if t:
                parts.append(f"COL {s['kind']} VAL {t}")
    return " ".join(parts)


_INT = re.compile(r"^[-+]?\d+$")
_FLOAT = re.compile(r"^[-+]?\d*\.\d+$")
_IDSHAPE = re.compile(r"^[A-Za-z0-9\-]{8,}$")


def dk_inject(text: str) -> str:
    out = []
    for t in text.split():
        if _INT.match(t):
            out.append(f"NUM {int(t)}")
        elif _FLOAT.match(t):
            out.append(f"NUM {float(t):.2f}")
        elif (_IDSHAPE.match(t) and re.search(r"[A-Za-z]", t)
              and re.search(r"\d", t)):
            out.append(f"ID {t}")
        else:
            out.append(t)
    return " ".join(out)


def value_tokens(text: str) -> set[str]:
    toks = text.lower().split()
    out, skip = set(), False
    for t in toks:
        if t == "col":
            skip = True
        elif t == "val":
            continue
        elif skip:
            skip = False
        else:
            out.add(t)
    return out


def p_match(left: str, right: str) -> float:
    a, b = value_tokens(left), value_tokens(right)
    if not a or not b:
        return 0.02
    inter = len(a & b)
    jac = inter / len(a | b)
    cont = inter / min(len(a), len(b))
    lr = min(len(a), len(b)) / max(len(a), len(b))
    return 1.0 / (1.0 + math.exp(-(14.0 * jac + 4.0 * cont + lr - 8.0)))


def decide(left: str, right: str, threshold: float = 0.5) -> tuple[int, float]:
    p = p_match(left, right)
    match = int(p > threshold)
    return match, (p if match else 1.0 - p)
