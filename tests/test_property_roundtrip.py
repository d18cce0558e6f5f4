"""Hypothesis property test for the serialization round-trip invariant
(BASELINE.json input_hint): for ANY span sequence whose texts avoid the
literal COL/VAL markers, serialize -> parse recovers (kind, text,
media_ref, order) exactly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ditto_spark.operators.serialize import MEDIA_TOKEN, _parse_one

# token alphabet that cannot collide with the markers or media token
word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1,
               max_size=8)
text_value = st.lists(word, min_size=1, max_size=5).map(" ".join)
kind = st.sampled_from(["name", "address", "brand", "price", "id", "body"])


@st.composite
def span(draw):
    k = draw(kind)
    if draw(st.booleans()) and k == "id":
        return (k, "", f"img://b/{draw(word)}", None)
    return (k, draw(text_value), None, None)


def _serialize_py(spans):
    """Reference-shape local serializer (mirrors serialize_spans with
    drop_empty, matcher.py:51-60 semantics)."""
    parts = []
    for k, t, m, _ in spans:
        if m is not None:
            parts.append(f"COL {k} VAL {MEDIA_TOKEN} {m}")
        elif t.strip():
            parts.append(f"COL {k} VAL {t.strip()}")
    return " ".join(parts)


@settings(max_examples=200, deadline=None)
@given(st.lists(span(), min_size=0, max_size=8))
def test_roundtrip_property(spans):
    ser = _serialize_py(spans)
    parsed = _parse_one(ser)
    expected = [
        (k, "" if m is not None else t.strip(), m)
        for k, t, m, _ in spans
        if m is not None or t.strip()
    ]
    got = [(k, t, m) for k, t, m, _ in parsed]
    assert got == expected
    # offsets are the dense 0..n-1 order
    assert [o for _, _, _, o in parsed] == list(range(len(parsed)))
