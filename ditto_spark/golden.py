"""Golden-hash content gates for driver entries without a SQL oracle.

Two ``__spark_entry__.queries()`` entries are not expressible as one
DuckDB query (``er_pipeline_matches``: multi-pass LSH blocking with
Spark's xxhash64; ``er_model_scores``: the numpy transformer
cross-encoder through mapInPandas), so the driver's oracle compare can
only record a rows-only check for them. Both are fully DETERMINISTIC
(frozen seed-0 weights, fixed hash families), so this module closes the
content gap: each entry verifies its own result against a committed
golden value-hash before returning, and RAISES on any content drift —
turning the driver's rows-only record into a hard content assertion
(a wrong answer can no longer run green).

The canonical hash matches ``tools/check_correctness.py`` exactly
(sorted columns, floats rounded to 9, order-insensitive row sort, md5),
so a golden equals what the oracle compare would have hashed. Goldens
are committed per scale-factor directory in ``golden_hashes.json``;
regenerate with ``tools/make_golden.py`` after an INTENTIONAL semantic
change (the tool refuses to run with a dirty operator tree rationale —
see its docstring). Gates fire only at the small correctness scales
(sf0.001/sf0.01); bench/production scale factors have no golden and
pass through untouched, so the verification collect never taxes a real
run.
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
from pyspark.sql import DataFrame

GOLDEN_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden_hashes.json")

_GOLDENS_CACHE: dict | None = None


def canon_pandas(df: pd.DataFrame) -> tuple[int, list[str], str]:
    """(row count, sorted columns, order-insensitive md5 of values) —
    bit-identical to the driver-side compare in
    tools/check_correctness.py::canon."""
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                df[c] = s.dt.tz_localize(None)
            except TypeError:
                df[c] = s.dt.tz_convert("UTC").dt.tz_localize(None)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(df), cols, h


def load_goldens() -> dict:
    """{entry_name: {sf_basename: {"hash": ..., "rows": ...}}}; empty if
    the file does not exist (gates become no-ops — e.g. a fresh clone
    before the first make_golden run)."""
    global _GOLDENS_CACHE
    if _GOLDENS_CACHE is None:
        if os.path.exists(GOLDEN_FILE):
            with open(GOLDEN_FILE) as f:
                _GOLDENS_CACHE = json.load(f)
        else:
            _GOLDENS_CACHE = {}
    return _GOLDENS_CACHE


def content_gate(df: DataFrame, name: str, sf_dir: str) -> DataFrame:
    """Verify ``df``'s content against the committed golden for
    (``name``, basename of ``sf_dir``); raise AssertionError on drift,
    pass through silently when no golden exists for this scale.

    The gate collects the result once (both gated entries are small at
    the correctness scales: ~1k rows) and returns the ORIGINAL lazy
    DataFrame, so the caller's schema is untouched."""
    key = os.path.basename(os.path.normpath(sf_dir))
    expected = load_goldens().get(name, {}).get(key)
    if expected is None:
        return df
    n, cols, h = canon_pandas(df.toPandas())
    if n != expected["rows"] or h != expected["hash"]:
        raise AssertionError(
            f"golden content gate FAILED for {name} at {key}: "
            f"rows {n} vs {expected['rows']}, "
            f"value-hash {h} vs {expected['hash']} — the entry's content "
            "drifted from the committed golden (tools/make_golden.py "
            "regenerates after an intentional semantic change)")
    return df
