"""Portable deterministic hashing used across blocking / dedup / fingerprint.

The reference hashes implicitly (Python dict/set, numpy argpartition); we
need hashes that are (a) stable across partitionings and runs, and
(b) reproducible by an external SQL oracle (DuckDB). ``xxhash64``/``hash``
differ between engines, so the engine-portable primitive is:

    porthash(s) = bigint(first 15 hex chars of md5(s))   # 60 bits

Spark:  conv(substring(md5(s), 1, 15), 16, 10) :: bigint
DuckDB: ('0x' || substr(md5(s), 1, 15)) :: bigint

Seeded family: porthash_seed(s, i) = porthash(i || '#' || s) — the moral
equivalent of the reference blocker's independent similarity spaces
(blocking/blocker.py:43-80 uses learned embeddings; we use hash families
for the LSH path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def porthash(col: Column) -> Column:
    """60-bit portable hash of a string column (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def porthash_seed(col: Column, seed: int) -> Column:
    return porthash(F.concat(F.lit(f"{seed}#"), col))


def porthash_sql(expr: str) -> str:
    """DuckDB rendering of porthash for oracle SQL."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def porthash_seed_sql(expr: str, seed: int) -> str:
    return porthash_sql(f"'{seed}#' || {expr}")
