"""Operator-cache registry.

Blocking operators cache their self-join inputs (the bucket/ranked tables
feed both sides of a join); Spark never auto-unpersists those. Releasing
them with ``spark.catalog.clearCache()`` would also drop caches owned by
the caller or by concurrent pipelines in the same session, so operators
register the frames they cache here and cleanup paths unpersist exactly
those — nothing else in the session is touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_REGISTRY: list[DataFrame] = []


def cache_registered(df: DataFrame) -> DataFrame:
    """Cache ``df`` and record it for scoped release."""
    out = df.cache()
    _REGISTRY.append(out)
    return out


def release_registered() -> int:
    """Unpersist every operator-registered cache; returns how many."""
    n = 0
    while _REGISTRY:
        df = _REGISTRY.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session may already be stopped
    return n
