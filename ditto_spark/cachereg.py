"""Operator-cache registry, scoped per owner.

Blocking operators cache their self-join inputs (the bucket/ranked tables
feed both sides of a join); Spark never auto-unpersists those. Releasing
them with ``spark.catalog.clearCache()`` would also drop caches owned by
the caller or by concurrent pipelines in the same session, so operators
register the frames they cache here and cleanup paths unpersist exactly
the frames of their OWN scope — nothing else in the session is touched.

Scoping: ``cache_scope()`` opens an ownership scope (a ``ContextVar``, so
concurrent pipeline runs in different threads — and any async context —
get independent scopes). ``cache_registered`` records into the current
scope; ``release_registered()`` releases only the current scope's frames.
Registrations made outside any scope land in a shared default scope,
released by ``release_registered`` when no scope is active or wholesale
by ``release_all()`` (``session.clear_operator_caches``).

Why this matters beyond recomputation cost: ``global_rank`` freezes
driver-collected per-partition offsets over its cached ranked table —
if another pipeline's cleanup unpersists that cache mid-flight, the
recomputed partitioning can disagree with the frozen offsets and yield
duplicate/missing ranks.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar

from pyspark.sql import DataFrame

_DEFAULT_SCOPE = "_default"
_SCOPES: dict[object, list[DataFrame]] = {_DEFAULT_SCOPE: []}
_CURRENT: ContextVar[object] = ContextVar("ditto_cache_scope",
                                          default=_DEFAULT_SCOPE)


@contextmanager
def cache_scope():
    """Own every ``cache_registered`` call made inside the block; release
    of this scope cannot touch frames registered by concurrent runs."""
    token_obj = object()
    _SCOPES[token_obj] = []
    cv_token = _CURRENT.set(token_obj)
    try:
        yield token_obj
    finally:
        _CURRENT.reset(cv_token)
        _release(token_obj)
        _SCOPES.pop(token_obj, None)


def cache_registered(df: DataFrame) -> DataFrame:
    """Cache ``df`` and record it in the current ownership scope."""
    out = df.cache()
    _SCOPES.setdefault(_CURRENT.get(), []).append(out)
    return out


def _release(scope: object) -> int:
    frames = _SCOPES.get(scope, [])
    n = 0
    while frames:
        df = frames.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session may already be stopped
    return n


def release_registered() -> int:
    """Unpersist the CURRENT scope's operator caches; returns how many.
    Outside any ``cache_scope`` this releases the shared default scope."""
    return _release(_CURRENT.get())


def release_all() -> int:
    """Unpersist every registered cache in every scope — the big hammer
    for ``clear_operator_caches`` between independent runs."""
    return sum(_release(s) for s in list(_SCOPES))
