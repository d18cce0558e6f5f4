"""Custom stateful streaming operator: running per-source ingest stats.

Demonstrates the applyInPandasWithState path (the Structured-Streaming
analog of the reference's nothing — it is batch-only, SURVEY.md §2.8):
for each document source key, maintain running (docs_total,
distinct-ish content fingerprint count) across micro-batches. State is a
bounded sketch (a set of 64-bit content hashes capped at `max_hashes`,
degrading to a counter) so per-key state cannot grow unboundedly.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("source string, docs_total long, approx_distinct long")
STATE_SCHEMA = "docs long, hashes array<long>"
MAX_HASHES = 10_000


def _update(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        docs, hashes = state.get
        seen = set(hashes)
    else:
        docs, seen = 0, set()
    for pdf in pdfs:
        docs += len(pdf)
        if len(seen) < MAX_HASHES:
            seen.update(int(h) for h in pdf["text_hash"])
    state.update((docs, list(seen)[:MAX_HASHES]))
    yield pd.DataFrame(
        {"source": [key[0]], "docs_total": [docs],
         "approx_distinct": [len(seen)]}
    )


def running_source_stats(docs: DataFrame) -> DataFrame:
    """stream of (source, text, ingest_ts) -> updating per-source stats."""
    hashed = docs.select(
        "source",
        F.xxhash64("text").alias("text_hash"),
    )
    return hashed.groupBy("source").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
