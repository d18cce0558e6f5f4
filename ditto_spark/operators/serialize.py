"""COL/VAL serialization — the engine's core row transform (P1-P6).

Reference semantics (all /root/reference):
  * dict/row -> ``COL <attr> VAL <value> ...``, values str().strip()'ed,
    NaN/empty attrs skipped: matcher.py:51-60, hive_data_extractor.py:95-113,
    csv_to_matching_format.py:24-45, create_dataset.py:150-156.
  * ``tablename.column`` prefix stripping: hive_data_extractor.py:101-107.
  * production (``*_left``/``*_right``) vs testing layout auto-detect:
    hive_ditto_standalone.py:68-115; split: :117-164.

Spark-first design: serialization is a single native column expression
(transform + concat_ws) that whole-stage-codegens — zero Python in the hot
path. Media spans are injected as typed tokens (``[MEDIA] <ref>``), the
interleaved-media analog of DK's PRODUCT/NUM/ID tokens
(ditto_light/knowledge.py:78-105).

The parse direction (round-trip invariant from BASELINE.json input_hint)
is a vectorized pandas UDF — it is a test/lineage utility, not on the
query hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ditto_spark.schema import SPAN_TYPE

MEDIA_TOKEN = "[MEDIA]"


def span_value(s: Column) -> Column:
    """Value part of one span: media spans become typed tokens."""
    return F.when(
        s["media_ref"].isNotNull(),
        F.concat(F.lit(MEDIA_TOKEN + " "), s["media_ref"]),
    ).otherwise(F.trim(F.coalesce(s["text"], F.lit(""))))


def serialize_spans(spans: Column, drop_empty: bool = False) -> Column:
    """spans array -> one COL/VAL string, preserving span order.

    drop_empty=True reproduces the reference's skip-NaN/blank behavior
    (matcher.py:53-57); drop_empty=False keeps empty values so the
    round-trip parse recovers the exact span sequence.
    """
    ordered = F.array_sort(
        F.transform(
            spans,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    if drop_empty:
        ordered = F.filter(
            ordered,
            lambda s: s["media_ref"].isNotNull()
            | (F.trim(F.coalesce(s["text"], F.lit(""))) != F.lit("")),
        )
    return F.concat_ws(
        " ",
        F.transform(
            ordered,
            lambda s: F.concat(
                F.lit("COL "), s["kind"], F.lit(" VAL"),
                F.when(span_value(s) != F.lit(""),
                       F.concat(F.lit(" "), span_value(s))
                       ).otherwise(F.lit("")),
            ),
        ),
    )


def serialize_docs(docs: DataFrame, out_col: str = "text",
                   drop_empty: bool = False) -> DataFrame:
    """(doc_id, spans) -> (doc_id, spans, <out_col>)."""
    return docs.withColumn(out_col, serialize_spans(F.col("spans"), drop_empty))


def _parse_one(text: str) -> list:
    """Inverse of serialize_spans (exact for values not containing the
    literal markers 'COL '/' VAL' — same ambiguity the reference format
    has, README.md:28-32)."""
    spans = []
    if not text:
        return spans
    parts = text.split("COL ")
    off = 0
    for part in parts:
        if not part.strip():
            continue
        if " VAL" not in part:
            continue
        kind, _, val = part.partition(" VAL")
        val = val.strip()
        if val.startswith(MEDIA_TOKEN):
            media_ref = val[len(MEDIA_TOKEN):].strip()
            spans.append((kind.strip(), "", media_ref, off))
        else:
            spans.append((kind.strip(), val, None, off))
        off += 1
    return spans


@F.pandas_udf(ArrayType(SPAN_TYPE))
def parse_serialized(texts: pd.Series) -> pd.Series:
    """Vectorized COL/VAL parser (round-trip invariant utility)."""
    return texts.map(_parse_one)


# ---------------------------------------------------------------------------
# Flat relational tables -> COL/VAL (the Hive ingestion path)
# ---------------------------------------------------------------------------

def strip_column_prefixes(df: DataFrame) -> DataFrame:
    """``tablename.column`` -> ``column`` (hive_data_extractor.py:101-107)."""
    renames = {c: c.split(".", 1)[1] for c in df.columns if "." in c}
    return df.withColumnsRenamed(renames) if renames else df


def detect_layout(df: DataFrame) -> str:
    """'production' if paired *_left/*_right columns cover a common field
    set, else 'testing' (hive_ditto_standalone.py:68-115)."""
    cols = df.columns
    lefts = {c[:-5] for c in cols if c.endswith("_left")}
    rights = {c[:-6] for c in cols if c.endswith("_right")}
    return "production" if lefts & rights else "testing"


def serialize_flat(df: DataFrame, attr_cols: list[str],
                   out_col: str = "text") -> Column | DataFrame:
    """Flat columns -> COL/VAL string; skips null/blank values per column
    (matcher.py:53-57 skip semantics) as one codegen'd expression."""
    pieces = [
        F.when(
            F.trim(F.coalesce(F.col(c).cast("string"), F.lit(""))) != "",
            F.concat(F.lit(f"COL {c} VAL "),
                     F.trim(F.col(c).cast("string"))),
        )
        for c in attr_cols
    ]
    return df.withColumn(out_col, F.concat_ws(" ", *pieces))


def _with_content_rid(out: DataFrame, content: Column) -> DataFrame:
    """Append a deterministic content-hash row id ``_rid``.

    monotonically_increasing_id() is partition-dependent — ids would not
    be stable across recomputations/reruns, breaking joins against
    previously persisted output.

    Width + duplicates: a single 60-bit porthash makes distinct-content
    birthday collisions likely near ~10^9 rows and silently collapses
    duplicate input rows to one id. Two seeded porthashes give ~120 bits
    (collision-safe past 10^15 rows), and a row_number within each hash
    disambiguates equal-content rows — duplicate rows are
    interchangeable, so the *multiset* of ids stays deterministic across
    partitionings even though which physical row takes which suffix is
    arbitrary.

    Shuffle shape: a window over every row would shuffle the WIDE
    content just to suffix the rare duplicate rows. Instead aggregate
    the NARROW hash column to find duplicated hashes (usually a tiny
    set -> broadcast), leave unique-content rows untouched (suffix '-1'
    in place), and run the row_number window only over the duplicate
    subset."""
    from pyspark.sql import Window

    from ditto_spark.cachereg import cache_registered
    from ditto_spark.operators.hashing import porthash_seed

    h = F.concat_ws(
        "", porthash_seed(content, 1).cast("string"),
        F.lit("x"), porthash_seed(content, 2).cast("string"))
    # cache the hashed projection: three consumers below (dup_hashes
    # aggregation, left_anti, left_semi) would otherwise each re-run
    # the full input scan + the double porthash over the wide content.
    # Registered (not bare .cache()) so the caller's cache_scope /
    # session cleanup releases it.
    out = cache_registered(out.withColumn("_h", h))
    dup_hashes = (out.groupBy("_h").count()
                  .filter(F.col("count") > 1).select("_h"))
    uniq = out.join(F.broadcast(dup_hashes), "_h", "left_anti") \
        .withColumn("_rid", F.concat_ws("-", F.col("_h"), F.lit("1")))
    dups = out.join(F.broadcast(dup_hashes), "_h", "left_semi") \
        .withColumn(
            "_rid",
            F.concat_ws(
                "-", F.col("_h"),
                F.row_number().over(
                    Window.partitionBy("_h").orderBy(F.lit(1))
                ).cast("string")))
    return uniq.unionByName(dups)


def flat_to_docs(df: DataFrame, id_col: str | None = None,
                 attr_cols: list[str] | None = None) -> DataFrame:
    """Testing-layout flat record table -> the canonical (doc_id, spans)
    docs frame — the catalog-table ingestion path
    (hive_ditto_standalone.py:289-311's SELECT * -> record conversion).
    Each attribute becomes one span (kind=column name, text=str(value),
    offset=column position), so the WHOLE engine — serialization,
    summarizer, DK, blocking, scoring, clustering, checkpointing —
    applies to relational tables unchanged:
    ``serialize_spans(drop_empty=True)`` over these spans produces
    exactly ``serialize_flat``'s COL/VAL string.

    ``id_col=None`` auto-uses a ``doc_id``/``id`` column when present,
    else mints deterministic content-hash ids (``_with_content_rid`` —
    the same stability/duplicate contract as ``split_production``)."""
    cols = df.columns
    if id_col is None:
        id_col = next((c for c in ("doc_id", "id") if c in cols), None)
    if attr_cols is None:
        attr_cols = [c for c in cols if c != id_col]
    spans = F.array(*[
        F.struct(
            F.lit(c).alias("kind"),
            F.trim(F.coalesce(F.col(c).cast("string"), F.lit("")))
            .alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(i).cast("int").alias("offset"),
        )
        for i, c in enumerate(attr_cols)
    ])
    if id_col is not None:
        return df.select(F.col(id_col).cast("string").alias("doc_id"),
                         spans.alias("spans"))
    out = _with_content_rid(df.select(spans.alias("spans")),
                            F.to_json(F.col("spans")))
    return out.select(F.concat(F.lit("r"), F.col("_rid")).alias("doc_id"),
                      "spans")


def split_production(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """Pre-paired *_left/*_right table -> (left_id, right_id, left_text,
    right_text) candidates (hive_ditto_standalone.py:117-164): two
    projections over the same row, no pair-generation join. With
    ``id_col=None`` the deterministic content-hash ids add one NARROW
    aggregation over the hash column plus a broadcast anti-join; only
    duplicate-content rows (rare) pass through a row_number window."""
    fields = sorted(
        {c[:-5] for c in df.columns if c.endswith("_left")}
        & {c[:-6] for c in df.columns if c.endswith("_right")}
    )
    # both sides project from one scan — no join, no shuffle
    lpieces = [
        F.when(
            F.trim(F.coalesce(F.col(f + "_left").cast("string"), F.lit(""))) != "",
            F.concat(F.lit(f"COL {f} VAL "),
                     F.trim(F.col(f + "_left").cast("string"))),
        )
        for f in fields
    ]
    rpieces = [
        F.when(
            F.trim(F.coalesce(F.col(f + "_right").cast("string"), F.lit(""))) != "",
            F.concat(F.lit(f"COL {f} VAL "),
                     F.trim(F.col(f + "_right").cast("string"))),
        )
        for f in fields
    ]
    out = df.select(
        F.concat_ws(" ", *lpieces).alias("left_text"),
        F.concat_ws(" ", *rpieces).alias("right_text"),
        *([F.col(id_col).cast("string").alias("_rid")] if id_col else []),
    )
    if id_col is None:
        out = _with_content_rid(out,
                                F.concat_ws("\t", "left_text", "right_text"))
    return out.select(
        F.concat(F.lit("L"), F.col("_rid")).alias("left_id"),
        F.concat(F.lit("R"), F.col("_rid")).alias("right_id"),
        "left_text",
        "right_text",
    )
