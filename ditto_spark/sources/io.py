"""Readers/writers for the reference's file formats (SURVEY.md §2.1).

  S1 catalog table scan  SELECT * FROM t [LIMIT]  hive_ditto_standalone
                         (read_table)             .py:289-311
  S2 TSV labeled pairs   left\\tright\\tlabel      dataset.py:37-48
  S3 JSONL candidates    [left, right] arrays or {left,right,id} objects
                         matcher.py:162-177; csv_to_all_pairs.py:98-110
  S4 CSV records         csv_to_ditto.py:21
  S5 txt -> jsonl        matcher.py:162-168 (here: a projection)
  S6 JSONL match sink    {left,right,match,match_confidence}
                         matcher.py:156-160
  S7 table sink          hive_ditto_standalone.py:371-454's per-row
                         INSERTs replaced by one set-based parquet/table
                         write

All are thin wrappers over spark.read/write with the contract schemas —
the point is the schema fidelity, not cleverness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

def read_table(spark: SparkSession, table: str,
               limit: int | None = None) -> DataFrame:
    """S1 catalog scan: ``SELECT * FROM <table> [LIMIT n]``
    (hive_ditto_standalone.py:289-311's extract_hive_data, minus the
    collect-to-pandas hop — the scan stays a distributed DataFrame, so
    catalog-side partition pruning / column pruning apply downstream).
    ``table`` is any catalog-resolvable name (``db.t``, ``t``, or a
    fully qualified ``catalog.db.t`` — Iceberg/Hive/in-memory alike)."""
    df = spark.read.table(table)
    return df.limit(limit) if limit else df


def write_bucketed_table(df: DataFrame, table: str, bucket_cols: list[str],
                         n_buckets: int,
                         sort_cols: list[str] | None = None) -> None:
    """Persist a catalog table BUCKETED (and optionally sorted) by the
    join key — the co-located-join layout for the tables this engine
    joins repeatedly at scale (docs by doc_id for text attach, pair
    tables by block key). Two tables bucketed by the same key with the
    same count join with NO shuffle on either side (Spark elides both
    Exchanges; with sort_cols the sort is elided too) — at the 10^12-doc
    design point that turns every text-attach join from a full-corpus
    shuffle into a per-bucket local merge. One-time cost: the bucketed
    WRITE itself shuffles into n_buckets files per partition.

    Size ``n_buckets`` so one bucket of the LARGEST co-bucketed table
    fits an executor core's working memory (same sizing rule as the
    streaming stores' ``n_store_buckets``)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    drop_table(df.sparkSession, table)
    w.format("parquet").saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    """``DROP TABLE IF EXISTS`` that is robust to an EPHEMERAL catalog
    (Spark's default in-memory catalog, and any metastore lost between
    runs): the SQL drop only clears a managed table's location when the
    catalog still REMEMBERS the table; a fresh session's catalog does
    not, leaving an orphaned warehouse directory that fails the next
    ``saveAsTable`` with LOCATION_ALREADY_EXISTS. After the SQL drop,
    delete the warehouse-derived managed location if it survived. A
    persistent (Hive/Iceberg) metastore's drop already removed it —
    then this is a pure no-op exists() check."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if not wh:
        return
    parts = table.split(".")
    name = parts[-1].lower()
    db = (parts[-2].lower() if len(parts) >= 2
          else spark.catalog.currentDatabase().lower())
    rel = name if db == "default" else f"{db}.db/{name}"
    sc = spark.sparkContext
    p = sc._jvm.org.apache.hadoop.fs.Path(f"{wh.rstrip('/')}/{rel}")
    fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
    if fs.exists(p):
        fs.delete(p, True)


def write_matches_catalog_table(matches: DataFrame, table: str,
                                mode: str = "overwrite") -> None:
    """S7 catalog sink: ONE set-based ``saveAsTable`` with the
    reference's result-table columns (hive_ditto_standalone.py:409-419
    DDL) — replaces its per-row INSERT loop (:426-446), which at any
    real scale is a driver-side O(rows) round-trip series. ``mode``:
    'overwrite' replaces the result table (idempotent re-runs);
    'append' matches the reference's INSERT-accumulate behavior."""
    out = matches.select(
        "left_id", "right_id",
        F.col("match_confidence").alias("match_probability"),
        (F.col("match") == 1).alias("is_match"),
        F.current_timestamp().alias("created_at"),
    )
    if mode == "overwrite":
        # clear an orphaned managed location an ephemeral catalog may
        # have left behind (see drop_table) — overwrite semantics must
        # not depend on the catalog remembering the previous run
        drop_table(matches.sparkSession, table)
    out.write.mode(mode).format("parquet").saveAsTable(table)


PAIR_TSV_SCHEMA = StructType([
    StructField("left", StringType(), True),
    StructField("right", StringType(), True),
    StructField("label", IntegerType(), True),
])


def read_labeled_pairs_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S2: `left \\t right \\t label` lines (README.md:33-36)."""
    return (
        spark.read.option("sep", "\t").schema(PAIR_TSV_SCHEMA).csv(path)
    )


def read_candidates_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3: one JSON value per line; supports BOTH reference layouts —
    `[left, right]` arrays (sample_test_data.jsonl) and
    `{left, right, ...}` objects (csv_to_matching_format.py:79-84) —
    detected from the first character, all inside native expressions."""
    raw = spark.read.text(path).withColumnRenamed("value", "line")
    arr = F.from_json(F.col("line"), ArrayType(StringType()))
    obj = F.from_json(
        F.col("line"),
        StructType([StructField("left", StringType()),
                    StructField("right", StringType()),
                    StructField("id", StringType())]),
    )
    is_arr = F.startswith(F.trim(F.col("line")), F.lit("["))
    return raw.select(
        F.when(is_arr, arr[0]).otherwise(obj["left"]).alias("left_text"),
        F.when(is_arr, arr[1]).otherwise(obj["right"]).alias("right_text"),
        F.when(is_arr, F.lit(None).cast("string")).otherwise(obj["id"])
        .alias("pair_id"),
    )


def read_records_csv(spark: SparkSession, path: str,
                     rename: dict[str, str] | None = None) -> DataFrame:
    """S4 + P3: CSV with header, optional column-rename map
    (csv_to_ditto.py:37-45)."""
    df = spark.read.option("header", "true").csv(path)
    return df.withColumnsRenamed(rename) if rename else df


def write_matches_jsonl(matches: DataFrame, path: str) -> None:
    """S6: the matcher's output contract (matcher.py:156-160). Column
    order fixed; one JSON object per line."""
    (matches.select(
        F.col("left_id").alias("left"), F.col("right_id").alias("right"),
        "match", "match_confidence")
     .write.mode("overwrite").json(path))


def write_matches_table(matches: DataFrame, path: str,
                        partition_cols: list[str] | None = None) -> None:
    """S7: set-based table sink (replaces hive_ditto_standalone.py:426-446
    per-row INSERT loop) with the result-table columns of the reference
    DDL (:409-419)."""
    out = matches.select(
        "left_id", "right_id",
        F.col("match_confidence").alias("match_probability"),
        (F.col("match") == 1).alias("is_match"),
        F.current_timestamp().alias("created_at"),
    )
    w = out.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
