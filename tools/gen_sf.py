"""Deterministic sf1 scale-up of the driver's sf0.1 testdata (VERDICT
r5 #7): 10x every fact table by unioning key-shifted copies, so the
headline bench can measure sf0.1 -> sf1 growth factors directly.

Construction (seedless, fully deterministic from the source data):

  region/nation          fixed dimensions — copied as-is
  customer/supplier/part key += copy * (max_key + 1)
  orders                 o_orderkey and o_custkey shifted consistently
  lineitem               l_orderkey / l_partkey / l_suppkey shifted
                         consistently with their dimensions
  events                 event_id / user_id shifted
  documents              doc_id shifted; for copies > 0 a copy tag
                         token is interleaved every 3rd token, which
                         breaks ~2/3 of the 3-gram shingles — copies of
                         one doc are NOT near-duplicates of each other,
                         so the dedup/LSH workload keeps its per-doc
                         statistics instead of gaining 9 planted
                         near-dups per doc; n_chars recomputed
  embeddings             vec_id shifted; the vector is cyclically
                         rotated by the copy index (norm-preserving,
                         decorrelates copies) — ANN/near-dup workload
                         shape preserved

Value distributions, date ranges, join selectivities and per-doc text
statistics are inherited from the source unchanged, so per-query cost
should scale with data volume — the growth factors bench.py measures.

Usage:
    PYTHONPATH=/root/repo python tools/gen_sf.py \
        [src=/root/testdata/sf0.1] [dst=/tmp/ditto_spark_sf1] [factor=10]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ditto_spark.session import get_spark  # noqa: E402


def _shift(df: DataFrame, copies: int, key_cols: dict[str, int],
           transform=None) -> DataFrame:
    """Union ``copies`` copies with each key column shifted by
    copy * stride (stride = max+1, precomputed by the caller)."""
    out = None
    for i in range(copies):
        c = df
        for col, stride in key_cols.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * stride))
        if transform is not None:
            c = transform(c, i)
        out = c if out is None else out.unionByName(c)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ditto_spark_sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("gen_sf", cores=16, shuffle_partitions=32)
    os.makedirs(dst, exist_ok=True)

    def t(name: str) -> DataFrame:
        return spark.read.parquet(f"{src}/{name}.parquet")

    def stride(df: DataFrame, col: str) -> int:
        return int(df.agg(F.max(col)).first()[0]) + 1

    kc = stride(t("customer"), "c_custkey")
    ks = stride(t("supplier"), "s_suppkey")
    kp = stride(t("part"), "p_partkey")
    ko = stride(t("orders"), "o_orderkey")
    ku = stride(t("events"), "user_id")
    ke = stride(t("events"), "event_id")
    kd = stride(t("documents"), "doc_id")
    kv = stride(t("embeddings"), "vec_id")

    plans = {
        "region": t("region"),
        "nation": t("nation"),
        "customer": _shift(t("customer"), copies, {"c_custkey": kc}),
        "supplier": _shift(t("supplier"), copies, {"s_suppkey": ks}),
        "part": _shift(t("part"), copies, {"p_partkey": kp}),
        "orders": _shift(t("orders"), copies,
                         {"o_orderkey": ko, "o_custkey": kc}),
        "lineitem": _shift(t("lineitem"), copies,
                           {"l_orderkey": ko, "l_partkey": kp,
                            "l_suppkey": ks}),
        "events": _shift(t("events"), copies,
                         {"event_id": ke, "user_id": ku}),
    }

    def doc_tx(df: DataFrame, i: int) -> DataFrame:
        if i == 0:
            return df
        toks = F.split(F.col("text"), r"\s+")
        tagged = F.flatten(F.transform(
            toks,
            lambda tok, j: F.when((j + 1) % 3 == 0,
                                  F.array(tok, F.lit(f"cp{i}")))
            .otherwise(F.array(tok))))
        return (df.withColumn("text", F.concat_ws(" ", tagged))
                .withColumn("n_chars", F.length("text")))

    plans["documents"] = _shift(t("documents"), copies, {"doc_id": kd},
                                transform=doc_tx)

    def emb_tx(df: DataFrame, i: int) -> DataFrame:
        if i == 0:
            return df
        e = F.col("embedding")
        n = F.size(e)
        rot = F.concat(F.slice(e, F.lit(i + 1), n - i), F.slice(e, 1, i))
        return df.withColumn("embedding", rot)

    plans["embeddings"] = _shift(t("embeddings"), copies, {"vec_id": kv},
                                 transform=emb_tx)

    for name, df in plans.items():
        path = f"{dst}/{name}.parquet"
        shutil.rmtree(path, ignore_errors=True)
        df.write.mode("overwrite").parquet(path)
        print(f"{name}: {spark.read.parquet(path).count()} rows")
    print(f"wrote {dst} (copies={copies} of {src})")


if __name__ == "__main__":
    main()
