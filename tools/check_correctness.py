"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 on Spark AND its
oracle_sql() twin on DuckDB, then compares row count, column names, and
an order-insensitive value hash. Usage:

    PYTHONPATH=/root/repo python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
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


def main(names: list[str]) -> int:
    import __spark_entry__ as entrymod
    from ditto_spark.session import get_spark

    spark = get_spark("correctness", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    targets = names or list(qs)
    failures = 0
    for name in targets:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"okro {name}: rows-only (no oracle), rows={len(sdf)} "
                  f"[{time.monotonic()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        status = "ok  " if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        if status == "FAIL":
            failures += 1
            detail = []
            if sn != on:
                detail.append(f"rows {sn} vs {on}")
            if sc != oc:
                detail.append(f"cols {sc} vs {oc}")
            if sh != oh and sn == on and sc == oc:
                merged = sdf[sorted(sdf.columns)].merge(
                    odf[sorted(odf.columns)], how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                detail.append(f"value mismatch; {len(diff)} differing rows, "
                              f"sample:\n{diff.head(6).to_string()}")
            print(f"FAIL {name}: {'; '.join(detail)}")
        else:
            print(f"ok   {name}: rows={sn} [{time.monotonic()-t0:.1f}s]")
    print(f"\n{len(targets) - failures}/{len(targets)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
