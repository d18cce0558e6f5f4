"""Round-7 optimization profiler (guide §1): times each headline query
in isolation with the noop sink (best-of-N, operator caches cleared
between runs, same session shape as bench.py) and captures
``explain("formatted")`` for every query into plans/r07/.

Usage:
  python tools/bench_r07.py [--tag before|after] [--repeats 3] [--only q1,...]

Never used by the driver's measurement — bench.py stays frozen.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_region_revenue",
    "q_window_top_suppliers",
    "q_events_sessions",
    "er_serialize",
    "er_blocking_key_pairs",
    "er_sorted_neighborhood",
    "er_minhash",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_stats",
    "cluster_cc",
    "er_pipeline_matches",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--only", default="")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from ditto_spark.operators.clustering import connected_components
    from ditto_spark.operators.dedup import ngram_jaccard_pairs
    from ditto_spark.session import clear_operator_caches, get_spark

    names = [n for n in args.only.split(",") if n] or HEADLINE
    spark = get_spark("bench-r07", cores=CPUS, shuffle_partitions=CPUS)
    qs = entrymod.queries()

    # identical warmup to bench.py
    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.groupBy("r_name").agg(F.count("*")).write.format("noop").mode(
        "overwrite").save()
    docs_warm = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
                 .limit(300).localCheckpoint())
    edges_warm = ngram_jaccard_pairs(
        docs_warm, "doc_id", "text", n=3, threshold=0.1,
        max_shingle_df=50).select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    connected_components(edges_warm).write.format("noop").mode(
        "overwrite").save()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(plans_dir, exist_ok=True)

    times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        samples = []
        for _ in range(args.repeats):
            clear_operator_caches(spark)
            spark.sparkContext.setJobDescription(f"r07:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
            spark.sparkContext.setJobDescription(None)
        times[name] = round(best, 3)
        print(f"{name}: best={best:.3f} samples={samples}", file=sys.stderr)
        if not args.no_plans:
            clear_operator_caches(spark)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir,
                                   f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
    print(json.dumps({"total": round(sum(times.values()), 3),
                      "queries": times, "repeats": args.repeats,
                      "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
