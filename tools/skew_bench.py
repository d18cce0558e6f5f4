"""Zipf-skew endurance leg (VERDICT r4 #6): run the full ER DAG on a
corpus where ``hot_fraction`` of all docs are corrupted copies of ONE
entity — a genuinely Zipfian blocking-key head (shared shingles, band
keys and SN key region) — and compare per-stage wall + candidate volume
against a uniform corpus of the same size, same session.

The claim under test: the bucket cap (blocking.minhash_lsh_blocking
max_bucket_rows) and the SN window bound hot-key fanout, so candidates
stay ~linear in docs and no stage straggles (a straggler shows up as
the skewed leg's block/score wall blowing up vs uniform).

Usage:
    PYTHONPATH=/root/repo python tools/skew_bench.py <n_docs> \
        [hot_fraction=0.01] [scorer=prod]

Prints one JSON line per leg plus a summary line for BENCH.md.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ditto_spark.operators import blocking as B  # noqa: E402
from ditto_spark.operators.clustering import assign_entities  # noqa: E402
from ditto_spark.plans.pipeline import _preprocess, sn_key  # noqa: E402
from ditto_spark.operators.scoring import score_pairs  # noqa: E402
from ditto_spark.session import clear_operator_caches, get_spark  # noqa: E402
from ditto_spark.synth import distributed_docs  # noqa: E402


def materialize(spark, n_docs: int, hot: float, seed: int = 11) -> str:
    path = f"/tmp/ditto_spark_skew_docs_{n_docs}_{hot}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        shutil.rmtree(path, ignore_errors=True)
        distributed_docs(spark, n_docs, seed=seed,
                         hot_fraction=hot).write.parquet(path)
    return path


def leg(spark, path: str, cfg, label: str, n_docs: int) -> dict:
    docs = spark.read.parquet(path)
    stages: dict[str, float] = {}
    t_all = time.monotonic()

    t0 = time.monotonic()
    serialized = _preprocess(spark, docs, cfg).localCheckpoint(eager=True)
    stages["serialize"] = time.monotonic() - t0

    t0 = time.monotonic()
    mh = B.minhash_lsh_blocking(serialized, n_hashes=cfg.minhash_hashes,
                                bands=cfg.minhash_bands,
                                shingle_n=cfg.shingle_n,
                                max_bucket_rows=cfg.max_bucket_rows,
                                with_texts=False)
    sn = B.sorted_neighborhood(serialized, sn_key(), window=cfg.sn_window,
                               with_texts=False)
    candidates = B.union_candidates(mh, sn).localCheckpoint(eager=True)
    n_cand = candidates.count()
    stages["block"] = time.monotonic() - t0

    t0 = time.monotonic()
    scored = score_pairs(
        B.attach_texts(candidates, serialized), cfg.threshold,
        cfg.backend_factory,
        num_partitions=cfg.score_partitions).localCheckpoint(eager=True)
    n_match = scored.filter(F.col("match") == 1).count()
    stages["score"] = time.monotonic() - t0

    t0 = time.monotonic()
    ents = assign_entities(docs.select("doc_id"), scored)
    ents.write.format("noop").mode("overwrite").save()
    stages["cluster"] = time.monotonic() - t0

    total = time.monotonic() - t_all
    out = {
        "leg": label, "n_docs": n_docs, "total_sec": round(total, 1),
        "docs_per_sec": round(n_docs / total, 1),
        "stages": {k: round(v, 1) for k, v in stages.items()},
        "candidates": n_cand,
        "cands_per_doc": round(n_cand / n_docs, 2),
        "matches": n_match,
    }
    print(json.dumps(out), flush=True)
    clear_operator_caches(spark)
    return out


def boilerplate_main() -> None:
    """Boilerplate-skew endurance for the LLM near-dup wrapper (VERDICT
    r5 #1): a corpus where ``blob_rows`` docs are trivial variants of
    ONE boilerplate template — they land in the same band buckets, so
    the uncapped join goes blob² on a single key. Measures the capped
    default vs the uncapped exactness baseline: pair volume and wall.

    Usage:
        PYTHONPATH=/root/repo python tools/skew_bench.py --neardup \
            [n_docs=50000] [blob_rows=4000]
    """
    from ditto_spark.operators.dedup import minhash_near_dups

    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    blob = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000
    spark = get_spark("neardup-skew", cores=32, shuffle_partitions=64)

    # unique tail: hash-derived word soup; boilerplate head: one legal
    # disclaimer template with a per-doc trailing serial token (>=97%
    # shingles shared -> identical MinHash band keys with high prob.)
    template = ("this document is provided as is without warranty of any "
                "kind express or implied including but not limited to "
                "the warranties of merchantability fitness for a "
                "particular purpose and noninfringement in no event "
                "shall the authors be liable for any claim damages or "
                "other liability serial")
    uniq = spark.range(n_docs - blob).select(
        F.concat(F.lit("u"), F.col("id")).alias("id"),
        F.concat_ws(" ", *[
            F.conv(F.substring(F.md5(F.concat(F.col("id"), F.lit(i))),
                               1, 12), 16, 36)
            for i in range(12)]).alias("text"))
    blob_df = spark.range(blob).select(
        F.concat(F.lit("b"), F.col("id")).alias("id"),
        F.concat(F.lit(template), F.lit(" "),
                 F.col("id").cast("string")).alias("text"))
    path = f"/tmp/ditto_spark_neardup_skew_{n_docs}_{blob}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        shutil.rmtree(path, ignore_errors=True)
        uniq.unionByName(blob_df).write.parquet(path)
    docs = spark.read.parquet(path)

    def one(label: str, cap: int | None) -> dict:
        t0 = time.monotonic()
        pairs = minhash_near_dups(docs, "id", "text",
                                  max_bucket_rows=cap).count()
        wall = time.monotonic() - t0
        out = {"leg": label, "cap": cap, "pairs": pairs,
               "wall_sec": round(wall, 1)}
        print(json.dumps(out), flush=True)
        clear_operator_caches(spark)
        return out

    one("warmup_discard", 1000)
    capped = one("capped_default", 1000)
    uncapped = one("uncapped_baseline", None)
    print(json.dumps({
        "metric": "neardup_boilerplate_skew",
        "n_docs": n_docs, "blob_rows": blob,
        "uncapped_pairs": uncapped["pairs"],
        "capped_pairs": capped["pairs"],
        "wall_ratio_uncapped_vs_capped": round(
            uncapped["wall_sec"] / max(capped["wall_sec"], 1e-9), 2),
    }), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--neardup":
        boilerplate_main()
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    hot = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    scorer = sys.argv[3] if len(sys.argv) > 3 else "prod"
    from bench import scorer_config

    cfg = scorer_config(scorer)
    spark = get_spark("skew-bench", cores=32, shuffle_partitions=64)

    p_uni = materialize(spark, n_docs, 0.0)
    p_hot = materialize(spark, n_docs, hot)

    # hot-key diagnostics on the skewed corpus: biggest raw band bucket
    ser = _preprocess(spark, spark.read.parquet(p_hot), cfg)
    keys = B.minhash_band_buckets(ser, "doc_id", "text",
                                  cfg.minhash_hashes, cfg.minhash_bands,
                                  cfg.shingle_n)
    top = (keys.groupBy("block_key").count()
           .orderBy(F.desc("count")).limit(3).collect())
    print(json.dumps({"hot_fraction": hot,
                      "top_band_buckets": [r["count"] for r in top],
                      "bucket_cap": cfg.max_bucket_rows}), flush=True)

    # discarded warm-up: the first leg in a fresh JVM pays codegen +
    # allocator warm-up (measured 2x on this host) — without it the
    # uniform-vs-zipf wall ratio measures run ORDER, not skew
    leg(spark, p_uni, cfg, "warmup_discard", n_docs)
    uni = leg(spark, p_uni, cfg, "uniform", n_docs)
    skw = leg(spark, p_hot, cfg, f"zipf_hot{hot}", n_docs)

    summary = {
        "metric": "skew_endurance",
        "n_docs": n_docs, "hot_fraction": hot, "scorer": scorer,
        "wall_ratio_skew_vs_uniform": round(
            skw["total_sec"] / uni["total_sec"], 2),
        "stage_ratios": {k: round(skw["stages"][k] /
                                  max(uni["stages"][k], 1e-9), 2)
                         for k in uni["stages"]},
        "cands_per_doc": {"uniform": uni["cands_per_doc"],
                          "zipf": skw["cands_per_doc"]},
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
