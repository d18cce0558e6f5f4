"""ANN recall@k vs the brute-force baseline (VERDICT r4 #4).

Measures, on the real embeddings table at a given scale factor, the
number a user sizing n_bits / n_probe actually needs: recall@k of each
approximate index against ``cosine_topk`` (exact), plus the candidate
volume each method examines per query — the recall/cost dial the
reference exposes as k/threshold (blocking/blocker.py:43-80), made
quantitative.

Usage:
    PYTHONPATH=/root/repo python tools/ann_recall.py [sf_dir] [k]

Appends nothing; prints a JSON line per method and a markdown table to
paste into BENCH.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ditto_spark.operators.similarity import (ann_topk_lsh,  # noqa: E402
                                              cosine_topk, ivf_topk,
                                              rp_lsh_buckets)
from ditto_spark.session import get_spark  # noqa: E402


def recall_at_k(truth, approx, k: int) -> float:
    """Mean over queries of |approx top-k ∩ exact top-k| / k."""
    hit = (truth.join(approx.select("query_id", "neighbor_id"),
                      ["query_id", "neighbor_id"], "left_semi")
           .groupBy("query_id").count())
    # queries with zero approx hits drop out of the join — count them
    n_queries = truth.select("query_id").distinct().count()
    total_hits = hit.agg(F.sum("count")).first()[0] or 0
    return total_hits / (n_queries * k)


def lsh_candidates_per_query(emb, n_bits: int, dim: int,
                             multiprobe: bool) -> float:
    """Avg candidates examined per query = sum over probed buckets of
    bucket size (self excluded) — from the bucket histogram, no pair
    join."""
    b = rp_lsh_buckets(emb, n_bits, "vec_id", "embedding", dim)
    hist = b.groupBy("bucket").count()
    probes = b.select("id", "bucket")
    if multiprobe:
        variants = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i))
              for i in range(n_bits)])
        probes = probes.select(
            "id", F.explode(variants).alias("bucket"))
    joined = probes.join(hist, "bucket").groupBy("id").agg(
        F.sum("count").alias("c"))
    n = emb.count()
    tot = joined.agg(F.sum("c")).first()[0] or 0
    return (tot - n) / n  # each query sees itself exactly once


def planted_embeddings(spark, n: int, dim: int, n_clusters: int,
                       noise: float, seed: int = 13):
    """Deterministic clustered corpus: members = unit(center + noise).
    The synthetic testdata embeddings are near-isotropic — the
    ADVERSARIAL case for any cosine index (no neighbor structure to
    exploit); real document-embedding corpora cluster. This leg shows
    the recall the same index reaches when structure exists."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # scale noise so its expected NORM is `noise` (randn(dim) has norm
    # ~sqrt(dim) — unscaled it would swamp the unit centers entirely)
    mem = centers[np.arange(n) % n_clusters] + \
        noise * rng.randn(n, dim) / np.sqrt(dim)
    mem /= np.linalg.norm(mem, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(int(i), [float(x) for x in mem[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    planted = "--planted" in sys.argv
    spark = get_spark("ann-recall", cores=8, shuffle_partitions=8)
    if planted:
        emb = planted_embeddings(spark, 2000, 64, n_clusters=100,
                                 noise=0.25).localCheckpoint(eager=True)
    else:
        emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")) \
            .select("vec_id", "embedding").localCheckpoint(eager=True)
    n = emb.count()
    dim = len(emb.first()["embedding"])
    truth = cosine_topk(emb, emb, k=k).localCheckpoint(eager=True)

    rows = []

    def leg(name: str, build, cands: float | None) -> None:
        t0 = time.monotonic()
        approx = build()
        r = recall_at_k(truth, approx, k)
        wall = time.monotonic() - t0
        rows.append({"method": name, "recall_at_k": round(r, 4),
                     "cands_per_query": (round(cands, 1)
                                         if cands is not None else None),
                     "wall_sec": round(wall, 1)})
        print(json.dumps(rows[-1]))

    leg("brute_force", lambda: truth, float(n - 1))
    # n_bits is the recall/cost dial: buckets ≈ 2^n_bits, candidates per
    # query ≈ n / 2^n_bits (single-probe) — size it to the corpus the
    # way the store bucket counts are sized (n_bits ≈ log2(n / target
    # candidates)). Sweep it so the table shows the trade, not one point.
    for n_bits in (4, 6, 8):
        for mp in (False, True):
            cands = lsh_candidates_per_query(emb, n_bits, dim, mp)
            leg(f"lsh_nbits{n_bits}_{'multiprobe' if mp else 'single'}",
                lambda mp=mp, b=n_bits: ann_topk_lsh(
                    emb, emb, k=k, n_bits=b, dim=dim, multiprobe=mp),
                cands)
    n_cells = int(min(max(16, round(n ** 0.5)), 4096))
    for n_probe in (1, 2, 4):
        # expected scan fraction n_probe/n_cells of the corpus
        leg(f"ivf_cells{n_cells}_probe{n_probe}",
            lambda p=n_probe: ivf_topk(emb, emb, k=k, n_cells=n_cells,
                                       n_probe=p),
            n * n_probe / n_cells)

    print(f"\n| method | recall@{k} | cands/query | wall s |")
    print("| --- | --- | --- | --- |")
    for r in rows:
        print(f"| {r['method']} | {r['recall_at_k']} | "
              f"{r['cands_per_query']} | {r['wall_sec']} |")
    print(json.dumps({"sf_dir": ("planted" if planted else sf_dir),
                      "n": n, "dim": dim, "k": k, "legs": rows}))


if __name__ == "__main__":
    main()
