"""Per-batch latency of the incremental-ER stream.

Evidence for the streaming scale story: per-micro-batch cost must be
driven by the batch (plus the touched components), not by total corpus
age or size.

Default mode (compaction): streams N batches of B synthetic docs
through ``incremental_entities`` twice — without compaction and with
``compact_every`` — and prints one JSON line with per-batch
triggerExecution ms for both runs. Without compaction the label
resolve scans one partition per prior batch (per-batch cost creeps up
with stream age); inline compaction bounds the history, flattening the
tail.

``--flatness`` mode (the O(batch) claim, VERDICT r4 #1): pre-seeds the
incremental stores with corpora of two sizes (small and ``--scale-x``
bigger), each with store bucket counts SIZED TO THE CORPUS (the design
contract: pruned read cost = touched buckets x corpus/n_buckets), then
streams the IDENTICAL measured batches — near-duplicates of corpus
entities, so every batch does real candidate-join + score + localized
CC work against the seeded state — and reports per-batch latency at
both corpus sizes. O(batch) holds iff the ratio stays ~1 while the
corpus grows scale-x fold.

  PYTHONPATH=/root/repo python tools/stream_bench.py \
      [--batches 12] [--batch-docs 2000] [--compact-every 4] [--cores 8]
  PYTHONPATH=/root/repo python tools/stream_bench.py --flatness \
      [--corpus 25000] [--scale-x 8] [--batches 5] [--batch-docs 200]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def per_batch_ms(progress: list) -> list[float]:
    out = []
    for p in progress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        if d.get("numInputRows", 0) > 0:
            out.append(float(d["durationMs"]["triggerExecution"]))
    return out


def run(spark, src: str, schema, compact_every: int | None) -> list[float]:
    from ditto_spark.streaming.incremental_er import incremental_entities

    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        progress = incremental_entities(
            spark, stream, f"{work}/wd", f"{work}/ck",
            compact_every=compact_every)
        return per_batch_ms(progress)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _seed_stores(spark, corpus_docs, work_dir: str, n_buckets: int) -> None:
    """Materialize the incremental stores for a pre-existing corpus in
    ONE batch job each (what a deployment does before attaching the
    stream): docs/index/labels/labels_byent at batch=-1 (below any
    stream batch id, so every per-batch read sees them), labels as
    singletons (the no-prior-matches state — internally consistent with
    an empty matches store)."""
    from pyspark.sql import functions as F

    from ditto_spark.operators.blocking import minhash_band_buckets
    from ditto_spark.operators.serialize import serialize_spans
    from ditto_spark.streaming.incremental_er import (_bk_bucket,
                                                      _check_bucket_meta,
                                                      _hash_bucket)

    _check_bucket_meta(spark, work_dir, n_buckets)
    ser = (corpus_docs.withColumn(
        "text", serialize_spans(F.col("spans"), drop_empty=True))
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text"))
    (ser.withColumn("doc_bucket", _hash_bucket("doc_id", n_buckets))
     .repartition("doc_bucket")
     .write.mode("overwrite").partitionBy("doc_bucket")
     .parquet(f"{work_dir}/docs/batch=-1"))
    keys = minhash_band_buckets(ser, "doc_id", "text", 24, 6, 3)
    (keys.select("id", "block_key",
                 _bk_bucket(n_buckets).alias("bk_bucket"))
     .repartition("bk_bucket")
     .write.mode("overwrite").partitionBy("bk_bucket")
     .parquet(f"{work_dir}/index/batch=-1"))
    singles = ser.select("doc_id", F.col("doc_id").alias("entity_id"))
    (singles.withColumn("doc_bucket", _hash_bucket("doc_id", n_buckets))
     .repartition("doc_bucket")
     .write.mode("overwrite").partitionBy("doc_bucket")
     .parquet(f"{work_dir}/labels/batch=-1"))
    (singles.withColumn("ent_bucket", _hash_bucket("entity_id", n_buckets))
     .repartition("ent_bucket")
     .write.mode("overwrite").partitionBy("ent_bucket")
     .parquet(f"{work_dir}/labels_byent/batch=-1"))


def _probe_docs(spark, n_docs: int, n_corpus_entities: int, seed: int = 91):
    """Measured-batch docs: each a corruption of a corpus entity spread
    uniformly over the entity pool, so every batch exercises real
    candidate joins against the seeded corpus and per-probe candidate
    volume is corpus-size-independent (each entity has <= 3 corpus
    copies regardless of pool size)."""
    import random
    from typing import Iterator

    import pandas as pd

    from ditto_spark.schema import DOC_SCHEMA
    from ditto_spark.synth import _base_entity, _corrupt_spans

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for j in pdf["id"].tolist():
                eid = (j * 7919) % n_corpus_entities
                base = _base_entity(random.Random((17 << 21) ^ eid), eid)
                spans = _corrupt_spans(random.Random((seed << 20) ^ j), base)
                for off, s in enumerate(spans):
                    s["offset"] = off
                out.append({"doc_id": f"p{j:09d}", "spans": spans})
            yield pd.DataFrame(out)

    return spark.range(n_docs).mapInPandas(gen, DOC_SCHEMA)


def _pruned_read_rows(spark, work: str, chunks, n_buckets: int) -> dict:
    """Post-hoc per-batch measurement of the quantity the bucket
    pruning controls: rows admitted by each batch's partition filters
    on the two largest accumulated stores (band index, labels), vs the
    full store size at that instant. Recomputed exactly from the
    persisted stores + the known batch inputs — deterministic, no
    instrumentation inside the engine."""
    from pyspark.sql import functions as F

    from ditto_spark.operators.blocking import minhash_band_buckets
    from ditto_spark.operators.serialize import serialize_spans
    from ditto_spark.streaming.incremental_er import (_bucket_values,
                                                      _in_buckets,
                                                      _hash_bucket)

    idx = spark.read.parquet(f"{work}/index").localCheckpoint(eager=True)
    lab = spark.read.parquet(f"{work}/labels").localCheckpoint(eager=True)
    out = {"index_pruned": [], "index_total": [],
           "labels_pruned": [], "labels_total": []}
    for i, chunk in enumerate(chunks):
        ser = chunk.withColumn(
            "text", serialize_spans(F.col("spans"), drop_empty=True))
        keys = minhash_band_buckets(ser, "doc_id", "text", 24, 6, 3)
        bks = _bucket_values(keys, "block_key", n_buckets)
        prior_idx = idx.filter(F.col("batch") < i)
        out["index_total"].append(prior_idx.count())
        out["index_pruned"].append(
            prior_idx.filter(_in_buckets("bk_bucket", bks)).count())
        edges = spark.read.parquet(f"{work}/matches/batch={i}").filter(
            "match = 1")
        nodes = (edges.select(F.col("left_id").alias("doc_id"))
                 .unionByName(edges.select(F.col("right_id").alias("doc_id")))
                 .unionByName(ser.select(
                     F.col("doc_id").cast("string").alias("doc_id"))))
        dbs = _bucket_values(nodes.distinct(), "doc_id", n_buckets)
        prior_lab = lab.filter(F.col("batch") < i)
        out["labels_total"].append(prior_lab.count())
        out["labels_pruned"].append(
            prior_lab.filter(_in_buckets("doc_bucket", dbs)).count())
    idx.unpersist()
    lab.unpersist()
    return out


def run_flatness(args) -> None:
    from ditto_spark.session import get_spark
    from ditto_spark.streaming.incremental_er import incremental_entities
    from ditto_spark.synth import distributed_docs

    spark = get_spark("stream-flatness", cores=args.cores,
                      shuffle_partitions=args.cores)
    # keep partition discovery driver-side: the job-based parallel
    # listing (default threshold 32 dirs) pays scheduler overhead on
    # EVERY store read; serial listing of a few thousand local dirs is
    # cheaper and closer to what a table-format metastore provides
    spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
    corpus2 = args.corpus2 or args.corpus * args.scale_x
    buckets2 = args.buckets2 or args.buckets * args.scale_x
    sizes = [(args.corpus, args.buckets), (corpus2, buckets2)]
    # identical measured input for both corpus sizes
    src = tempfile.mkdtemp(prefix="flatness_src_")
    probes = _probe_docs(spark, args.batches * args.batch_docs,
                         # entities of the SMALL corpus exist in both
                         n_corpus_entities=args.corpus // 3)
    schema = probes.schema
    rows = probes.collect()
    for i in range(args.batches):
        chunk = rows[i * args.batch_docs:(i + 1) * args.batch_docs]
        (spark.createDataFrame(chunk, schema).coalesce(1)
         .write.mode("append").parquet(src))

    result = {"batches": args.batches, "batch_docs": args.batch_docs,
              "cores": args.cores, "runs": []}
    try:
        for n_corpus, n_buckets in sizes:
            work = tempfile.mkdtemp(prefix=f"flatness_{n_corpus}_")
            try:
                corpus = distributed_docs(spark, n_corpus, seed=17)
                t0 = time.time()
                _seed_stores(spark, corpus, f"{work}/wd", n_buckets)
                seed_sec = round(time.time() - t0, 1)
                stream = (spark.readStream.schema(schema)
                          .option("maxFilesPerTrigger", 1).parquet(src))
                progress = incremental_entities(
                    spark, stream, f"{work}/wd", f"{work}/ck",
                    compact_every=None, n_store_buckets=n_buckets)
                ms = per_batch_ms(progress)
                n_matches = spark.read.parquet(f"{work}/wd/matches").filter(
                    "match = 1").count()
                chunks = [
                    spark.createDataFrame(
                        rows[i * args.batch_docs:(i + 1) * args.batch_docs],
                        schema)
                    for i in range(args.batches)]
                reads = _pruned_read_rows(spark, f"{work}/wd", chunks,
                                          n_buckets)
                result["runs"].append({
                    "corpus_docs": n_corpus, "n_buckets": n_buckets,
                    "seed_sec": seed_sec, "per_batch_ms": ms,
                    "avg_batch_ms": round(sum(ms) / len(ms), 1),
                    "min_batch_ms": round(min(ms), 1),
                    "stream_matches": n_matches,
                    "per_batch_store_reads": reads,
                })
            finally:
                shutil.rmtree(work, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    small, big = result["runs"]
    # min is the steady-state signal on a noisy shared host (see
    # BENCH.md methodology); avg reported alongside
    result["flatness_ratio_avg"] = round(
        big["avg_batch_ms"] / small["avg_batch_ms"], 3)
    result["flatness_ratio_min"] = round(
        big["min_batch_ms"] / small["min_batch_ms"], 3)

    def _avg(xs):
        return sum(xs) / max(len(xs), 1)

    for store in ("index", "labels"):
        sp = _avg(small["per_batch_store_reads"][f"{store}_pruned"])
        bp = _avg(big["per_batch_store_reads"][f"{store}_pruned"])
        st = _avg(small["per_batch_store_reads"][f"{store}_total"])
        bt = _avg(big["per_batch_store_reads"][f"{store}_total"])
        result[f"{store}_rows_read_ratio"] = round(bp / sp, 3) if sp else None
        result[f"{store}_store_size_ratio"] = round(bt / st, 3) if st else None
    result["corpus_scale_x"] = round(
        big["corpus_docs"] / small["corpus_docs"], 2)
    print(json.dumps(result))
    spark.stop()


def _clustered_vectors(spark, n: int, dim: int = 64,
                       n_clusters: int = 512, id_offset: int = 0,
                       noise: float = 0.1, salt: int = 0):
    """Deterministic per-id clustered unit vectors (cluster =
    raw_id % n_clusters against a fixed 4096-center matrix — the SAME
    matrix for every n_clusters, so corpora of different sizes share
    their low-numbered clusters and probes built on clusters < 512 hit
    real neighbors in every leg), generated executor-side via
    mapInPandas so seeding 200k+ vectors never collects on the
    driver. Scaling n_clusters WITH the corpus keeps per-cluster
    density constant — a growing corpus adds entities, not copies."""
    import pandas as pd

    assert n_clusters <= 4096

    def gen(batches):
        import numpy as np
        rng_c = np.random.RandomState(5)
        centers = rng_c.randn(4096, dim)[:n_clusters]
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                g = np.random.RandomState(
                    (int(i) + salt) % (2 ** 31 - 1)).randn(dim)
                v = centers[int(i) % n_clusters] + \
                    noise * g / np.sqrt(dim)
                vecs.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"vec_id": ids + id_offset,
                                "embedding": vecs})

    return spark.range(n).mapInPandas(
        gen, "vec_id long, embedding array<double>")


def run_ann_flatness(args) -> None:
    """O(batch) claim for the incremental-ANN index: stream IDENTICAL
    query batches against seeded vector corpora of two sizes (store
    buckets sized to each corpus) and report per-batch latency plus
    index rows read per batch at both sizes. O(batch) holds iff rows
    read per batch stay ~constant while the corpus grows scale-x."""
    from pyspark.sql import functions as F

    from ditto_spark.session import get_spark
    from ditto_spark.streaming.incremental_ann import (incremental_ann_topk,
                                                       seed_vector_index)
    from ditto_spark.streaming.incremental_er import (_hash_bucket,
                                                      _in_buckets)

    spark = get_spark("ann-flatness", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
    dim, n_bits = 64, 12
    corpus2 = args.corpus2 or args.corpus * args.scale_x
    buckets2 = args.buckets2 or args.buckets * args.scale_x
    sizes = [(args.corpus, args.buckets), (corpus2, buckets2)]
    # identical measured batches for both legs: near-dups of corpus
    # clusters (salted noise), ids disjoint from every corpus
    src = tempfile.mkdtemp(prefix="ann_flatness_src_")
    probes = _clustered_vectors(
        spark, args.batches * args.batch_docs,
        id_offset=10 ** 9, salt=777).collect()
    schema = "vec_id long, embedding array<double>"
    for i in range(args.batches):
        chunk = probes[i * args.batch_docs:(i + 1) * args.batch_docs]
        (spark.createDataFrame(chunk, schema).coalesce(1)
         .write.mode("append").parquet(src))

    result = {"batches": args.batches, "batch_docs": args.batch_docs,
              "n_bits": n_bits, "dim": dim, "cores": args.cores,
              "multiprobe": False, "runs": []}
    try:
        for n_corpus, n_buckets in sizes:
            work = tempfile.mkdtemp(prefix=f"ann_flat_{n_corpus}_")
            try:
                # clusters scale with the corpus (constant density —
                # growth adds entities); probes use clusters < 512,
                # present in every leg via the shared center matrix
                emb = _clustered_vectors(
                    spark, n_corpus,
                    n_clusters=min(4096, max(512, n_corpus // 48)))
                t0 = time.time()
                seed_vector_index(spark, emb, f"{work}/wd",
                                  n_bits=n_bits, dim=dim,
                                  n_store_buckets=n_buckets)
                seed_sec = round(time.time() - t0, 1)
                stream = (spark.readStream.schema(schema)
                          .option("maxFilesPerTrigger", 1).parquet(src))
                progress = incremental_ann_topk(
                    spark, stream, f"{work}/wd", f"{work}/ck", k=10,
                    n_bits=n_bits, dim=dim, multiprobe=False,
                    n_store_buckets=n_buckets)
                ms = per_batch_ms(progress)
                # per-batch pruned index read vs full index, replayed
                # with the same probe-bucket logic the stream used
                index = spark.read.parquet(f"{work}/wd/index")
                total = index.count()
                pruned_rows = []
                for i in range(args.batches):
                    chunk = spark.createDataFrame(
                        probes[i * args.batch_docs:
                               (i + 1) * args.batch_docs], schema)
                    from ditto_spark.operators.similarity import \
                        rp_lsh_buckets
                    pb = sorted(r[0] for r in rp_lsh_buckets(
                        chunk, n_bits, "vec_id", "embedding", dim)
                        .select(_hash_bucket(
                            F.col("bucket").cast("long"),
                            n_buckets).alias("b"))
                        .distinct().collect())
                    pruned_rows.append(index.filter(
                        _in_buckets("vb_bucket", pb)).count())
                result["runs"].append({
                    "corpus_vecs": n_corpus, "n_buckets": n_buckets,
                    "seed_sec": seed_sec, "per_batch_ms": ms,
                    "avg_batch_ms": round(sum(ms) / len(ms), 1),
                    "min_batch_ms": round(min(ms), 1),
                    "index_rows_total": total,
                    "index_rows_read_per_batch": pruned_rows,
                })
            finally:
                shutil.rmtree(work, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    small, big = result["runs"]
    result["flatness_ratio_avg"] = round(
        big["avg_batch_ms"] / small["avg_batch_ms"], 3)
    result["flatness_ratio_min"] = round(
        big["min_batch_ms"] / small["min_batch_ms"], 3)

    def _avg(xs):
        return sum(xs) / max(len(xs), 1)

    result["index_rows_read_ratio"] = round(
        _avg(big["index_rows_read_per_batch"])
        / max(_avg(small["index_rows_read_per_batch"]), 1), 3)
    result["index_size_ratio"] = round(
        big["index_rows_total"] / max(small["index_rows_total"], 1), 3)
    print(json.dumps(result))
    spark.stop()


def run_matches_flatness(args) -> None:
    """O(batch) evidence for ``incremental_matches`` (round 6: the
    static corpus index PLUS the accumulated stream-side index):
    IDENTICAL measured batches streamed against corpus indexes of two
    sizes (bucket counts sized to each corpus); per-batch latency and
    corpus-index rows read per batch stay ~flat iff the probe-bucket
    pruning holds while the corpus scales."""
    from pyspark.sql import functions as F

    from ditto_spark.operators.blocking import minhash_band_buckets
    from ditto_spark.operators.serialize import serialize_spans
    from ditto_spark.session import get_spark
    from ditto_spark.streaming.incremental_er import (_bucket_values,
                                                      _in_buckets,
                                                      build_corpus_index,
                                                      incremental_matches)
    from ditto_spark.synth import distributed_docs

    spark = get_spark("matches-flatness", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
    corpus2 = args.corpus2 or args.corpus * args.scale_x
    buckets2 = args.buckets2 or args.buckets * args.scale_x
    sizes = [(args.corpus, args.buckets), (corpus2, buckets2)]
    src = tempfile.mkdtemp(prefix="mflat_src_")
    probes = _probe_docs(spark, args.batches * args.batch_docs,
                         n_corpus_entities=args.corpus // 3)
    schema = probes.schema
    rows = probes.collect()
    for i in range(args.batches):
        chunk = rows[i * args.batch_docs:(i + 1) * args.batch_docs]
        (spark.createDataFrame(chunk, schema).coalesce(1)
         .write.mode("append").parquet(src))

    result = {"batches": args.batches, "batch_docs": args.batch_docs,
              "cores": args.cores, "runs": []}
    try:
        for n_corpus, n_buckets in sizes:
            work = tempfile.mkdtemp(prefix=f"mflat_{n_corpus}_")
            try:
                corpus = distributed_docs(spark, n_corpus, seed=17)
                t0 = time.time()
                build_corpus_index(corpus, f"{work}/index",
                                   n_buckets=n_buckets)
                seed_sec = round(time.time() - t0, 1)
                stream = (spark.readStream.schema(schema)
                          .option("maxFilesPerTrigger", 1).parquet(src))
                progress = incremental_matches(
                    spark, stream, f"{work}/index", f"{work}/out",
                    f"{work}/ck", n_store_buckets=n_buckets)
                ms = per_batch_ms(progress)
                n_matches = spark.read.parquet(f"{work}/out").filter(
                    "match = 1").count()
                # pruned corpus-index read volume, recomputed post-hoc
                idx = spark.read.parquet(
                    f"{work}/index").localCheckpoint(eager=True)
                total = idx.count()
                pruned = []
                for i in range(args.batches):
                    chunk = spark.createDataFrame(
                        rows[i * args.batch_docs:(i + 1) * args.batch_docs],
                        schema)
                    ser = chunk.withColumn(
                        "text",
                        serialize_spans(F.col("spans"), drop_empty=True))
                    keys = minhash_band_buckets(ser, "doc_id", "text",
                                                24, 6, 3)
                    bks = _bucket_values(keys, "block_key", n_buckets)
                    pruned.append(idx.filter(
                        _in_buckets("bk_bucket", bks)).count())
                idx.unpersist()
                result["runs"].append({
                    "corpus_docs": n_corpus, "n_buckets": n_buckets,
                    "seed_sec": seed_sec, "per_batch_ms": ms,
                    "avg_batch_ms": round(sum(ms) / len(ms), 1),
                    "min_batch_ms": round(min(ms), 1),
                    "stream_matches": n_matches,
                    "index_rows_total": total,
                    "index_rows_read_per_batch": pruned,
                })
            finally:
                shutil.rmtree(work, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    small, big = result["runs"]
    result["flatness_ratio_avg"] = round(
        big["avg_batch_ms"] / small["avg_batch_ms"], 3)
    result["flatness_ratio_min"] = round(
        big["min_batch_ms"] / small["min_batch_ms"], 3)
    sp = sum(small["index_rows_read_per_batch"]) / args.batches
    bp = sum(big["index_rows_read_per_batch"]) / args.batches
    result["index_rows_read_ratio"] = round(bp / sp, 3) if sp else None
    result["index_size_ratio"] = round(
        big["index_rows_total"] / small["index_rows_total"], 3)
    print(json.dumps(result))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch-docs", type=int, default=2000)
    ap.add_argument("--compact-every", type=int, default=4)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--flatness", action="store_true")
    ap.add_argument("--ann-flatness", action="store_true")
    ap.add_argument("--matches-flatness", action="store_true")
    ap.add_argument("--corpus", type=int, default=25000)
    ap.add_argument("--scale-x", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=128,
                    help="store buckets for the SMALL corpus; the big "
                    "corpus uses buckets*scale_x (corpus-sized buckets)")
    ap.add_argument("--corpus2", type=int, default=None,
                    help="explicit second-leg corpus (overrides scale-x)")
    ap.add_argument("--buckets2", type=int, default=None,
                    help="explicit second-leg bucket count")
    args = ap.parse_args()

    if args.ann_flatness:
        if args.batches == 12 and args.batch_docs == 2000:
            args.batches, args.batch_docs = 5, 50
        if args.corpus == 25000 and args.buckets == 128:
            args.buckets = 256
        run_ann_flatness(args)
        return

    if args.matches_flatness:
        if args.batches == 12 and args.batch_docs == 2000:
            args.batches, args.batch_docs = 5, 200
        run_matches_flatness(args)
        return

    if args.flatness:
        if args.batches == 12 and args.batch_docs == 2000:
            args.batches, args.batch_docs = 5, 200
        run_flatness(args)
        return

    from ditto_spark.session import get_spark
    from ditto_spark.synth import distributed_docs

    spark = get_spark("stream-bench", cores=args.cores,
                      shuffle_partitions=args.cores)
    src = tempfile.mkdtemp(prefix="stream_bench_src_")
    try:
        docs = distributed_docs(
            spark, args.batches * args.batch_docs, seed=17).select(
            "doc_id", "spans")
        schema = docs.schema
        rows = docs.collect()
        for i in range(args.batches):
            chunk = rows[i * args.batch_docs:(i + 1) * args.batch_docs]
            (spark.createDataFrame(chunk, schema).coalesce(1)
             .write.mode("append").parquet(src))
        no_compact = run(spark, src, schema, None)
        compacted = run(spark, src, schema, args.compact_every)
        print(json.dumps({
            "batches": args.batches,
            "batch_docs": args.batch_docs,
            "cores": args.cores,
            "compact_every": args.compact_every,
            "per_batch_ms_no_compaction": no_compact,
            "per_batch_ms_compacted": compacted,
            "last3_avg_no_compaction": round(
                sum(no_compact[-3:]) / 3, 1) if len(no_compact) >= 3 else None,
            "last3_avg_compacted": round(
                sum(compacted[-3:]) / 3, 1) if len(compacted) >= 3 else None,
        }))
    finally:
        shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
