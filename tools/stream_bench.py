"""Per-batch latency of the incremental-ER stream.

Evidence for the streaming scale story: per-micro-batch cost must be
driven by the batch (plus the touched components), not by total corpus
age. Streams N batches of B synthetic docs through
``incremental_entities`` twice — without compaction and with
``compact_every`` — and prints one JSON line with per-batch
triggerExecution ms for both runs. Without compaction the label
resolve scans one partition per prior batch (per-batch cost creeps up
with stream age); inline compaction bounds the history, flattening the
tail.

  PYTHONPATH=/root/repo python tools/stream_bench.py \
      [--batches 12] [--batch-docs 2000] [--compact-every 4] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch-docs", type=int, default=2000)
    ap.add_argument("--compact-every", type=int, default=4)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

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
