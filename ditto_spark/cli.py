"""spark-submit entry point for the ER pipeline.

Cluster usage (the deployment shape the reference scatters across
Kubeflow pods, hive_ditto_pipeline.py:283-359 — here one Spark app):

    zip -r ditto_spark.zip ditto_spark
    spark-submit --py-files ditto_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        -m ditto_spark.cli -- \\
        --input  s3://.../docs_parquet \\
        --output s3://.../er_out \\
        --checkpoint s3://.../er_ck

Local smoke:

    python -m ditto_spark.cli --synthetic 2000 --output /tmp/er_out
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ditto_spark",
                                description="PySpark ER pipeline")
    p.add_argument("--input", help="parquet dir with (doc_id, spans) docs")
    p.add_argument("--table",
                   help="catalog table to match instead of --input "
                        "(db.t; layout auto-detected: flat 'testing' "
                        "records run the full blocking pipeline, "
                        "pre-paired *_left/*_right 'production' rows "
                        "go straight to scoring)")
    p.add_argument("--limit", type=int,
                   help="LIMIT for --table (sampling dry-runs)")
    p.add_argument("--id-col",
                   help="id column of --table (default: doc_id/id if "
                        "present, else deterministic content-hash ids)")
    p.add_argument("--output-table",
                   help="also save matches to this catalog table "
                        "(set-based saveAsTable, reference result DDL)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic docs instead of --input")
    p.add_argument("--output", required=True, help="output dir")
    p.add_argument("--checkpoint", help="stage-checkpoint dir (resumable)")
    p.add_argument("--threshold", type=float, default=0.5)
    # 24 x 6 = 4-row bands; 2-row bands admit ~28% of jaccard-0.2 noise
    # pairs (see PipelineConfig + BENCH.md methodology note)
    p.add_argument("--minhash-hashes", type=int, default=24)
    p.add_argument("--minhash-bands", type=int, default=6)
    p.add_argument("--sn-window", type=int, default=4)
    p.add_argument("--max-bucket-rows", type=int, default=200)
    p.add_argument("--cores", type=int, default=0,
                   help="local[N] cores (0 = existing/default session)")
    p.add_argument("--backend", choices=["surrogate", "torch", "npz"],
                   default="surrogate",
                   help="pair scorer: deterministic surrogate, a real "
                        "Ditto torch checkpoint, or a CONVERTED npz "
                        "checkpoint (tools/convert_checkpoint.py) run "
                        "by the numpy cross-encoder — no torch needed")
    p.add_argument("--model-checkpoint",
                   help="path to the Ditto model checkpoint "
                        "(required with --backend torch/npz); ship it "
                        "to executors via --files or shared storage")
    p.add_argument("--vocab",
                   help="vocab.txt for --backend npz: tokenize with "
                        "the checkpoint's real WordPiece vocabulary "
                        "(BERT-family); omit for the hash tokenizer")
    p.add_argument("--lm", default="roberta-base",
                   help="HF language model name for --backend torch")
    p.add_argument("--task",
                   help="task name resolved through --configs (the "
                        "reference's configs.json registry, "
                        "matcher.py:276-278)")
    p.add_argument("--configs", default="configs.json",
                   help="path to the task registry JSON (list of "
                        "{name, task_type, ...} entries)")
    p.add_argument("--summarize", action="store_true",
                   help="TF-IDF summarization preprocessing "
                        "(matcher.py --summarize)")
    p.add_argument("--dk", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="domain-knowledge injection (matcher.py --dk); "
                        "--no-dk disables it; default = pipeline "
                        "default (on), identical with or without --task")
    p.add_argument("--max-len", type=int, default=64,
                   help="summarizer token budget (matcher.py --max_len)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.input and not args.synthetic and not args.table:
        print("need --input, --table or --synthetic", file=sys.stderr)
        return 2

    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
    from ditto_spark.session import get_spark
    from ditto_spark.sources.checkpoint import CheckpointStore
    from ditto_spark.sources.io import write_matches_table

    spark = get_spark("ditto_spark_cli",
                      cores=args.cores if args.cores else None)
    if args.table:
        docs = None
    elif args.synthetic:
        from ditto_spark.synth import distributed_docs

        docs = distributed_docs(spark, args.synthetic)
    else:
        docs = spark.read.parquet(args.input)

    if args.backend == "torch":
        if not args.model_checkpoint:
            print("--backend torch requires --model-checkpoint",
                  file=sys.stderr)
            return 2
        from ditto_spark.operators.scoring import TorchDittoBackend

        ckpt, lm = args.model_checkpoint, args.lm

        def backend_factory():
            return TorchDittoBackend(ckpt, lm=lm)

        # checkpoint fingerprints must see WHICH model scores the pairs
        backend_factory.fingerprint = f"torch:{ckpt}:{lm}"
    elif args.backend == "npz":
        if not args.model_checkpoint:
            print("--backend npz requires --model-checkpoint",
                  file=sys.stderr)
            return 2
        from ditto_spark.operators.npmodel import load_checkpoint

        load_checkpoint(args.model_checkpoint)  # fail fast driver-side
        ckpt, vocab = args.model_checkpoint, args.vocab

        def backend_factory():
            # executed lazily per python worker (module-level backend
            # cache in scoring) — the npz loads once per executor
            from ditto_spark.operators.npmodel import (NumpyDittoBackend,
                                                       load_checkpoint)

            return NumpyDittoBackend(weights=load_checkpoint(ckpt),
                                     vocab_path=vocab)

        backend_factory.fingerprint = f"npz:{ckpt}:{vocab}"
    else:
        from ditto_spark.operators.scoring import SurrogateBackend

        backend_factory = SurrogateBackend

    shared = dict(
        minhash_hashes=args.minhash_hashes,
        minhash_bands=args.minhash_bands,
        sn_window=args.sn_window,
        max_bucket_rows=args.max_bucket_rows,
        backend_factory=backend_factory,
    )
    # one DK resolution for BOTH branches: tri-state --dk/--no-dk, the
    # pipeline default when unspecified — adding --task must not change
    # preprocessing (and with it fp_ser + match decisions) silently
    use_dk = PipelineConfig().use_dk if args.dk is None else args.dk
    if args.task:
        # resolve through the registry (validates the task exists and is
        # a classification entry) and apply the reference's run flags
        from ditto_spark.configs import (get_task, load_task_configs,
                                         task_pipeline_config)

        conf = get_task(load_task_configs(args.configs), args.task)
        cfg = task_pipeline_config(
            conf, summarize=args.summarize, dk=use_dk,
            max_len=args.max_len, threshold=args.threshold, **shared)
    else:
        cfg = PipelineConfig(
            threshold=args.threshold,
            use_summarizer=args.summarize,
            summarizer_max_len=args.max_len,
            use_dk=use_dk,
            **shared,
        )
    store = (CheckpointStore(spark, args.checkpoint)
             if args.checkpoint else None)
    t0 = time.monotonic()
    if args.table:
        from ditto_spark.plans.pipeline import run_table_pipeline

        out = run_table_pipeline(spark, args.table, cfg, store=store,
                                 limit=args.limit, id_col=args.id_col,
                                 output_table=args.output_table)
    else:
        input_id = args.input or f"synthetic:{args.synthetic}"
        out = run_pipeline(spark, docs, cfg, store=store,
                           input_id=input_id)
        if args.output_table:
            from ditto_spark.sources.io import write_matches_catalog_table

            write_matches_catalog_table(out["matches"], args.output_table)
    write_matches_table(out["matches"], f"{args.output}/matches")
    stats = {
        "matches": out["matches"].filter("match = 1").count(),
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    if "entities" in out:  # production-layout tables have no clustering
        out["entities"].write.mode("overwrite").parquet(
            f"{args.output}/entities")
        n_docs = out["entities"].count()
        stats["docs"] = n_docs
        stats["entities"] = (out["entities"].select("entity_id")
                             .distinct().count())
        stats["docs_per_sec"] = round(n_docs / stats["wall_sec"], 1)
    if args.table:
        stats["layout"] = out["layout"]
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
