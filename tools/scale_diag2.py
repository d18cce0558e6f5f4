"""Per-stage scaling diagnosis mirroring bench._leg exactly: reads the
pre-materialized spans parquet, times each pipeline stage separately.

Usage: python tools/scale_diag2.py <cores> <n_docs> [native|model]
(corpus must exist at /tmp/ditto_spark_scale_docs_<n_docs>; create via
 `python bench.py --scaling` prep or bench._prepare_scale_docs)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ditto_spark.operators import blocking as B  # noqa: E402
from ditto_spark.operators.clustering import assign_entities  # noqa: E402
from ditto_spark.plans.pipeline import (PipelineConfig, _preprocess,  # noqa: E402
                                        run_pipeline, sn_key)
from ditto_spark.session import clear_operator_caches, get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    scorer = sys.argv[3] if len(sys.argv) > 3 else "model"
    spark = get_spark(f"diag2-{cores}", cores=cores,
                      shuffle_partitions=cores)

    from bench import scorer_config  # single source of leg configs

    cfg = scorer_config(scorer)

    path = f"/tmp/ditto_spark_scale_docs_{n_docs}"
    docs = spark.read.parquet(path)
    warm = docs.limit(500).localCheckpoint()
    run_pipeline(spark, warm, cfg)[
        "entities"].write.format("noop").mode("overwrite").save()
    clear_operator_caches(spark)

    stages = {}
    t_all = time.monotonic()

    t0 = time.monotonic()
    serialized = _preprocess(spark, docs, cfg).localCheckpoint(eager=True)
    stages["serialize"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    mh = B.minhash_lsh_blocking(serialized, n_hashes=cfg.minhash_hashes,
                                bands=cfg.minhash_bands,
                                shingle_n=cfg.shingle_n,
                                max_bucket_rows=cfg.max_bucket_rows,
                                with_texts=False)
    sn = B.sorted_neighborhood(serialized, sn_key(), window=cfg.sn_window,
                               with_texts=False)
    candidates = B.union_candidates(mh, sn).localCheckpoint(eager=True)
    stages["block"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    if scorer in ("model", "prod"):
        from ditto_spark.operators.scoring import score_pairs

        cands = B.attach_texts(candidates, serialized)
        scored = score_pairs(cands, cfg.threshold,
                             cfg.backend_factory).localCheckpoint(eager=True)
    else:
        from ditto_spark.operators.scoring import score_id_pairs_native

        scored = score_id_pairs_native(
            candidates, serialized, cfg.threshold).localCheckpoint(eager=True)
    stages["score"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    entities = assign_entities(docs.select("doc_id"), scored)
    entities.write.format("noop").mode("overwrite").save()
    stages["cluster"] = round(time.monotonic() - t0, 2)

    total = round(time.monotonic() - t_all, 2)
    # counts AFTER the timed section, over already-materialized frames
    # (scored/candidates are eager localCheckpoints) — diagnostics, not
    # measured work
    print(json.dumps({"cores": cores, "n_docs": n_docs, "scorer": scorer,
                      "total": total,
                      "docs_per_sec": round(n_docs / total, 1),
                      "stages": stages,
                      "n_candidates": candidates.count(),
                      "n_matches": scored.filter("match = 1").count(),
                      "n_entities": entities.select("entity_id")
                      .distinct().count(),
                      }))
    spark.stop()


if __name__ == "__main__":
    main()
