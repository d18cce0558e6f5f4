"""Per-stage scaling diagnosis: times each pipeline stage separately at a
given core count.  Usage: python tools/scale_diag.py <cores> <n_docs>"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ditto_spark.operators import blocking as B  # noqa: E402
from ditto_spark.operators.clustering import assign_entities  # noqa: E402
from ditto_spark.operators.knowledge import dk_inject_df  # noqa: E402
from ditto_spark.operators.scoring import SurrogateBackend, score_pairs  # noqa: E402
from ditto_spark.operators.serialize import serialize_docs  # noqa: E402
from ditto_spark.plans.pipeline import sn_key  # noqa: E402
from ditto_spark.session import clear_operator_caches, get_spark  # noqa: E402
from ditto_spark.synth import distributed_docs  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    spark = get_spark(f"diag-{cores}", cores=cores, shuffle_partitions=cores)

    # warm
    from ditto_spark.plans.pipeline import PipelineConfig, run_pipeline
    warm = distributed_docs(spark, 500, seed=3).localCheckpoint()
    run_pipeline(spark, warm, PipelineConfig(sn_window=2))[
        "entities"].write.format("noop").mode("overwrite").save()
    clear_operator_caches(spark)

    docs = distributed_docs(spark, n_docs, seed=11).localCheckpoint()
    stages = {}
    t_all = time.monotonic()

    t0 = time.monotonic()
    serialized = dk_inject_df(
        serialize_docs(docs, drop_empty=True).select("doc_id", "text"),
        ["text"]).localCheckpoint(eager=True)
    stages["serialize"] = time.monotonic() - t0

    t0 = time.monotonic()
    mh = B.minhash_lsh_blocking(serialized, n_hashes=24, bands=6,
                                shingle_n=3, max_bucket_rows=200)
    sn = B.sorted_neighborhood(serialized, sn_key(), window=2)
    candidates = B.union_candidates(mh, sn).localCheckpoint(eager=True)
    stages["block"] = time.monotonic() - t0

    t0 = time.monotonic()
    scored = score_pairs(candidates, 0.5, SurrogateBackend).localCheckpoint(
        eager=True)
    stages["score"] = time.monotonic() - t0

    t0 = time.monotonic()
    entities = assign_entities(docs.select("doc_id"), scored).localCheckpoint(
        eager=True)
    entities.write.format("noop").mode("overwrite").save()
    stages["cluster"] = time.monotonic() - t0

    total = time.monotonic() - t_all
    out = {"cores": cores, "n_docs": n_docs, "total": round(total, 2),
           "docs_per_sec": round(n_docs / total, 1),
           "stages": {k: round(v, 2) for k, v in stages.items()}}
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
