"""Regenerate ditto_spark/golden_hashes.json — the committed content
hashes behind ditto_spark.golden.content_gate.

Run ONLY after an INTENTIONAL semantic change to a gated entry (new
model weights, changed blocking config); regenerating to silence a gate
failure defeats its purpose. The tool recomputes each gated entry at
the correctness scale factors, prints old vs new hashes so the diff is
reviewable, and rewrites the JSON.

    PYTHONPATH=/root/repo python tools/make_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# entries whose content is deterministic but not one SQL query — the
# rows-only set from CORRECTNESS_r03; extend when adding a new
# oracle-less entry
GATED = ["er_pipeline_matches", "er_model_scores"]
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def main() -> int:
    import __spark_entry__ as entrymod
    from ditto_spark import golden
    from ditto_spark.session import get_spark

    spark = get_spark("make-golden", cores=8, shuffle_partitions=8)
    old = golden.load_goldens()
    # neutralize the gate while regenerating (the entry functions call it)
    golden._GOLDENS_CACHE = {}
    qs = entrymod.queries()
    out: dict = {k: dict(v) for k, v in old.items()}
    for name in GATED:
        out.setdefault(name, {})
        for sf_dir in SF_DIRS:
            key = os.path.basename(sf_dir)
            n, cols, h = golden.canon_pandas(
                qs[name](spark, sf_dir).toPandas())
            prev = old.get(name, {}).get(key, {})
            mark = ("unchanged" if prev.get("hash") == h
                    else f"CHANGED from {prev.get('hash')}")
            print(f"{name} @ {key}: rows={n} hash={h} ({mark})")
            out[name][key] = {"rows": n, "cols": cols, "hash": h}
    with open(golden.GOLDEN_FILE, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {golden.GOLDEN_FILE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
