"""Regenerate ditto_spark/golden_hashes.json — the committed content
hashes behind ditto_spark.golden.content_gate.

Run ONLY after an INTENTIONAL semantic change to a gated entry (new
model weights, changed blocking config); regenerating to silence a gate
failure defeats its purpose. Three safeguards enforce that:

1. **git-dirty check**: refuses to run unless the operator tree
   (ditto_spark/ + __spark_entry__.py) is clean in git, so a golden can
   never be minted from uncommitted — unreviewable — engine state.
   Override with --force only for local experiments.
2. **independent generation** (VERDICT r4 #3): the er_pipeline_matches
   golden is computed by tools/independent_oracle.pipeline_matches — a
   Spark-free pure-Python recompute sharing no execution with the
   engine — and the engine's own result must MATCH it before anything
   is written. The golden therefore certifies two independent
   implementations agreeing, not the engine agreeing with itself.
3. **decision cross-check**: er_model_scores' golden stays engine-
   generated (p1 is not bit-stable across the padded/batched vs solo
   forward — see tests/test_model_gate.py), but the tool refuses to
   write it unless the engine's pair set and match DECISIONS are
   identical to the unpadded single-pair oracle
   (tests/reference_model_oracle.py) and p1 agrees within 1e-5.

    PYTHONPATH=/root/repo python tools/make_golden.py [--force]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATED = ["er_pipeline_matches", "er_model_scores"]
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _operator_tree_dirty() -> list[str]:
    out = subprocess.run(
        ["git", "status", "--porcelain", "--", "ditto_spark",
         "__spark_entry__.py"],
        cwd=REPO, capture_output=True, text=True)
    return [ln for ln in out.stdout.splitlines() if ln.strip()]


def main(argv: list[str]) -> int:
    force = "--force" in argv
    dirty = _operator_tree_dirty()
    if dirty and not force:
        print("REFUSING to regenerate goldens: the operator tree is dirty "
              "in git — commit (or stash) first so the golden provenance "
              "is reviewable, or pass --force for a local experiment:")
        for ln in dirty:
            print(f"  {ln}")
        return 2

    import __spark_entry__ as entrymod
    from ditto_spark import golden
    from ditto_spark.session import get_spark
    from tools.independent_oracle import (model_score_decisions,
                                          pipeline_matches)

    spark = get_spark("make-golden", cores=8, shuffle_partitions=8)
    old = golden.load_goldens()
    # neutralize the gate while regenerating (the entry functions call it)
    golden._GOLDENS_CACHE = {}
    qs = entrymod.queries()
    out: dict = {k: dict(v) for k, v in old.items()}
    for sf_dir in SF_DIRS:
        key = os.path.basename(sf_dir)

        # er_pipeline_matches: golden FROM the independent path; the
        # engine must agree before we write
        n_o, cols_o, h_o = golden.canon_pandas(pipeline_matches(sf_dir))
        eng = qs["er_pipeline_matches"](spark, sf_dir).toPandas()
        n_e, cols_e, h_e = golden.canon_pandas(eng)
        if (n_o, h_o) != (n_e, h_e):
            print(f"ABORT: engine er_pipeline_matches @ {key} "
                  f"(rows={n_e} hash={h_e}) disagrees with the "
                  f"independent oracle (rows={n_o} hash={h_o}) — fix the "
                  "divergence; do not mint a golden from either side.")
            return 3
        prev = old.get("er_pipeline_matches", {}).get(key, {})
        mark = ("unchanged" if prev.get("hash") == h_o
                else f"CHANGED from {prev.get('hash')}")
        print(f"er_pipeline_matches @ {key}: rows={n_o} hash={h_o} "
              f"({mark}; independent-path generated, engine concurs)")
        out.setdefault("er_pipeline_matches", {})[key] = {
            "rows": n_o, "cols": cols_o, "hash": h_o}

        # er_model_scores: engine-generated golden, decision-gated by
        # the unpadded single-pair oracle
        ms = qs["er_model_scores"](spark, sf_dir).toPandas()
        n, cols, h = golden.canon_pandas(ms)  # hash BEFORE the id cast below
        ora = model_score_decisions(sf_dir)
        for df in (ms, ora):
            df["left_id"] = df["left_id"].astype(str)
            df["right_id"] = df["right_id"].astype(str)
        merged = ms.merge(ora, on=["left_id", "right_id"], how="outer",
                          indicator=True)
        pair_miss = int((merged._merge != "both").sum())
        dec_miss = int((merged.match_x != merged.match_y).sum())
        p1_gap = float((merged.p1r - merged.p1.round(6)).abs().max())
        if pair_miss or dec_miss or p1_gap >= 1e-5:
            print(f"ABORT: engine er_model_scores @ {key} fails the "
                  f"single-pair oracle cross-check (pair mismatches="
                  f"{pair_miss}, decision disagreements={dec_miss}, "
                  f"max|p1 gap|={p1_gap:.2e} vs 1e-5 bound).")
            return 3
        prev = old.get("er_model_scores", {}).get(key, {})
        mark = ("unchanged" if prev.get("hash") == h
                else f"CHANGED from {prev.get('hash')}")
        print(f"er_model_scores @ {key}: rows={n} hash={h} "
              f"({mark}; decisions cross-checked vs single-pair oracle)")
        out.setdefault("er_model_scores", {})[key] = {
            "rows": n, "cols": cols, "hash": h}

    with open(golden.GOLDEN_FILE, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {golden.GOLDEN_FILE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
