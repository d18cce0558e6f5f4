"""Task config registry — the reference's ``configs.json`` contract.

The reference resolves every matcher invocation through a task registry:
``configs.json`` is a LIST of entries ``{name, task_type, vocab,
trainset, validset, testset}`` loaded as ``{conf['name']: conf}``
(matcher.py:276-278; run_all_er_magellan.py task grid). This module
re-creates that surface for the Spark pipeline: the same file format
and keying, plus the mapping from a task entry + the reference's
preprocessing flags (``--summarize``, ``--dk``, matcher.py:303-306) to
a :class:`~ditto_spark.plans.pipeline.PipelineConfig`.

Dataset paths inside a task entry keep their reference meaning (TSV
labeled-pair files readable via ``sources.io.read_labeled_pairs_tsv``);
at cluster scale they may equally be parquet/Iceberg URIs.
"""

from __future__ import annotations

import json
import os

REQUIRED_KEYS = ("name", "task_type")


def load_task_configs(path: str) -> dict[str, dict]:
    """configs.json (list of task entries) -> {name: entry}, validated
    the way the reference consumes it (duplicate names: LAST wins, the
    dict-comprehension semantics of matcher.py:277)."""
    with open(path) as f:
        entries = json.load(f)
    if not isinstance(entries, list):
        raise ValueError(f"{path!r}: expected a JSON list of task entries")
    out: dict[str, dict] = {}
    for i, conf in enumerate(entries):
        missing = [k for k in REQUIRED_KEYS if k not in conf]
        if missing:
            raise ValueError(
                f"{path!r}[{i}]: missing required keys {missing}")
        out[conf["name"]] = conf
    return out


def get_task(configs: dict[str, dict], task: str) -> dict:
    """Lookup with the reference's failure mode made explicit (a raw
    KeyError there; a named error here)."""
    try:
        return configs[task]
    except KeyError:
        known = ", ".join(sorted(configs)[:10])
        raise KeyError(
            f"unknown task {task!r}; known tasks include: {known}"
        ) from None


def task_pipeline_config(
    conf: dict,
    summarize: bool | None = None,
    dk: bool | None = None,
    max_len: int | None = None,
    threshold: float | None = None,
    **overrides,
):
    """Task entry + the reference's run flags -> PipelineConfig.

    ``summarize``/``dk``/``max_len``/``threshold`` mirror
    matcher.py:303-313 (the per-run preprocessing switches the reference
    passes alongside the task). Each is TRI-STATE: ``None`` (unspecified)
    falls back to the PipelineConfig default, exactly mirroring the CLI's
    --dk/--no-dk resolution — so resolving a task with no flags yields
    the SAME preprocessing (and match decisions) as the no-task pipeline
    default, for direct API callers and the CLI alike."""
    from ditto_spark.plans.pipeline import PipelineConfig

    if conf.get("task_type", "classification") != "classification":
        raise ValueError(
            f"task {conf.get('name')!r}: only classification tasks exist "
            f"in the reference registry (got {conf.get('task_type')!r})")
    dflt = PipelineConfig()
    return PipelineConfig(
        threshold=dflt.threshold if threshold is None else threshold,
        use_summarizer=(dflt.use_summarizer if summarize is None
                        else bool(summarize)),
        summarizer_max_len=(dflt.summarizer_max_len if max_len is None
                            else max_len),
        use_dk=dflt.use_dk if dk is None else bool(dk),
        **overrides,
    )


def dataset_paths(conf: dict, base_dir: str = ".") -> dict[str, str]:
    """The reference's trainset/validset/testset fields, resolved
    relative to ``base_dir`` (the repo-root-relative layout of
    configs.json)."""
    out = {}
    for key in ("trainset", "validset", "testset"):
        if key in conf:
            p = conf[key]
            out[key] = p if os.path.isabs(p) else os.path.join(base_dir, p)
    return out
