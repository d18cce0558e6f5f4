"""Text-analysis functions for large-scale training-data pipelines.

Beyond the reference's operator set (its text handling stops at COL/VAL
serialization + TF-IDF summarization), these are the document-corpus
operations a 100TB pretraining pipeline needs: language ID, quality
scoring, token counting, fingerprinting. Every function here is a native
column expression (whole-stage codegen, zero Python) and each has an
exact DuckDB-SQL twin in __spark_entry__.oracle_sql for the correctness
gate.

Determinism/portability notes:
  * hashes use the portable md5-prefix bigint (operators/hashing.py);
  * arithmetic stays far from int64 overflow (Spark 4 runs ANSI mode);
  * tie-breaks are total orders.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ditto_spark.operators.hashing import porthash

# small per-language stopword profiles (n-gram-heuristic lang ID)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "wie",
           "den"],
}

# word / number / single-symbol pieces — the BPE-ish pre-tokenizer regex
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens (lowercased), empties dropped."""
    return F.filter(F.split(F.lower(F.trim(col)), r"\s+"),
                    lambda t: t != F.lit(""))


def token_count_ws(col: Column, toks: Column | None = None) -> Column:
    """``toks`` (a pre-materialized ws_tokens column) lets callers that
    compute several text statistics share ONE tokenization — the raw
    expression is re-evaluated per consumer otherwise (codegen CSE does
    not always span sibling output columns; measured 1.5x on the
    text_stats projection at sf0.1)."""
    return F.size(toks if toks is not None else ws_tokens(col))


def token_count_bpe(col: Column) -> Column:
    """Count of BPE-ish pieces (letter runs / digit runs / single symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), 0))


def lang_scores(col: Column,
                toks: Column | None = None) -> list[tuple[str, Column]]:
    toks = F.array_distinct(toks if toks is not None else ws_tokens(col))
    return [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in LANG_PROFILES.items()
    ]


def lang_id(col: Column, toks: Column | None = None) -> Column:
    """argmax over language stopword-hit counts; deterministic tie-break
    by profile order; 'und' (undetermined) when nothing hits."""
    scores = lang_scores(col, toks)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # forward iteration with strict '>' means the EARLIEST profile wins
    # ties (a later equal score never replaces) — matching the oracle's
    # CASE chain ordering
    for lang, score in scores:
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


def quality_features(col: Column,
                     toks: Column | None = None) -> dict[str, Column]:
    n_chars = F.length(col)
    toks = toks if toks is not None else ws_tokens(col)
    n_words = F.size(toks)
    # every [^\w\s] match is exactly one char, so the match COUNT equals
    # the length delta after deleting them — no per-row match-array
    # allocation (regexp_extract_all built a string array just to size)
    n_punct = n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in LANG_PROFILES["en"]]),
        )
    )
    mean_word_len = F.when(
        n_words > 0,
        (n_chars - (n_words - 1)).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": F.when(n_chars > 0,
                              n_punct.cast("double") / n_chars
                              ).otherwise(F.lit(0.0)),
        "stopword_hits": n_stop,
        "mean_word_len": mean_word_len,
    }


def quality_score(col: Column, toks: Column | None = None) -> Column:
    """Heuristic quality in [0,1]: rewards mid-length docs with some
    stopwords and low symbol noise (the C4/Gopher-style rule family,
    reduced to a deterministic closed form)."""
    f = quality_features(col, toks)
    len_ok = F.when((f["n_words"] >= 5) & (f["n_words"] <= 10000), 1.0
                    ).otherwise(0.3)
    stop_ok = F.when(f["stopword_hits"] >= 2, 1.0).otherwise(0.5)
    wl = f["mean_word_len"]
    wl_ok = F.when((wl >= 2.0) & (wl <= 12.0), 1.0).otherwise(0.4)
    punct_pen = F.when(f["punct_ratio"] <= 0.2, 1.0).otherwise(0.6)
    return F.round(0.4 * len_ok + 0.2 * stop_ok + 0.2 * wl_ok
                   + 0.2 * punct_pen, 6)


FP_MOD = 1_000_000_007


def fingerprint(col: Column, toks: Column | None = None) -> Column:
    """Order-sensitive document fingerprint: position-weighted sum of
    portable word hashes mod 1e9+7 (a rolling-hash family member that is
    exactly reproducible in SQL). The accumulator reduces mod FP_MOD at
    every step, so the running value stays < 1e9 + term (term < 1e9 * n;
    no int64 overflow under ANSI for any document below ~9e9 tokens);
    modular addition makes this equal to the oracle's sum-then-mod."""
    toks = toks if toks is not None else ws_tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks))
    terms = F.zip_with(
        toks, idx,
        lambda t, i: (porthash(t) % FP_MOD) * i,
    )
    return F.aggregate(terms, F.lit(0).cast("long"),
                       lambda acc, x: (acc + x) % FP_MOD)
