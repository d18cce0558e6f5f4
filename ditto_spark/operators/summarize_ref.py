"""Reference-exact pair summarizer (SURVEY.md P7, fidelity path).

This is the semantics-faithful re-creation of the reference summarizer
(/root/reference/ditto_light/summarize.py:54-109) for PAIRS, as required
for bit-compatibility with reference-trained checkpoints. The existing
``summarize.py`` keeps the order-preserving per-document variant (better
round-trip properties, used by the showcase pipeline); THIS module
replicates the reference rules exactly:

  * one idf Counter per PAIR, shared by both sides: every token
    OCCURRENCE (not distinct token) in either side adds its idf weight,
    skipping COL/VAL markers and NLTK english stopwords, and only tokens
    present in the fitted vocabulary contribute (:76-84);
  * per side: the budget is counted in sentence-piece lengths via a
    tokenizer length function with a per-word cache, and the side's
    COL/VAL occurrence counts are charged against the budget up front
    (:86-91);
  * candidate tokens are the side's distinct tokens ranked by the shared
    pair idf counter, truncated to the top ``max_len`` (:93-95
    most_common); the selection loop BREAKS at the first word that would
    overflow the budget — later, shorter words are NOT considered
    (:97-101);
  * emission walks the side's tokens in original order; COL/VAL always
    pass through; a kept token is emitted only ONCE (removed from the
    kept set on first emission, :103-109).

Deliberate, documented deviations (both unavoidable in any re-creation):
  * most_common tie order in the reference depends on Python set-iteration
    order (hash randomization) — not reproducible even by the reference
    itself across processes. Ties here break deterministically by token
    string ascending.
  * the sentence-piece length function is pluggable (``len_fn``); with
    transformers installed pass the real LM tokenizer's
    ``lambda w: len(tok.tokenize(w))`` (summarize.py:54-61). The default
    is a deterministic surrogate so the budget arithmetic is exercised
    end-to-end without HF downloads.

Spark split: the TF-IDF fit is a native aggregation (one shuffle),
collected into a bounded broadcast dict exactly like the reference's
in-process sklearn index; the per-pair transform runs in one mapInPandas
pass (Arrow batches; the algorithm is inherently sequential per row).
"""

from __future__ import annotations

import math
import os
from collections import Counter
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Frozen copy of the NLTK english stopword list (public corpus; the
# reference imports it at summarize.py:12). Embedded because nltk is not
# installable here; list order is irrelevant (set membership only).
NLTK_STOPWORDS = frozenset("""
i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself
it it's its itself they them their theirs themselves what which who whom
this that that'll these those am is are was were be been being have has
had having do does did doing a an the and but if or because as until
while of at by for with about against between into through during before
after above below to from up down in out on off over under again further
then once here there when where why how all any both each few more most
other some such no nor not only own same so than too very s t can will
just don don't should should've now d ll m o re ve y ain aren aren't
couldn couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven
haven't isn isn't ma mightn mightn't mustn mustn't needn needn't shan
shan't shouldn shouldn't wasn wasn't weren weren't won won't wouldn
wouldn't
""".split())

MARKERS = ("COL", "VAL")


def default_len_fn(word: str) -> int:
    """Deterministic surrogate for the LM sentence-piece length: roughly
    one piece per 4 characters, minimum 1 for a nonempty word (the real
    tokenizer yields 0 pieces for ''), which tracks wordpiece growth on
    long/rare tokens closely enough to exercise the budget arithmetic."""
    if not word:
        return 0
    return max(1, -(-len(word) // 4))


# checked-in fixture piece vocabulary for wordpiece_len_fn: single
# chars + digits + common English affixes, enough for a REALISTIC
# (vocabulary-driven, non-uniform) budget in deployments without HF
FIXTURE_VOCAB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "wordpiece_fixture.vocab")


def load_wordpiece_vocab(path: str | None = None) -> frozenset[str]:
    """Load a wordpiece vocabulary (one piece per line, '##' prefix on
    continuation pieces — the standard BERT vocab.txt format, so a real
    LM's vocab file drops in directly). Default: the checked-in
    fixture."""
    with open(path or FIXTURE_VOCAB_PATH, encoding="utf-8") as f:
        return frozenset(line.strip() for line in f if line.strip())


def wordpiece_len_fn(
    vocab: frozenset[str] | set[str] | None = None,
    max_chars_per_word: int = 100,
) -> Callable[[str], int]:
    """Factory for a ``len_fn`` that counts GREEDY LONGEST-MATCH-FIRST
    wordpiece segments over ``vocab`` — the public BertTokenizer
    algorithm the reference's budget runs on
    (/root/reference/ditto_light/summarize.py:54-61 charges
    ``len(tokenizer.tokenize(word))`` per kept word). With transformers
    available, pass the real LM's ``vocab.txt`` through
    ``load_wordpiece_vocab``; without it, the checked-in fixture vocab
    gives a realistic non-uniform budget (VERDICT r3 #6). Semantics
    match HF WordpieceTokenizer: unmatchable remainder -> [UNK]
    (1 piece total for the word), words longer than
    ``max_chars_per_word`` -> [UNK]."""
    vb = load_wordpiece_vocab() if vocab is None else frozenset(vocab)

    def len_fn(word: str) -> int:
        w = word.lower()
        if not w:
            return 0
        if len(w) > max_chars_per_word:
            return 1  # [UNK]
        pieces = 0
        start = 0
        while start < len(w):
            end = len(w)
            found = None
            while start < end:
                sub = w[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vb:
                    found = end
                    break
                end -= 1
            if found is None:
                # HF WordpieceTokenizer's is_bad path: ANY unmatchable
                # remainder makes the WHOLE word a single [UNK] — the
                # already-matched prefix pieces are discarded (ADVICE r4)
                return 1
            pieces += 1
            start = found
        return pieces

    return len_fn


def build_ref_tfidf(
    spark: SparkSession,
    entries: DataFrame,
    text_col: str = "text",
    max_vocab: int | None = None,
    token_pattern: str = r"(?U)\b\w\w+\b",
) -> dict[str, float]:
    """Fit the TF-IDF index the way the reference does (summarize.py:33-52
    via sklearn TfidfVectorizer defaults): tokens are the regex
    ``\\b\\w\\w+\\b`` over the LOWERCASED entry (>=2 word chars, unicode
    classes), document frequency counts entries containing the token, and
    idf(t) = ln((1+N)/(1+df(t))) + 1 (smooth).

    Native plan: regexp_extract_all -> array_distinct -> explode ->
    groupBy(token).count(); the dict is driver-side like the reference's
    in-process index. ``max_vocab`` (top-df, tie by token) bounds the
    broadcast for huge corpora — None reproduces sklearn exactly: OOV
    tokens contribute NOTHING to the pair counter (summarize.py:83-84),
    so under a cap rare dropped tokens score 0 instead of high-idf.
    """
    n_docs = entries.count()
    toks = entries.select(
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower(F.col(text_col)),
                                     F.lit(token_pattern), 0)
            )
        ).alias("token")
    )
    dfreq = toks.groupBy("token").agg(F.count("*").alias("df"))
    if max_vocab is not None:
        dfreq = dfreq.orderBy(F.desc("df"), F.asc("token")).limit(max_vocab)
    rows = dfreq.collect()
    return {
        r["token"]: math.log((1 + n_docs) / (1 + r["df"])) + 1.0
        for r in rows
    }


def summarize_pair_py(
    sent_a: str,
    sent_b: str,
    vocab_idf: dict[str, float],
    max_len: int = 128,
    len_fn: Callable[[str], int] = default_len_fn,
    weight_round: int | None = None,
) -> tuple[str, str]:
    """One pair, reference transform semantics (summarize.py:63-109).
    Pure function — shared by the Spark operator and the tests.
    ``weight_round`` rounds the pair-counter weights before ranking —
    None (the operator default) is reference-exact; cross-engine oracle
    queries set it so a 1-ulp libm log() difference between engines
    cannot flip the rank order of two nearly-tied tokens."""
    # pair-shared idf counter: one increment per token OCCURRENCE
    cnt: dict[str, float] = {}
    for sent in (sent_a, sent_b):
        for token in sent.split(" "):
            if token in MARKERS or token in NLTK_STOPWORDS:
                continue
            w = vocab_idf.get(token)
            if w is not None:
                cnt[token] = cnt.get(token, 0.0) + w
    if weight_round is not None:
        cnt = {t: round(w, weight_round) for t, w in cnt.items()}
    out: list[str] = []
    for sent in (sent_a, sent_b):
        tokens = sent.split(" ")
        token_cnt = Counter(tokens)
        total_len = token_cnt["COL"] + token_cnt["VAL"]
        # most_common(max_len) with deterministic ties (see module doc)
        cand = sorted(set(tokens),
                      key=lambda t: (-cnt.get(t, 0.0), t))[:max_len]
        kept: set[str] = set()
        for word in cand:
            piece_len = len_fn(word)
            if total_len + piece_len > max_len:
                break  # reference breaks — later shorter words are lost
            total_len += piece_len
            kept.add(word)
        emitted: list[str] = []
        for token in tokens:
            if token in MARKERS:
                emitted.append(token)
            elif token in kept:
                emitted.append(token)
                kept.remove(token)  # emit once
        out.append(" ".join(emitted))
    return out[0], out[1]


def summarize_pairs_ref(
    pairs: DataFrame,
    vocab_idf: dict[str, float],
    max_len: int = 128,
    left_col: str = "left_text",
    right_col: str = "right_text",
    len_fn: Callable[[str], int] = default_len_fn,
    weight_round: int | None = None,
) -> DataFrame:
    """Apply the reference pair summarizer to (left_text, right_text)
    columns: broadcast index, one Arrow-batched mapInPandas pass, schema
    preserved."""
    spark = pairs.sparkSession
    bc = spark.sparkContext.broadcast(vocab_idf)
    schema = pairs.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idf = bc.value
        for pdf in batches:
            la, rb = [], []
            for a, b in zip(pdf[left_col].fillna(""),
                            pdf[right_col].fillna("")):
                sa, sb = summarize_pair_py(a, b, idf, max_len, len_fn,
                                           weight_round)
                la.append(sa)
                rb.append(sb)
            pdf[left_col] = la
            pdf[right_col] = rb
            yield pdf

    return pairs.mapInPandas(run, schema)
