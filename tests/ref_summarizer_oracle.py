"""Single-node oracle for the reference pair summarizer.

Direct transcription of /root/reference/ditto_light/summarize.py
``Summarizer.transform`` (:63-109) and the sklearn TfidfVectorizer fit it
relies on (:33-52), kept deliberately close to the reference's control
flow (Counter / most_common / break / remove) so it exercises a DIFFERENT
code path than ditto_spark.operators.summarize_ref. Two determinism
patches, mirrored in the operator and documented there:

  * subset insertion happens in sorted-token order, so most_common's
    stable sort breaks weight ties by token ascending (the reference
    iterates a set — hash-order, unreproducible);
  * the sentence-piece length function is injected (no HF tokenizer
    here).
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Callable

from ditto_spark.operators.summarize_ref import NLTK_STOPWORDS

_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")


def fit_tfidf(entries: list[str]) -> dict[str, float]:
    """sklearn TfidfVectorizer().fit(entries) -> {token: idf}, per the
    library defaults the reference relies on: lowercase, token pattern
    (?u)\\b\\w\\w+\\b, smooth idf = ln((1+N)/(1+df)) + 1."""
    n = len(entries)
    df: Counter = Counter()
    for e in entries:
        for tok in set(_TOKEN_RE.findall(e.lower())):
            df[tok] += 1
    return {t: math.log((1 + n) / (1 + c)) + 1.0 for t, c in df.items()}


def transform(
    sent_a: str,
    sent_b: str,
    idf: dict[str, float],
    max_len: int,
    len_fn: Callable[[str], int],
) -> tuple[str, str]:
    """summarize.py:63-109, with label plumbing dropped (the caller keeps
    labels beside the pair; the reference round-trips them through the
    TSV line)."""
    cnt = Counter()
    for sent in [sent_a, sent_b]:
        tokens = sent.split(' ')
        for token in tokens:
            if token not in ['COL', 'VAL'] and \
               token not in NLTK_STOPWORDS:
                if token in idf:
                    cnt[token] += idf[token]

    res = []
    for sent in [sent_a, sent_b]:
        token_cnt = Counter(sent.split(' '))
        total_len = token_cnt['COL'] + token_cnt['VAL']

        subset = Counter()
        for token in sorted(set(token_cnt.keys())):  # determinism patch
            subset[token] = cnt[token]
        subset = subset.most_common(max_len)

        topk_tokens_copy = set([])
        for word, _ in subset:
            bert_len = len_fn(word)
            if total_len + bert_len > max_len:
                break
            total_len += bert_len
            topk_tokens_copy.add(word)

        out = ''
        for token in sent.split(' '):
            if token in ['COL', 'VAL']:
                out += token + ' '
            elif token in topk_tokens_copy:
                out += token + ' '
                topk_tokens_copy.remove(token)
        res.append(out.rstrip(' '))
    return res[0], res[1]
