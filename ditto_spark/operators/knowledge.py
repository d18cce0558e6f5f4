"""Domain-knowledge injection (SURVEY.md P8).

Reference (ditto_light/knowledge.py): a spacy NER pass inserts type tokens
(PRODUCT/NUM or PERSON/ORG/LOC/DATE...) before recognized spans
(:78-85, :135-139), normalizes numbers (ints '%d', floats '%.2f',
:91-100), and tags long alphanumeric tokens as ID (:101-103).

spacy is not available in this environment, so the engine ships the
regex-rule subset — exactly the number-normalization and ID rules, which
are the deterministic portion of the reference's injector — behind the
same operator interface. A spacy-backed injector can be dropped in as
another ``transform`` callable without touching the pipeline (the
reference's own general/product injectors share one interface,
knowledge.py:27-50).

Implementation is one native column expression chain over the token
stream — regexp-based, whole-stage-codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INT = r"^[-+]?\d+$"
_FLOAT = r"^[-+]?\d*\.\d+$"
# long alnum mixing letters+digits => ID (knowledge.py:101-103);
# decomposed into lookahead-free pieces so RE2-based engines (the DuckDB
# oracle) can reproduce the predicate exactly
_ID_SHAPE = r"^[A-Za-z0-9\-]{8,}$"
_HAS_ALPHA = r"[A-Za-z]"
_HAS_DIGIT = r"\d"


def dk_token(t: Column) -> Column:
    """Per-token typed rewrite:
    int    -> 'NUM <d>'      (int normalization %d)
    float  -> 'NUM <x.xx>'   (float normalization %.2f)
    id     -> 'ID <token>'
    other  -> token unchanged
    """
    as_float = t.cast("double")
    # int rewrite only when the token fits int64 (<= 18 digits); longer
    # digit runs pass through unchanged — casting would null out (or,
    # under ANSI, throw on) e.g. 20-digit order numbers and concat_ws
    # would silently delete the token
    int_ok = t.rlike(_INT) & (F.length(F.regexp_replace(t, r"[-+]", ""))
                              <= 18)
    return (
        F.when(int_ok,
               F.concat(F.lit("NUM "),
                        F.format_string("%d", t.cast("long"))))
        .when(t.rlike(_FLOAT),
              F.concat(F.lit("NUM "), F.format_string("%.2f", as_float)))
        .when(t.rlike(_ID_SHAPE) & t.rlike(_HAS_ALPHA) & t.rlike(_HAS_DIGIT),
              F.concat(F.lit("ID "), t))
        .otherwise(t)
    )


def dk_inject(col: Column) -> Column:
    """Apply dk_token across the whitespace token stream, preserving
    order; COL/VAL markers pass through the 'other' branch untouched."""
    toks = F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))
    return F.concat_ws(" ", F.transform(toks, dk_token))


def dk_inject_df(df: DataFrame, text_cols: list[str]) -> DataFrame:
    out = df
    for c in text_cols:
        out = out.withColumn(c, dk_inject(F.col(c)))
    return out
