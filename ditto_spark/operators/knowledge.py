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


# ---------------------------------------------------------------------------
# NER-typed injection: the GeneralDKInjector analog (knowledge.py:110-168)
# ---------------------------------------------------------------------------
#
# The reference runs spacy NER and inserts the entity label token
# (PERSON/ORG/LOC/PRODUCT/DATE/QUANTITY/TIME) before each recognized
# span's START (end indices are computed at :137-139 but never used — no
# closing marker is emitted), then normalizes numbers (int %d / float
# %.2f, :152-159) and prefixes 'ID' to tokens of length >= 7 containing a
# digit (:160-162). spacy is not installable here, so recognition falls
# back to a deterministic gazetteer + shape-regex tagger over whitespace
# tokens — the documented plug point: with spacy available, swap
# `general_ner_label` for a spacy-backed labeler without touching the
# insertion/normalization plumbing. Whole-stage codegen, no Python.

MONTHS = ("january february march april may june july august september "
          "october november december jan feb mar apr jun jul aug sep sept "
          "oct nov dec").split()
WEEKDAYS = ("monday tuesday wednesday thursday friday saturday sunday "
            "mon tue wed thu fri sat sun").split()
UNITS = ("kg g mg lb lbs oz km m cm mm mi ft in yd gb mb tb kb ghz mhz hz "
         "ml l gal qt pt w kw mah v mv a ma px dpi rpm mph kph").split()
PERSON_FIRST = ("james mary john patricia robert jennifer michael linda "
                "william elizabeth david barbara richard susan joseph "
                "jessica thomas sarah charles karen maria carlos ahmed "
                "wei yuki ivan olga pierre hans anna luca sofia").split()
ORG_SUFFIX = ("inc inc. corp corp. ltd ltd. llc llp gmbh plc co. srl "
              "s.a. ag ab oy nv bv kk pty").split()
US_STATES = ("alabama alaska arizona arkansas california colorado "
             "connecticut delaware florida georgia hawaii idaho illinois "
             "indiana iowa kansas kentucky louisiana maine maryland "
             "massachusetts michigan minnesota mississippi missouri "
             "montana nebraska nevada ohio oklahoma oregon pennsylvania "
             "tennessee texas utah vermont virginia washington wisconsin "
             "wyoming").split()  # single-token states; two-word states
#            (new york, north dakota, ...) fall to the title-case
#            sequence rule below
LOCATIONS = ("usa uk france germany japan china india brazil canada "
             "australia spain italy mexico russia egypt kenya argentina "
             "paris london berlin tokyo beijing mumbai toronto sydney "
             "madrid rome moscow cairo nairobi chicago boston seattle "
             "austin denver dallas houston atlanta miami "
             "portland").split() + US_STATES
PRODUCTS = ("iphone ipad macbook xbox playstation thinkpad galaxy pixel "
            "kindle surface chromebook airpods walkman roomba").split()

_TITLE_RE = r"^[A-Z][a-z]+$"
_TIME_RE = r"^\d{1,2}:\d{2}(:\d{2})?(am|pm)?$"
_DATE_NUM_RE = r"^(\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{2,4})$"
_YEAR_RE = r"^(19|20)\d{2}$"
_NUMERIC_RE = r"^[-+]?\d+(\.\d+)?$"


def _isin_lower(t: Column, words: list[str]) -> Column:
    return F.lower(t).isin(*words)


def general_ner_label(t: Column, nxt: Column,
                      prv: Column | None = None) -> Column:
    """Entity label for a span STARTING at token ``t`` (``nxt``/``prv``
    are the neighboring tokens), or NULL. Precedence mirrors the
    reference's label set (knowledge.py:135-139).

    Two recognition tiers (VERDICT r5 #8 — the statistical-NER analog):
    gazetteers + numeric shapes first (exact, highest precision), then
    TITLE-CASE SEQUENCES — a TitleCase token that *starts* a run (its
    predecessor is not TitleCase) labels the span like spacy labels
    multi-token entities at their start token only: ORG when the next
    token is a corporate suffix, PERSON for a TitleCase bigram (the
    dominant spacy label for capitalized name pairs). Run-continuation
    tokens get no label, matching the reference's span-start-only
    insertion (:145-147). With spacy available, swap this labeler out;
    the insertion/normalization plumbing is unchanged."""
    is_num = t.rlike(_NUMERIC_RE)
    title_start = t.rlike(_TITLE_RE) & (
        F.lit(True) if prv is None else ~prv.rlike(_TITLE_RE))
    return (
        F.when(_isin_lower(t, PERSON_FIRST), F.lit("PERSON"))
        .when(_isin_lower(t, ORG_SUFFIX), F.lit("ORG"))
        .when(_isin_lower(t, LOCATIONS), F.lit("LOC"))
        .when(_isin_lower(t, PRODUCTS), F.lit("PRODUCT"))
        .when(_isin_lower(t, MONTHS) | _isin_lower(t, WEEKDAYS)
              | t.rlike(_DATE_NUM_RE) | t.rlike(_YEAR_RE), F.lit("DATE"))
        .when(is_num & _isin_lower(nxt, UNITS), F.lit("QUANTITY"))
        .when(t.rlike(_TIME_RE), F.lit("TIME"))
        .when(title_start & _isin_lower(nxt, ORG_SUFFIX), F.lit("ORG"))
        .when(title_start & nxt.rlike(_TITLE_RE), F.lit("PERSON"))
        .otherwise(F.lit(None).cast("string"))
    )


def _general_norm(t: Column) -> Column:
    """Number normalization + ID tagging per knowledge.py:152-162:
    ints -> '%d', floats -> '%.2f' (NO 'NUM' marker in the general
    injector), tokens >= 7 chars containing a digit -> 'ID <token>'."""
    int_ok = t.rlike(_INT) & (F.length(F.regexp_replace(t, r"[-+]", ""))
                              <= 18)
    # Reference float branch (knowledge.py:155-158): whole-valued floats
    # take the '%d' form ('5.0' -> '5', val == round(val)), everything
    # else '%.2f'. try_cast guards long overflow for huge doubles.
    d = t.cast("double")
    d_long = d.try_cast("long")
    return (
        F.when(int_ok, F.format_string("%d", t.cast("long")))
        .when(t.rlike(_FLOAT) & (d == F.round(d, 0)) & d_long.isNotNull(),
              F.format_string("%d", d_long))
        .when(t.rlike(_FLOAT), F.format_string("%.2f", d))
        .when((F.length(t) >= 7) & t.rlike(_HAS_DIGIT),
              F.concat(F.lit("ID "), t))
        .otherwise(t)
    )


def dk_inject_general(col: Column) -> Column:
    """GeneralDKInjector.transform as one codegen expression: for each
    whitespace token, optionally emit the NER label, then the normalized
    token (markers COL/VAL are plain 'other' tokens, as in the reference,
    where spacy sees them as ordinary words)."""
    toks = F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))

    def emit(t: Column, i: Column) -> Column:
        # try_element_at: reading one past the last token must yield
        # null (-> ''), not an ANSI out-of-bounds error
        nxt = F.coalesce(
            F.try_element_at(toks, (i + 2).cast("int")), F.lit(""))
        # predecessor (1-based element i); index 0 is invalid, so the
        # first token takes the '' guard branch -> run start
        prv = F.coalesce(
            F.when(i > 0, F.try_element_at(toks, i.cast("int"))),
            F.lit(""))
        label = general_ner_label(t, nxt, prv)
        norm = _general_norm(t)
        return F.when(label.isNotNull(),
                      F.concat(label, F.lit(" "), norm)).otherwise(norm)

    return F.concat_ws(" ", F.transform(toks, emit))


def dk_inject_general_df(df: DataFrame, text_cols: list[str]) -> DataFrame:
    out = df
    for c in text_cols:
        out = out.withColumn(c, dk_inject_general(F.col(c)))
    return out
