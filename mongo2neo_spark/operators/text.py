"""Text-analysis operators for training-data curation: token counting,
quality scoring, language ID, document fingerprinting.

Everything except the fingerprint is pure built-in ``pyspark.sql.functions``
expressions — JVM-side, whole-stage-codegen'd, zero Python in the hot
path.  Each returns a Column (composable) or a DataFrame transform.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import hashing

# whitespace tokens
def token_count(col) -> Column:
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+"))
    )


# BPE-ish subword proxy: word pieces, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


def stopword_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    pat = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"
    hits = F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), F.lit(0)))
    return (hits.cast("double") / F.greatest(token_count(c), F.lit(1))).alias(
        "stopword_ratio"
    )


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct.cast("double") / F.greatest(F.length(c), F.lit(1))


def quality_score(col) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punctuation
    + stopword presence.  Deterministic, SQL-expressible (the DuckDB
    oracle mirrors it term-for-term)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    len_term = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    return (0.4 * len_term + 0.3 * punct_term + 0.3 * stop_term)


# language-ID: marker-token counts, argmax with lexicographic tie-break
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "que", "de", "los", "es"),
    "fr": ("le", "la", "les", "et", "est", "des"),
    "zh": ("的", "是", "不", "了", "在", "我"),
}


def _marker_count(c, lang: str) -> Column:
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), F.lit(0)))


def lang_id(col) -> Column:
    """Predicted language: the marker list with the most hits; ties (and
    zero hits) resolve to the lexicographically first max — deterministic
    and exactly reproducible in SQL via greatest+case."""
    c = F.col(col) if isinstance(col, str) else col
    langs = sorted(LANG_MARKERS)
    counts = [_marker_count(c, l) for l in langs]
    best = F.greatest(*counts)
    expr = F.lit("unknown")
    for l, cnt in reversed(list(zip(langs, counts))):
        expr = F.when((best > 0) & (cnt == best), F.lit(l)).otherwise(expr)
    return expr


@pandas_udf(T.LongType())
def fingerprint_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Rolling-hash document fingerprint (functions.hashing) — Arrow
    batched, numpy-vectorized per window (bit-identical to the scalar
    ``rolling_fingerprint`` spec the oracle uses)."""
    for texts in batches:
        yield pd.Series(
            hashing.rolling_fingerprints_batch(list(texts)), dtype="int64"
        )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass curation profile of a document table."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        F.round(quality_score(c), 6).alias("quality"),
        lang_id(c).alias("pred_lang"),
        fingerprint_udf(c).alias("fingerprint"),
    )
