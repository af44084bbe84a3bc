"""Full-text retrieval scoring over the curated corpus: BM25 top-k.

The shape a 100 TB corpus needs: the corpus is NEVER shuffled.  Per-doc
term frequencies for the (small, literal) query term set are computed
map-side with array higher-order functions over the tokenized text; the
collection statistics (N, total length, per-term document frequencies)
reduce to ONE row via a partial-aggregated global agg, which is then
broadcast back (a 1-row cross join Catalyst plans as
BroadcastNestedLoopJoin — the stats side is a single row, not data
motion); scoring is a map-side expression and the top-k is a
TakeOrderedAndProject, so the whole query is scan -> tiny agg ->
scan-side score -> top-k with zero wide exchanges of corpus data.

Scores are emitted as integer MICRO-units (``score_micro``) — the
repo-wide discipline for cross-engine hash-stable results (see
SURVEY.md §5): both engines compute IEEE doubles with the same
association, so they agree to ~1 ulp, and rounding at 1e-6 makes the
residual invisible to the value hash (a float column rounded at 1e-9
would be ~100x more boundary-exposed).

Okapi BM25 (Robertson et al., TREC-3), the k1/b form every engine
ships: idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tokenization shared with the DuckDB oracle: lowercase, split on runs
# of non-alphanumerics, drop empties.  Java regex and RE2 agree on this
# pattern class (no backrefs / lookaround), so both engines tokenize
# identically.
TOKEN_SPLIT_PATTERN = r"[^a-z0-9]+"

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def tokens_col(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), TOKEN_SPLIT_PATTERN),
        lambda x: x != F.lit(""),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` docs for a bag-of-words query by BM25.

    Returns (id_col, score_micro, dl, n_matched) ordered by
    (score desc, id asc) — the integer id tie-break keeps the LIMIT cut
    deterministic.  Docs matching no query term are excluded (their
    score is exactly 0).
    """
    terms = sorted(set(query_terms))

    # closure factory, NOT a default-arg lambda: pyspark treats a
    # 2-parameter lambda as (element, index)
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    toks = docs.select(
        F.col(id_col), tokens_col(text_col).alias("_toks")
    ).select(
        id_col,
        F.size("_toks").alias("dl"),
        *[
            F.size(F.filter("_toks", _eq(t))).alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    # collection stats: one row, partial-agg'd map-side; broadcast back
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_sum_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("bigint")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = toks.join(F.broadcast(stats))
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n").cast("double") - F.col(f"_df_{i}") + F.lit(0.5))
            / (F.col(f"_df_{i}") + F.lit(0.5))
        )
        part = idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    matched = None
    for i in range(len(terms)):
        m = (F.col(f"_tf_{i}") > 0).cast("int")
        matched = m if matched is None else matched + m
    return (
        scored.select(
            id_col,
            F.round(score * F.lit(1_000_000.0)).cast("bigint").alias(
                "score_micro"
            ),
            "dl",
            matched.alias("n_matched"),
        )
        .filter(F.col("n_matched") > 0)
        .orderBy(F.desc("score_micro"), F.asc(id_col))
        .limit(k)
    )


def bm25_sql(
    table: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """The equivalent ANSI/DuckDB SQL, mirroring the Spark expression
    term-for-term (same association of the float arithmetic)."""
    terms = sorted(set(query_terms))
    tf_cols = ",\n    ".join(
        f"len(list_filter(_toks, x -> x = '{t}')) AS _tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN _tf_{i} > 0 THEN 1 ELSE 0 END) AS _df_{i}"
        for i in range(len(terms))
    )
    parts = " + ".join(
        f"(ln(1.0 + (CAST(_n AS DOUBLE) - _df_{i} + 0.5) / (_df_{i} + 0.5))"
        f" * CAST(_tf_{i} AS DOUBLE) * {k1 + 1.0!r}"
        f" / (CAST(_tf_{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r}"
        f" * CAST(dl AS DOUBLE)"
        f" / (CAST(_sum_dl AS DOUBLE) / CAST(_n AS DOUBLE)))))"
        for i in range(len(terms))
    )
    matched = " + ".join(
        f"CASE WHEN _tf_{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(terms))
    )
    return f"""
WITH toks AS (
  SELECT {id_col},
    list_filter(string_split_regex(lower(coalesce({text_col}, '')),
                                   '{TOKEN_SPLIT_PATTERN}'),
                x -> x <> '') AS _toks
  FROM {table}
), tf AS (
  SELECT {id_col}, len(_toks) AS dl,
    {tf_cols}
  FROM toks
), stats AS (
  SELECT COUNT(*) AS _n, SUM(dl) AS _sum_dl, {df_cols} FROM tf
)
SELECT {id_col},
  CAST(round(({parts}) * 1000000.0) AS BIGINT) AS score_micro,
  dl,
  ({matched}) AS n_matched
FROM tf, stats
WHERE ({matched}) > 0
ORDER BY score_micro DESC, {id_col} ASC
LIMIT {k}
"""
