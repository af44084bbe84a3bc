"""Corpus-level statistical language-model scoring for data curation.

The CCNet / Wikipedia-LM recipe scores every document by how "natural"
its token stream is under a language model and filters or buckets on
the score (perplexity filtering).  This is the distributed unigram form
of that signal, trained on the corpus itself in the same job:

* **Train**: one explode + token-keyed aggregation produces the
  vocabulary counts.  Map-side partial aggregation means the shuffle
  carries at most (distinct tokens per partition) rows, not the token
  stream; the output is vocabulary-sized, orders of magnitude smaller
  than the corpus.
* **Total**: the unigram denominator reduces to ONE row and is joined
  back to the vocabulary by broadcast (a 1-row BroadcastNestedLoopJoin,
  not data motion).
* **Score**: the per-token log-probability is quantized PER TOKEN to an
  integer micro-unit (round(ln(c/T) * 1e6) — one log + one round, the
  same 1-ulp exposure class as the BM25 idf), then documents aggregate
  exact int64 sums — so the per-doc result is independent of Spark's
  float summation order, the repo-wide hash-stability discipline
  (SURVEY.md §5).
* **Join venue**: the vocabulary re-joins the token stream by broadcast
  when it fits (``broadcast_vocab=True``, the default — a web-corpus
  vocabulary is MBs against a 100 TB corpus); at extreme vocabulary
  sizes pass False and the join is a token-keyed sort-merge, after
  which the per-doc aggregation still partial-aggregates map-side
  because a doc's tokens are co-located (one input row) before the
  explode only when broadcast is used — the shuffled variant pays one
  extra doc_id exchange and is the honest fallback, not the default.

Output: (id_col, n_tokens, sum_logp_micro).  Mean log-prob (and hence
perplexity) is derivable as sum/n downstream; the division is left to
the consumer because integer floor-division of NEGATIVE sums rounds
differently across engines, and the raw pair is the lossless form.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import tokens_col


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document unigram log-probability under the corpus's own
    unigram distribution (see module docstring for the scale shape).

    Docs with zero tokens produce no row (they have no tokens to score
    — mirrored in the SQL oracle, where the unnest emits nothing).
    """
    # tokenize ONCE: the vocabulary agg and the scoring join are two
    # separate subtrees over the token stream, and without a
    # materialization each re-scans and re-regex-tokenizes the corpus
    # (the tokenize, not the agg, dominates — same trade as
    # retrieval.bm25_topk_tokenjoin).  The cache holds the compact
    # per-doc token ARRAYS; both explodes run from it.
    from pyspark import StorageLevel

    tokenized = docs.select(
        F.col(id_col), tokens_col(text_col).alias("_toks")
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    stream = tokenized.select(
        F.col(id_col), F.explode("_toks").alias("token")
    )
    vocab = stream.groupBy("token").agg(F.count(F.lit(1)).alias("_c"))
    total = vocab.agg(F.sum("_c").alias("_t"))
    vocab_p = vocab.join(F.broadcast(total)).select(
        "token",
        F.round(
            F.log(F.col("_c").cast("double") / F.col("_t").cast("double"))
            * F.lit(1_000_000.0)
        )
        .cast("bigint")
        .alias("_logp_micro"),
    )
    if broadcast_vocab:
        vocab_p = F.broadcast(vocab_p)
    return (
        stream.join(vocab_p, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("_logp_micro").cast("bigint").alias("sum_logp_micro"),
        )
    )


def unigram_logprob_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB mirror of :func:`unigram_logprob`, token-for-token: the
    same tokenizer regex, the same per-token micro quantization before
    the integer sum."""
    from .retrieval import TOKEN_SPLIT_PATTERN

    return f"""
WITH stream AS (
  SELECT {id_col},
         unnest(list_filter(
           string_split_regex(lower(coalesce({text_col}, '')),
                              '{TOKEN_SPLIT_PATTERN}'),
           x -> x <> '')) AS token
  FROM {table}
), vocab AS (
  SELECT token, COUNT(*) AS _c FROM stream GROUP BY token
), total AS (
  SELECT SUM(_c) AS _t FROM vocab
), vocab_p AS (
  SELECT token,
         CAST(round(ln(CAST(_c AS DOUBLE) / CAST(_t AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS _logp_micro
  FROM vocab, total
)
SELECT s.{id_col},
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(v._logp_micro) AS BIGINT) AS sum_logp_micro
FROM stream s JOIN vocab_p v USING (token)
GROUP BY s.{id_col}
"""
