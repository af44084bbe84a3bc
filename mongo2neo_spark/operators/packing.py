"""Sequence packing for LLM training-data pipelines.

Training consumes fixed-length token sequences; packing many short
documents into one sequence (instead of padding each) is the standard
throughput lever.  This is the distributed form of the greedy
first-fit-decreasing packer:

* Documents are hash-bucketed (``doc_id mod n_buckets``) so packing is
  embarrassingly parallel — each bucket packs locally inside one
  ``applyInPandas`` group, no global coordination.  At 100 TB you raise
  ``n_buckets`` so each bucket's document LIST (ids + token counts only,
  never the text) fits comfortably in one task's memory; the text itself
  is joined back by doc_id afterwards if needed.
* Within a bucket the order is DETERMINISTIC: sort by
  (n_tokens DESC, doc_id ASC), then first-fit — so the output is a pure
  function of the input set, independent of partitioning, executor
  count, or scheduling (replica-equality is tested at two different
  parallelism levels).
* Oversized documents (n_tokens > budget) get a singleton sequence and
  ``overflow = true`` — flagged, never silently truncated or dropped.

The packing decision needs only (doc_id, n_tokens) — a few bytes per
document — which is why the Arrow group payload stays tiny even for
buckets covering millions of docs' metadata.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .text import token_count

PACK_SCHEMA = (
    "doc_id bigint, bucket bigint, seq_id bigint, n_tokens int, "
    "overflow boolean"
)


class _FirstFitTree:
    """Leftmost-first-fit over open-sequence remaining capacities in
    O(log n) per query/update — a max segment tree indexed by sequence
    id.  This preserves EXACT first-fit-by-index semantics (a
    capacity-sorted bisect would silently turn first-fit into best-fit:
    under FFD the open capacities are not monotone — budget 10, docs
    6,5,4 leave rooms [4,5]), while removing the O(docs x open-seqs)
    linear scan that made single-bucket cost quadratic and forced the
    "raise n_buckets" discipline.

    Leaves are preallocated to the bucket's doc count (the worst case:
    every doc opens a sequence); unopened leaves hold -1 so a 0-token
    doc still prefers the lowest OPEN sequence (room >= 0), exactly as
    the linear scan did — overflow singletons are opened with room 0
    for the same reason.
    """

    __slots__ = ("size", "tree", "n_open")

    def __init__(self, max_seqs: int):
        size = 1
        while size < max(max_seqs, 1):
            size *= 2
        self.size = size
        self.tree = [-1] * (2 * size)
        self.n_open = 0

    def set_room(self, seq: int, room: int) -> None:
        t = self.tree
        j = self.size + seq
        t[j] = room
        j //= 2
        while j:
            left, right = t[2 * j], t[2 * j + 1]
            t[j] = left if left >= right else right
            j //= 2

    def open_seq(self, room: int) -> int:
        s = self.n_open
        self.n_open += 1
        self.set_room(s, room)
        return s

    def first_fit(self, need: int) -> int:
        """Lowest sequence index with room >= need, else -1."""
        t = self.tree
        if t[1] < need:
            return -1
        j = 1
        while j < self.size:
            j *= 2
            if t[j] < need:
                j += 1
        return j - self.size

    def room(self, seq: int) -> int:
        return self.tree[self.size + seq]


def _pack_bucket(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    """First-fit-decreasing over one bucket's (doc_id, n_tokens) rows;
    O(n log n) via the leftmost-fit segment tree."""
    rows = sorted(
        zip(pdf["doc_id"].tolist(), pdf["n_tokens"].tolist()),
        key=lambda r: (-r[1], r[0]),
    )
    budget = int(budget)
    fits = _FirstFitTree(len(rows))
    out = []
    bucket = int(pdf["bucket"].iloc[0])
    for doc_id, n_tok in rows:
        n_tok = int(n_tok)
        if n_tok > budget:
            s = fits.open_seq(0)  # singleton, no room left
            out.append((int(doc_id), bucket, s, n_tok, True))
            continue
        s = fits.first_fit(n_tok)
        if s >= 0:
            fits.set_room(s, fits.room(s) - n_tok)
        else:
            s = fits.open_seq(budget - n_tok)
        out.append((int(doc_id), bucket, s, n_tok, False))
    return pd.DataFrame(
        out, columns=["doc_id", "bucket", "seq_id", "n_tokens", "overflow"]
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, seq_id, n_tokens, overflow): every document
    assigned to a (bucket, seq_id) training sequence whose token total
    never exceeds ``budget`` (except flagged oversize singletons).

    Token counts are the whitespace ``token_count`` used throughout the
    text family; only (doc_id, n_tokens, bucket) ever enters Python —
    the Arrow group payload is ~12 bytes/doc regardless of text size.
    """
    meta = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        token_count(F.coalesce(F.col(text_col), F.lit(""))).cast("int")
        .alias("n_tokens"),
        F.pmod(F.col(id_col).cast("bigint"), F.lit(n_buckets)).cast("bigint")
        .alias("bucket"),
    )
    return meta.groupBy("bucket").applyInPandas(
        lambda pdf: _pack_bucket(pdf, budget), schema=PACK_SCHEMA
    )


def packing_profile(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bucket packing efficiency in exact integer ppm:
    (bucket, n_docs, n_seqs, fill_ppm) where fill_ppm =
    floor(1e6 * packed_tokens / (n_seqs * budget)) over non-overflow
    sequences.  Pure aggregation — SQL-mirrorable as-is."""
    ok = packed.filter(~F.col("overflow"))
    return (
        ok.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("seq_id").alias("n_seqs"),
            F.sum(F.col("n_tokens").cast("bigint")).alias("_tok"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_seqs",
            F.expr(f"(1000000L * _tok) div (n_seqs * {int(budget)}L)")
            .alias("fill_ppm"),
        )
    )
