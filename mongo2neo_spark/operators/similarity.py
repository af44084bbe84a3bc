"""Similarity search over embedding columns (array<float>).

Two paths:
- ``brute_force_topk`` — exact cosine top-k; the dot product runs
  JVM-side via ``F.zip_with`` + ``F.aggregate`` (whole-stage codegen, no
  Python), queries broadcast so the corpus never shuffles.  The right
  baseline up to ~10^9 corpus × small query sets.
- ``lsh_bucketed_topk`` — the scale path: deterministic random-hyperplane
  LSH buckets computed in one Arrow-batched UDF; candidates only meet
  within a bucket, turning the cross join into an equi join.  Recall<1
  by construction; multiple tables (hash repetitions) trade compute for
  recall.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_PLANE_SEED = 1337


def _cosine(a, b):
    """JVM-side cosine between two array<double> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query.

    Output: (query_id, neighbor_id, cos) with per-query rank<=k.
    Queries are broadcast — the corpus is scanned once, never shuffled;
    the only shuffle is the per-query top-k (tiny: k rows per query).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.select(
        "query_id", "neighbor_id", _cosine(F.col("_qv"), F.col("_cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _planes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((n_tables * n_planes, dim))


def infer_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding dimensionality from the data (first row), not a magic arg."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row.d is None or row.d <= 0:
        raise ValueError(f"cannot infer embedding dim from column {vec_col!r}")
    return int(row.d)


def hyperplane_buckets_udf(dim: int, n_planes: int = 8, n_tables: int = 4):
    """Arrow-batched UDF: embedding -> one LSH bucket per hash table
    (sign pattern of ``n_planes`` fixed random hyperplanes, packed into a
    long; ``n_tables`` independent plane sets trade compute for recall).
    One matmul per Arrow batch computes every table's buckets."""
    planes = _planes(dim, n_planes, n_tables)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in batches:
            m = np.vstack(vecs.to_numpy())  # (n, dim)
            signs = (m @ planes.T) > 0  # (n, n_tables*n_planes)
            vals = signs.reshape(len(m), n_tables, n_planes) @ weights  # (n, T)
            yield pd.Series(list(vals))

    return buckets


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing a
    hyperplane bucket with the query in ANY of ``n_tables`` independent
    hash tables (multi-table LSH — union of per-table candidate sets).

    Plan shape: the ×n_tables posexplode is consumed by a broadcast join
    in the same stage, so the corpus is scanned once and NEVER shuffled;
    the only exchanges are the (query_id, neighbor_id, cos) candidate
    dedup and the per-query top-k — both id-width.  Recall is tunable:
    more tables / fewer planes per table raise it (measure with
    :func:`ann_recall`; defaults hit recall@10 >= 0.9 on the testdata
    embeddings vs brute force).
    """
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    buckets = hyperplane_buckets_udf(dim, n_planes, n_tables)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    cx = c.select(
        "neighbor_id", "_cv",
        F.posexplode(buckets(F.col("_cv"))).alias("tbl", "bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    qx = q.select(
        "query_id", "_qv",
        F.posexplode(buckets(F.col("_qv"))).alias("tbl", "bucket"),
    )
    cand = cx.join(F.broadcast(qx), ["tbl", "bucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.select(
        "query_id", "neighbor_id", _cosine(F.col("_qv"), F.col("_cv")).alias("cos")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_dedup_components(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup clustering: (id, component).

    Hyperplane-LSH blocking (same deterministic plane family as the ANN
    path) -> candidate pairs within any table's bucket -> exact JVM-side
    cosine verify at ``threshold`` -> min-id connected components.
    Shuffle discipline mirrors the text near-dup path: the bucket
    stream is (id, tbl, bucket) — vectors rejoin only for surviving
    candidate pairs.  Deterministic planes mean a pure-Python oracle
    reproduces the exact same clusters (parity by construction).
    """
    if dim is None:
        dim = infer_dim(df, vec_col)
    buckets = hyperplane_buckets_udf(dim, n_planes, n_tables)
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    bx = base.select(
        "id", F.posexplode(buckets(F.col("_v"))).alias("tbl", "bucket")
    )
    a = bx.select(F.col("id").alias("a_id"), "tbl", "bucket")
    b = bx.select(F.col("id").alias("b_id"), "tbl", "bucket")
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    with_vecs = pairs.join(
        base.select(F.col("id").alias("a_id"), F.col("_v").alias("a_v")), "a_id"
    ).join(
        base.select(F.col("id").alias("b_id"), F.col("_v").alias("b_v")), "b_id"
    )
    verified = with_vecs.withColumn(
        "cos", _cosine(F.col("a_v"), F.col("b_v"))
    ).filter(F.col("cos") >= threshold)
    edges = verified.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    from . import cc as cc_mod

    return cc_mod.connected_components_auto(edges, base.select("id"))


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> DataFrame:
    """Per-query recall@k of the LSH path vs exact brute force:
    (query_id, n_exact, n_hit, recall).  The honesty meter every ANN
    deployment needs — approximate results without a measured recall are
    not results."""
    exact = brute_force_topk(corpus, queries, k, id_col, vec_col)
    approx = lsh_bucketed_topk(corpus, queries, k, id_col=id_col,
                               vec_col=vec_col, **lsh_kwargs)
    hit = F.when(F.col("hit_rank").isNotNull(), 1).otherwise(0)
    joined = exact.select("query_id", "neighbor_id").join(
        approx.select(
            "query_id", "neighbor_id", F.col("rank").alias("hit_rank")
        ),
        ["query_id", "neighbor_id"],
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("*").alias("n_exact"),
        F.sum(hit).cast("long").alias("n_hit"),
        F.round(F.sum(hit) / F.count("*"), 6).alias("recall"),
    )
