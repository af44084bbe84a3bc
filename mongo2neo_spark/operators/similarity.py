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


def _planes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((n_planes, dim))


def hyperplane_bucket_udf(dim: int, n_planes: int = 12):
    """Arrow-batched UDF: embedding -> LSH bucket (sign pattern of
    ``n_planes`` fixed random hyperplanes, packed into a long)."""
    planes = _planes(dim, n_planes)

    @pandas_udf(T.LongType())
    def bucket(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in batches:
            m = np.vstack(vecs.to_numpy())  # (n, dim)
            signs = (m @ planes.T) > 0  # (n, n_planes)
            vals = signs @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.Series(vals, dtype="int64")

    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket (equi join on bucket instead of a cross join)."""
    bucket = hyperplane_bucket_udf(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("bucket", bucket(F.col("_cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("bucket", bucket(F.col("_qv")))
    scored = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.select(
        "query_id", "neighbor_id", _cosine(F.col("_qv"), F.col("_cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
