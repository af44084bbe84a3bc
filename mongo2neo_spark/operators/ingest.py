"""Ingest stage: P1 prune/cast, P2 validity filter, P3 deterministic
turn dedup, W1 stable (conv_id, turn_idx) ordering (SURVEY.md §2.2/§2.5).

Scale notes: the filters sit *before* any UDF so Catalyst pushes them
into the parquet/Iceberg scan; the dedup window shuffles on the
fine-grained (conv_id, turn_idx) key, so a hot conversation does NOT
create a hot partition here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CONTRACT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def ingest(df: DataFrame, roles: tuple | None = None) -> DataFrame:
    """Contract input -> clean, deduped turns.

    Exactly one row per (conv_id, turn_idx); the survivor is the minimum
    row under (role, text, tool, ts) ascending-nulls-first — a *total*
    deterministic order, mirrored bit-for-bit by the oracle
    (mongo2neo_spark.oracle.dedup_turns), so per-turn text equality vs
    the reference holds under any input permutation or duplication.
    """
    out = df.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("role").cast("string").alias("role"),
        F.col("text").cast("string").alias("text"),
        F.col("tool").cast("string").alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
    ).filter(
        F.col("conv_id").isNotNull()
        & F.col("turn_idx").isNotNull()
        & F.col("text").isNotNull()
        & (F.length("text") > 0)
    )
    if roles:
        out = out.filter(F.col("role").isin(list(roles)))
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.asc_nulls_first("role"),
        F.asc_nulls_first("text"),
        F.asc_nulls_first("tool"),
        F.asc_nulls_first("ts"),
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def ordered_turns(df: DataFrame) -> DataFrame:
    """W1: stable per-conversation ordering with an explicit turn rank —
    the 'stable (conv_id, turn_idx) window ordering' of the contract."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_rank", F.row_number().over(w))
