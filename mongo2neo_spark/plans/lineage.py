"""Per-partition lineage + extraction metrics (S3/J5/A5, SURVEY.md §2.1,
§2.3, §2.4) — the resume contract: "checkpoints per-partition lineage and
extraction metrics so any stage resumes idempotently" (BASELINE.json).

Lineage is an append-only table.  A stage partition (a conversation
bucket for extraction; the whole stage for the global linking/CC/
materialize stages) is *done* when a lineage row exists for its
(stage, partition_key); resume anti-joins the work list against the
recorded keys and recomputes only the remainder.

Checksums are order-insensitive content hashes — sum(xxhash64(row)) —
so a resumed run can be diffed against a fresh run bit-for-bit.
At design scale (10^12 turns → ~10^6-10^7 tasks/stage) lineage is
per-partition, never per-row: the lineage table stays tiny relative to
the data (SURVEY.md §6).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import LINEAGE

STAGE_KEY = "__stage__"  # partition_key for single-partition (global) stages


def checksum_col(df: DataFrame) -> F.Column:
    """Order-insensitive content checksum over all columns.

    bit_xor (not sum) so it can't overflow under ANSI mode (default in
    Spark 4) and stays order/partitioning-insensitive.
    """
    return F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).cast("string")


def lineage_path(out_dir: str) -> str:
    return f"{out_dir}/lineage"


def read_lineage(spark: SparkSession, out_dir: str) -> Optional[DataFrame]:
    try:
        return spark.read.schema(LINEAGE).parquet(lineage_path(out_dir))
    except Exception:
        return None


def completed_keys(spark: SparkSession, out_dir: str, stage: str,
                   run_id: Optional[str] = None) -> List[str]:
    """Partition keys already recorded for a stage (across all runs —
    idempotent re-runs skip work done by any previous run)."""
    lin = read_lineage(spark, out_dir)
    if lin is None:
        return []
    rows = (
        lin.filter(F.col("stage") == stage)
        .select("partition_key")
        .distinct()
        .collect()
    )
    return [r.partition_key for r in rows]


def record(
    spark: SparkSession,
    out_dir: str,
    stage: str,
    entries: Sequence[tuple],
    run_id: str,
) -> None:
    """entries: (partition_key, input_rows, output_rows, checksum, wall_ms)."""
    if not entries:
        return
    now = F.current_timestamp()
    df = spark.createDataFrame(
        [
            (stage, str(k), int(i), int(o), str(c), int(w), run_id)
            for (k, i, o, c, w) in entries
        ],
        "stage string, partition_key string, input_rows long, output_rows long,"
        " checksum string, wall_ms long, run_id string",
    ).withColumn("ts", now)
    df.write.mode("append").parquet(lineage_path(out_dir))


def stage_metrics(df: DataFrame, key_col: str) -> DataFrame:
    """A5: per-partition-key output metrics for lineage recording."""
    return df.groupBy(F.col(key_col).cast("string").alias("partition_key")).agg(
        F.count("*").alias("output_rows"),
        checksum_col(df).alias("checksum"),
    )


class StageTimer:
    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        self.wall_ms = int((time.monotonic() - self.t0) * 1000)
        return False
