"""Temporal join operators Spark lacks natively, built from primitives
Catalyst can optimize (SURVEY.md §2.3 'theta/range/as-of' note).

``asof_join`` is the classic trades×quotes / event-enrichment join: for
every left row, attach the most recent right timestamp at or before the
left row's time, per key.  The naive formulation is a non-equi range
join (quadratic blowup per key); this implementation is a UNION + one
window pass — a single hash shuffle on the key, linear work, and the
sort is per-partition (exactly the plan you want at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
) -> DataFrame:
    """For each left row: the greatest ``right_time`` <= left time per
    ``on`` key, as a new nullable column ``asof_ts`` (left-join
    semantics: no prior right row -> NULL).

    Shape: tag both streams, union, ``last(ignorenulls)`` over a
    (key, time) window ordered so right rows at an equal timestamp sort
    BEFORE left rows (<= semantics, matching DuckDB/QuestDB ASOF JOIN).
    Rights are pre-deduped per (key, time) so the result is
    deterministic regardless of duplicate right rows.
    """
    l_cols = left.columns
    lt = left.select(
        *l_cols,
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
    )
    rt = (
        right.select(F.col(on), F.col(right_time).alias("_t"))
        .dropDuplicates([on, "_t"])
        .select(
            F.col(on),
            "_t",
            F.lit(1).alias("_is_right"),
            F.col("_t").alias("_rt"),
        )
    )
    for c in l_cols:
        if c != on:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt.select(*lt.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc("_t"), F.desc("_is_right"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u.withColumn("asof_ts", F.last("_rt", ignorenulls=True).over(w))
    return out.filter(F.col("_is_right") == 0).select(*l_cols, "asof_ts")
