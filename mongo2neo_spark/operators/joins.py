"""Temporal join operators Spark lacks natively, built from primitives
Catalyst can optimize (SURVEY.md §2.3 'theta/range/as-of' note).

``asof_join`` is the classic trades×quotes / event-enrichment join: for
every left row, attach the most recent right timestamp at or before the
left row's time, per key.  The naive formulation is a non-equi range
join (quadratic blowup per key); this implementation is a UNION + one
window pass — a single hash shuffle on the key, linear work, and the
sort is per-partition (exactly the plan you want at 100 TB).

Hot-key story: the single window in :func:`asof_join` partitions by the
key alone, so one pathological key (a user with 10^9 events) pins one
task's sort.  :func:`asof_join_bucketed` splits every key by a fixed
time-bucket width — the big window becomes per-(key, bucket), and the
cross-bucket carry (the most recent right time in any EARLIER bucket)
is computed on the bucket-level aggregate stream, which is tiny (one
row per distinct (key, bucket)).  Same output, bounded partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("_t", "_is_right", "_rt", "asof_ts")
_RESERVED_BUCKETED = _RESERVED + ("_b", "_carry_ts", "_within")


def _check_reserved(left: DataFrame, right: DataFrame, reserved) -> None:
    for df, side in ((left, "left"), (right, "right")):
        clash = [c for c in df.columns if c in reserved]
        if clash:
            raise ValueError(
                f"asof_join: {side} frame uses reserved internal column "
                f"name(s) {clash}; rename them before joining "
                f"(reserved: {list(reserved)})"
            )


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

    The window partitions by ``on`` alone — for keys hot enough to pin a
    single task (one key holding a large share of all rows), use
    :func:`asof_join_bucketed`.
    """
    _check_reserved(left, right, _RESERVED)
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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """:func:`asof_join` semantics with hot-key-safe partitioning.

    Every row is assigned a fixed-width time bucket
    (floor(epoch_seconds / bucket_seconds)); the union+window pass then
    partitions by (key, bucket), so a key's rows split across as many
    tasks as it spans buckets — a Zipf-hot key no longer pins one
    task's sort.  A left row whose bucket contains no earlier right row
    needs the most recent right time from an EARLIER bucket: that
    carry-forward is the same asof recurrence applied to the
    bucket-level aggregate stream (one row per distinct (key, bucket) —
    metadata-sized), where the per-key window is harmless.

    Output is identical to :func:`asof_join` (property-tested).  The
    residual limit is honest: a key whose rows all share ONE bucket
    (e.g. 10^9 events inside ``bucket_seconds``) still lands on one
    task — shrink ``bucket_seconds`` to match the data's time density.
    """
    _check_reserved(left, right, _RESERVED_BUCKETED)
    l_cols = left.columns
    t_type = right.schema[right_time].dataType

    def bucket_of(c):
        # timestamps (incl. TIMESTAMP_NTZ, which ANSI refuses to cast to
        # double directly) go through an epoch-seconds conversion; plain
        # numeric time columns cast straight through
        from pyspark.sql import types as T

        dt = t_type
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            c = c.cast("timestamp").cast("double")
        else:
            c = c.cast("double")
        return F.floor(c / F.lit(float(bucket_seconds))).cast("long")

    lt = left.select(
        *l_cols,
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(t_type).alias("_rt"),
    ).withColumn("_b", bucket_of(F.col("_t")))
    rt = (
        right.select(F.col(on), F.col(right_time).alias("_t"))
        .dropDuplicates([on, "_t"])
        .select(F.col(on), "_t", F.lit(1).alias("_is_right"),
                F.col("_t").alias("_rt"))
        .withColumn("_b", bucket_of(F.col("_t")))
    )
    for c in l_cols:
        if c != on:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    # cross-bucket carry on the bucket-level stream: per key, the max
    # right time over strictly-earlier buckets.  Left bucket markers
    # sort BEFORE right aggregates within the same bucket (_is_right
    # asc), so the running max a left bucket sees excludes its own
    # bucket's rights — those are resolved by the within-bucket pass.
    r_aggs = rt.groupBy(on, "_b").agg(F.max("_rt").alias("_rmax"))
    l_buckets = lt.select(on, "_b").distinct()
    bucket_stream = l_buckets.select(
        on, "_b", F.lit(None).cast(t_type).alias("_rmax"),
        F.lit(0).alias("_is_right"),
    ).unionByName(r_aggs.withColumn("_is_right", F.lit(1)))
    wb = (
        Window.partitionBy(on)
        .orderBy(F.asc("_b"), F.asc("_is_right"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = (
        bucket_stream.withColumn("_carry_ts", F.max("_rmax").over(wb))
        .filter(F.col("_is_right") == 0)
        .select(on, "_b", "_carry_ts")
    )

    # within-bucket pass: the classic union+window, partitioned by
    # (key, bucket) so hot keys split
    u = lt.unionByName(rt.select(*lt.columns))
    w = (
        Window.partitionBy(on, "_b")
        .orderBy(F.asc("_t"), F.desc("_is_right"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = u.withColumn("_within", F.last("_rt", ignorenulls=True).over(w))
    out = (
        within.filter(F.col("_is_right") == 0)
        .join(carry, [on, "_b"], "left")
        .withColumn("asof_ts", F.coalesce("_within", "_carry_ts"))
    )
    return out.select(*l_cols, "asof_ts")
