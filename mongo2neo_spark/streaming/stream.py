"""Structured Streaming extension (SURVEY.md §2.12 — optional by
contract; the binding pipeline is batch).

Incremental ingestion of transcript turns:

    readStream (file/iceberg source)
      -> watermark + dropDuplicatesWithinWatermark (late/dup turns)
      -> the SAME extraction UDF as the batch path (stateless per turn)
      -> append-mode sink of extraction results

Entity linking is inherently global state, so canonicalization stays a
periodic batch job over the accumulated extraction output — matching
the contract's "resumable batch" shape rather than forcing
applyInPandasWithState.  ``foreach_batch_pipeline`` wires the batch
linker into a streaming ``foreachBatch`` for a self-contained demo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import extract as extract_mod
from ..operators import ingest as ingest_mod
from ..schemas import TRANSCRIPTS


def read_transcript_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-based streaming source over the contract schema (swap for
    format('iceberg')/Kafka on a real deployment)."""
    return (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def streaming_extract(
    stream: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateless per-turn extraction with late/duplicate-turn handling.

    Watermark + dropDuplicatesWithinWatermark keeps state bounded: a
    duplicate (conv_id, turn_idx) arriving within the watermark is
    dropped; later than that, the batch dedup (P3) at canonicalization
    time still guarantees set semantics downstream.
    """
    clean = (
        stream.filter(
            F.col("conv_id").isNotNull()
            & F.col("turn_idx").isNotNull()
            & F.col("text").isNotNull()
            & (F.length("text") > 0)
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    )
    return extract_mod.extract(clean)


def read_streamed_extracted(spark: SparkSession, path: str):
    """Batch-read a streaming-APPENDED extraction table with exactly one
    row per (conv_id, turn_idx).

    ``dropDuplicatesWithinWatermark`` only guards duplicates arriving
    inside the watermark; a turn replayed later lands as a second
    appended row.  Batch consumers (canonicalize/materialize) MUST read
    through this helper.

    Survivor semantics: deterministic min-struct over the extraction
    table's own columns (ts, then the extraction struct).  An EXACT
    replay (same payload, re-delivered) collapses to the identical row a
    pure batch run would keep.  A CONFLICTING duplicate — same
    (conv_id, turn_idx) with a different payload — picks a deterministic
    survivor, but not necessarily the same one batch P3 elects (P3
    orders by (role, text, tool, ts), and role/text/tool no longer
    exist post-extraction; carrying them through the extraction table
    just to replicate that order for a malformed-input case would widen
    every row).  Conflicting turn payloads are a producer bug; the
    guarantee here is determinism, not cross-path survivor identity —
    tests/test_streaming.py::test_read_streamed_extracted_conflicting_duplicate
    pins this behavior.
    """
    df = spark.read.parquet(path)
    others = [c for c in df.columns if c not in ("conv_id", "turn_idx")]
    return (
        df.groupBy("conv_id", "turn_idx")
        .agg(F.min(F.struct(*others)).alias("_m"))
        .select("conv_id", "turn_idx", *[f"_m.{c}" for c in others])
    )


def start_extraction_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Run the extraction stream to parquet (exactly-once via the
    streaming checkpoint).  ``trigger_once`` processes available input
    and stops — the streaming analogue of a resumable batch increment."""
    stream = read_transcript_stream(spark, source_dir)
    ex = streaming_extract(stream)
    writer = (
        ex.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window aggregation: turns per (window, role).

    The watermark bounds state: a turn later than ``watermark`` behind
    the max seen event time is dropped from the aggregation rather than
    growing state forever — the standard late-data trade for unbounded
    streams.  In append mode a window emits once, when the watermark
    passes its end.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "role",
            "n_turns",
        )
    )


def sessionized_turn_counts(
    stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session-window re-segmentation for UNTRUSTED conv_ids (SURVEY
    §2.12 optional extension): a conv_id whose turns span an activity
    gap larger than ``gap`` splits into multiple sessions; merged or
    recycled conv_ids stop leaking turns across sittings.

    ``F.session_window`` keeps per-(conv_id, open-session) state only
    until the watermark passes the session's close — bounded by live
    conversations, not history.  Works identically on a batch frame
    (withWatermark is a no-op there), which is what the stream==batch
    parity test exploits.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", gap).alias("sess"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            "conv_id",
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_turns",
        )
    )


CONV_STATS_STATE = "n_turns long, max_ts timestamp"
CONV_STATS_OUTPUT = "conv_id string, n_turns long, max_ts timestamp"


def conversation_stats_stateful(stream: DataFrame, timeout: str = "NoTimeout"):
    """Custom stateful operator via ``applyInPandasWithState``: a running
    per-conversation turn counter + latest event time, carried across
    micro-batches in explicit GroupState (the escape hatch for stateful
    logic the built-in windowed aggregates can't express).

    Emits one updated row per conversation per micro-batch (update
    mode).  State is two scalars per conv_id — bounded by the number of
    live conversations, the right state budget at 10^12-turn scale.
    """
    import pandas as pd

    def update(key, pdfs, state):
        n = 0
        max_ts = None
        for pdf in pdfs:
            n += len(pdf)
            m = pdf["ts"].max()
            if max_ts is None or (m is not None and m > max_ts):
                max_ts = m
        if state.exists:
            (prev_n, prev_ts) = state.get
            n += prev_n
            if prev_ts is not None and (max_ts is None or prev_ts > max_ts):
                max_ts = prev_ts
        state.update((n, max_ts))
        yield pd.DataFrame(
            {"conv_id": [key[0]], "n_turns": [n], "max_ts": [max_ts]}
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=CONV_STATS_OUTPUT,
        stateStructType=CONV_STATS_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )


def foreach_batch_pipeline(spark, source_dir: str, out_dir: str,
                           checkpoint_dir: str):
    """Demo wiring: stream micro-batches through the batch materializer.

    Each micro-batch appends extraction output; callers re-run the batch
    canonicalize/materialize stages (plans.pipeline) periodically over
    the accumulated table — global linking cannot be incrementalized
    without approximation, and the contract's lineage/resume makes the
    periodic batch cheap.  Because appends can replay a turn across
    micro-batches, those batch stages must consume the table via
    :func:`read_streamed_extracted` (cross-batch (conv_id, turn_idx)
    dedup), never via a raw ``spark.read.parquet``.
    """
    stream = read_transcript_stream(spark, source_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        turns = ingest_mod.ingest(batch_df)
        ex = extract_mod.extract(turns)
        ex.write.mode("append").parquet(f"{out_dir}/extracted")

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# incremental curation ingest: the streaming front door of
# plans.curation.  Stateless per-document profiling plus cross-batch
# exact dedup run incrementally; the global stages (near-dup clustering,
# corpus-wide boilerplate/mixture decisions) remain periodic batch jobs
# over the accumulated profile table — the same global-state split the
# KG stream makes for entity linking.
# ---------------------------------------------------------------------------
def read_document_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-based streaming source over the documents shape
    (doc_id long, text string, plus passthrough columns)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def streaming_profile(stream: DataFrame) -> DataFrame:
    """Stateless per-document curation profile — identical expressions
    to the batch plans.curation profile stage (text.text_profile), so
    streamed-then-batch equals pure batch on the same rows."""
    from ..operators import text as text_mod

    clean = stream.filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    return text_mod.text_profile(clean)


def start_profile_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """availableNow (or continuous) append sink of streamed profiles.
    Exact dedup across ALL batches (the batch pipeline's hash-groupBy
    semantics) needs global state, so the incremental form keeps only a
    per-trigger drop of WITHIN-STREAM duplicate doc_ids via
    dropDuplicates on the append path; full (hash, len, text) exact
    dedup and everything global runs in the periodic batch
    (read_streamed_profiles -> plans.curation stages 2+)."""
    prof = streaming_profile(read_document_stream(spark, source_dir))
    writer = (
        prof.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_streamed_profiles(spark: SparkSession, path: str) -> DataFrame:
    """Batch view of the streamed profile table with exact replay
    collapse: a doc_id appearing in multiple stream batches (file
    re-delivery) keeps one deterministic survivor — min over the full
    profile struct, which for identical payloads is the identical row
    the batch profile stage emits."""
    df = spark.read.parquet(path)
    other = [c for c in df.columns if c != "doc_id"]
    agg = df.groupBy("doc_id").agg(
        F.min(F.struct(*other)).alias("_s")
    )
    return agg.select("doc_id", *[F.col(f"_s.{c}").alias(c) for c in other])
