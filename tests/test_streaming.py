"""Structured Streaming extension: extraction over a file stream matches
the batch path; duplicate turns within the watermark are dropped."""

import pytest

from mongo2neo_spark import fixtures
from mongo2neo_spark.operators import extract, ingest
from mongo2neo_spark.streaming import stream as streaming


@pytest.fixture(scope="module")
def stream_dirs(spark, small_rows, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    pdf = fixtures.turns_to_pandas(small_rows)
    # two "arrival" files, the second re-delivering some rows (dups)
    spark.createDataFrame(pdf.iloc[: len(pdf) // 2]).write.parquet(
        str(tmp / "in"), mode="append"
    )
    spark.createDataFrame(pdf.iloc[len(pdf) // 4 :]).write.parquet(
        str(tmp / "in"), mode="append"
    )
    return tmp


def test_streaming_extraction_matches_batch(spark, small_rows, stream_dirs):
    tmp = stream_dirs
    q = streaming.start_extraction_stream(
        spark,
        str(tmp / "in"),
        str(tmp / "out"),
        str(tmp / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp / "out"))
    got_m = {
        (r.conv_id, r.turn_idx, r.span_start, r.norm)
        for r in extract.mentions(got).collect()
    }
    # batch reference over the full (deduped) input
    df = spark.createDataFrame(fixtures.turns_to_pandas(small_rows))
    ref = {
        (r.conv_id, r.turn_idx, r.span_start, r.norm)
        for r in extract.mentions(extract.extract(ingest.ingest(df))).collect()
    }
    assert got_m == ref


def test_read_streamed_extracted_dedups_cross_batch(spark, small_rows, tmp_path):
    """A turn replayed across micro-batches (beyond the watermark) lands
    twice in the appended table; the batch-consumer helper must collapse
    it back to one row per (conv_id, turn_idx)."""
    pdf = fixtures.turns_to_pandas(small_rows)
    df = spark.createDataFrame(pdf)
    ex = extract.extract(ingest.ingest(df))
    ex.write.parquet(str(tmp_path / "ext"), mode="append")
    ex.limit(7).write.parquet(str(tmp_path / "ext"), mode="append")  # replay
    raw = spark.read.parquet(str(tmp_path / "ext"))
    deduped = streaming.read_streamed_extracted(spark, str(tmp_path / "ext"))
    assert raw.count() == ex.count() + 7
    assert deduped.count() == ex.count()
    got = {(r.conv_id, r.turn_idx, r.span_start, r.norm)
           for r in extract.mentions(deduped).collect()}
    ref = {(r.conv_id, r.turn_idx, r.span_start, r.norm)
           for r in extract.mentions(ex).collect()}
    assert got == ref


def test_read_streamed_extracted_conflicting_duplicate(spark, tmp_path):
    """Documented semantics for CONFLICTING duplicates (same (conv_id,
    turn_idx), different payload — a producer bug): the survivor is the
    deterministic min over the extraction table's own columns (ts, then
    extraction struct), independent of arrival order.  This is NOT
    guaranteed to equal the batch-P3 survivor (which orders by role/
    text/tool, gone post-extraction) — see read_streamed_extracted's
    docstring."""
    import pandas as pd

    a = pd.DataFrame(
        {
            "conv_id": ["c1"],
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"],
            "text": ["Alice Smith works at Acme Corp ."],
            "tool": [None],
            "ts": [pd.Timestamp("2026-01-01 00:00:05")],
        }
    )
    b = a.copy()
    b["text"] = ["Bob Jones lives in Paris ."]
    b["ts"] = [pd.Timestamp("2026-01-01 00:00:01")]  # earlier ts wins

    ex_a = extract.extract(spark.createDataFrame(a))
    ex_b = extract.extract(spark.createDataFrame(b))
    # arrival order 1: a then b
    ex_a.write.parquet(str(tmp_path / "e1"), mode="append")
    ex_b.write.parquet(str(tmp_path / "e1"), mode="append")
    # arrival order 2: b then a
    ex_b.write.parquet(str(tmp_path / "e2"), mode="append")
    ex_a.write.parquet(str(tmp_path / "e2"), mode="append")

    r1 = streaming.read_streamed_extracted(spark, str(tmp_path / "e1")).collect()
    r2 = streaming.read_streamed_extracted(spark, str(tmp_path / "e2")).collect()
    assert len(r1) == len(r2) == 1
    assert r1 == r2  # arrival-order independent
    # min-struct survivor: the earlier-ts payload
    norms = {(r.conv_id, r.turn_idx, tuple(r.ex.m_norm)) for r in r1}
    assert norms == {("c1", 0, ("bob jones", "paris"))}


def test_windowed_turn_counts_matches_batch(spark, small_rows, stream_dirs):
    """Stream (availableNow, complete-to-memory) == batch groupBy over
    the same tumbling windows."""
    from pyspark.sql import functions as F

    tmp = stream_dirs
    stream = streaming.read_transcript_stream(spark, str(tmp / "in"))
    q = (
        streaming.windowed_turn_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp / "ck_win"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win_start, r.win_end, r.role): r.n_turns
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    # batch reference: same windows over the raw (non-deduped) file input
    # — the streamed source re-delivered some rows, and the watermarked
    # agg deliberately counts rows, not distinct turns, so the batch side
    # must see the same physical rows
    batch = (
        spark.read.parquet(str(tmp / "in"))
        .groupBy(F.window("ts", "10 minutes").alias("win"), "role")
        .agg(F.count("*").alias("n"))
    )
    ref = {
        (r.win.start, r.win.end, r.role): r.n for r in batch.collect()
    }
    # append mode only emits windows the watermark has passed; every
    # emitted window must match the batch count exactly
    assert got
    for k, v in got.items():
        assert ref.get(k) == v


def test_stateful_conversation_stats(spark, small_rows, tmp_path):
    """applyInPandasWithState running counter == batch groupBy result
    (final state after one availableNow pass)."""
    pdf = fixtures.turns_to_pandas(small_rows)
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "in"))
    stream = streaming.read_transcript_stream(spark, str(tmp_path / "in"))
    q = (
        streaming.conversation_stats_stateful(stream)
        .writeStream.format("memory")
        .queryName("conv_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_state"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT conv_id, n_turns, max_ts FROM conv_stats"
    ).collect()
    # keep the LAST update per conv (update mode may emit per micro-batch)
    got = {}
    for r in rows:
        prev = got.get(r.conv_id)
        if prev is None or r.n_turns >= prev[0]:
            got[r.conv_id] = (r.n_turns, r.max_ts)
    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(str(tmp_path / "in"))
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("ts").alias("m"))
    )
    ref = {r.conv_id: (r.n, r.m) for r in batch.collect()}
    assert got == ref


def test_foreach_batch_pipeline(spark, small_rows, tmp_path):
    pdf = fixtures.turns_to_pandas(small_rows)
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "in"))
    q = streaming.foreach_batch_pipeline(
        spark, str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out/extracted"))
    assert out.count() > 0
    assert "ex" in out.columns


def test_sessionized_turn_counts_matches_batch(spark, small_rows, stream_dirs):
    """session_window re-segmentation: stream (availableNow, append) ==
    batch run of the SAME function over the same physical rows, and a
    conv whose turns straddle a >gap pause splits into >=2 sessions."""
    import pandas as pd
    from pyspark.sql import functions as F

    tmp = stream_dirs
    # add one conv with a deliberate 30-minute gap (5-minute session gap)
    gap_rows = pd.DataFrame({
        "conv_id": ["gap_conv"] * 4,
        "turn_idx": [0, 1, 2, 3],
        "role": ["user", "assistant", "user", "assistant"],
        "ts": pd.to_datetime([
            "2026-01-01 00:00:00", "2026-01-01 00:01:00",
            "2026-01-01 00:31:00", "2026-01-01 00:32:00",
        ]),
        "text": ["a", "b", "c", "d"],
        "tool": [None] * 4,
    })
    sample = spark.read.parquet(str(tmp / "in")).limit(1).toPandas()
    gap_rows = gap_rows[[c for c in sample.columns]]
    spark.createDataFrame(gap_rows).write.parquet(str(tmp / "in"), mode="append")

    stream = streaming.read_transcript_stream(spark, str(tmp / "in"))
    q = (
        streaming.sessionized_turn_counts(stream)
        .writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp / "ck_sess"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.conv_id, r.sess_start, r.sess_end): r.n_turns
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }
    ref = {
        (r.conv_id, r.sess_start, r.sess_end): r.n_turns
        for r in streaming.sessionized_turn_counts(
            spark.read.parquet(str(tmp / "in"))
        ).collect()
    }
    # append mode only emits sessions the watermark closed; each emitted
    # session must match the batch run exactly
    assert got
    for k, v in got.items():
        assert ref.get(k) == v
    # the gap conversation re-segments into two sessions in the batch ref
    gap_sessions = [k for k in ref if k[0] == "gap_conv"]
    assert len(gap_sessions) == 2
    assert sorted(ref[k] for k in gap_sessions) == [2, 2]


def test_streaming_profile_matches_batch(spark, tmp_path):
    """Streamed document profiling (availableNow, two file batches, one
    re-delivered file) == the batch text_profile over the distinct
    rows."""
    import pandas as pd

    from mongo2neo_spark.operators import text as text_mod
    from mongo2neo_spark.streaming import stream as sm

    def pdf(ids):
        return pd.DataFrame({
            "doc_id": ids,
            "text": [f"Doc number {i} says the quick brown fox story {i}"
                     for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": [40 + i for i in ids],
        })

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(pdf(list(range(0, 30)))).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame(pdf(list(range(30, 50)))).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    # re-delivery: batch 3 repeats ids 10..19 with identical payloads
    spark.createDataFrame(pdf(list(range(10, 20)))).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    q = sm.start_profile_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = sorted(
        map(tuple, sm.read_streamed_profiles(
            spark, str(tmp_path / "out")
        ).collect())
    )
    batch_in = spark.createDataFrame(
        pd.concat([pdf(list(range(0, 50)))])
    )
    want = sorted(map(tuple, text_mod.text_profile(batch_in).collect()))
    assert got == want and len(got) == 50
