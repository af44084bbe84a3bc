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
