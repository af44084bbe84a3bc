"""Ingest: prune/cast, validity filters, deterministic dedup (P1-P4)."""

import datetime as dt

import pandas as pd

from mongo2neo_spark.operators import ingest


def _df(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("Int32")
    return spark.createDataFrame(pdf)


def test_filters_nulls_and_empty_text(spark):
    ts = dt.datetime(2026, 1, 1)
    df = _df(
        spark,
        [
            ("c1", 0, "user", "hello", None, ts),
            ("c1", 1, "user", "", None, ts),
            ("c1", 2, "user", None, None, ts),
            (None, 3, "user", "x", None, ts),
            ("c2", None, "user", "y", None, ts),
        ],
    )
    out = ingest.ingest(df).collect()
    assert [(r.conv_id, r.turn_idx) for r in out] == [("c1", 0)]


def test_dedup_deterministic_survivor(spark):
    ts = dt.datetime(2026, 1, 1)
    df = _df(
        spark,
        [
            ("c1", 0, "user", "bbb", None, ts),
            ("c1", 0, "assistant", "aaa", None, ts),  # min under (role,text,..)
            ("c1", 0, "user", "bbb", None, ts),
        ],
    )
    out = ingest.ingest(df).collect()
    assert len(out) == 1
    assert out[0].role == "assistant" and out[0].text == "aaa"


def test_per_turn_text_equality_under_permutation(spark, small_rows):
    """The contract's per-row invariant: per-turn text equality under
    stable (conv_id, turn_idx) ordering, for any input permutation."""
    from mongo2neo_spark import fixtures, oracle

    messy = fixtures.with_duplicates_and_shuffle(small_rows)
    df = spark.createDataFrame(fixtures.turns_to_pandas(messy))
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in ingest.ingest(df).collect()
    }
    ref = {
        (r.conv_id, r.turn_idx): r.text for r in oracle.dedup_turns(small_rows)
    }
    assert got == ref


def test_dedup_adaptive_matches_dedup(spark, small_rows):
    """The anti/semi adaptive dedup must be row-identical to the plain
    shuffle dedup — on duplicate-free AND duplicate-heavy inputs."""
    from mongo2neo_spark import fixtures

    clean_df = ingest.clean(
        spark.createDataFrame(fixtures.turns_to_pandas(small_rows))
    )
    messy_df = ingest.clean(
        spark.createDataFrame(
            fixtures.turns_to_pandas(
                fixtures.with_duplicates_and_shuffle(small_rows, dup_rate=0.4)
            )
        )
    )
    for df in (clean_df, messy_df):
        a = sorted(map(tuple, ingest.dedup(df).collect()))
        b = sorted(map(tuple, ingest.dedup_adaptive(df).collect()))
        assert a == b


def test_dedup_adaptive_survivor_determinism(spark):
    import datetime as _dt

    ts = _dt.datetime(2026, 1, 1)
    df = _df(
        spark,
        [
            ("c1", 0, "user", "bbb", None, ts),
            ("c1", 0, "assistant", "aaa", None, ts),
            ("c1", 1, "user", "solo", None, ts),
        ],
    )
    out = {r.turn_idx: r for r in ingest.dedup_adaptive(ingest.clean(df)).collect()}
    assert out[0].role == "assistant" and out[0].text == "aaa"
    assert out[1].text == "solo"


def test_role_filter(spark):
    ts = dt.datetime(2026, 1, 1)
    df = _df(
        spark,
        [
            ("c1", 0, "user", "a", None, ts),
            ("c1", 1, "tool", "b", "search", ts),
        ],
    )
    out = ingest.ingest(df, roles=("user", "assistant")).collect()
    assert [r.turn_idx for r in out] == [0]


def test_ordered_turns_rank(spark):
    ts = dt.datetime(2026, 1, 1)
    df = _df(
        spark,
        [("c1", 5, "user", "a", None, ts), ("c1", 2, "user", "b", None, ts)],
    )
    out = {r.turn_idx: r.turn_rank for r in ingest.ordered_turns(ingest.ingest(df)).collect()}
    assert out == {2: 1, 5: 2}
