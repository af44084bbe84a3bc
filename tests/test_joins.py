"""asof_join: <= semantics, per-key isolation, left-join nulls,
determinism under duplicate right rows."""

import datetime as dt

import pandas as pd

from mongo2neo_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": ["u1", "u1", "u1", "u2"],
                "ts": [_ts(5), _ts(10), _ts(3), _ts(7)],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": ["u1", "u1", "u1", "u3"],
                # duplicate right row at s=10 exercises the dedup
                "ts": [_ts(4), _ts(10), _ts(10), _ts(1)],
            }
        )
    )
    out = {r.event_id: r.asof_ts for r in asof_join(left, right, "user_id").collect()}
    assert out[1] == _ts(4)    # latest right <= 5 is 4
    assert out[2] == _ts(10)   # equal timestamps match (<= semantics)
    assert out[3] is None      # no right at or before 3... right at 1? u1 has 4,10 -> none <= 3
    assert out[4] is None      # u2 has no rights at all


def test_asof_join_equal_ts_prefers_right_first(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": [_ts(10)], "event_id": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "ts": [_ts(10), _ts(2)]})
    )
    row = asof_join(left, right, "k").collect()[0]
    assert row.asof_ts == _ts(10)
