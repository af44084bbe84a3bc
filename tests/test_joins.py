"""asof_join: <= semantics, per-key isolation, left-join nulls,
determinism under duplicate right rows; asof_join_bucketed: identical
output under hot-key-safe (key, time-bucket) partitioning."""

import datetime as dt
import random

import pandas as pd
import pytest

from mongo2neo_spark.operators.joins import asof_join, asof_join_bucketed


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


def test_asof_join_reserved_column_raises(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": [_ts(1)], "_rt": [1]})
    )
    right = spark.createDataFrame(pd.DataFrame({"k": ["a"], "ts": [_ts(1)]}))
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, "k")
    with pytest.raises(ValueError, match="reserved"):
        asof_join_bucketed(left, right, "k")


def _random_frames(spark, seed=13, n_keys=6, n_left=400, n_right=300,
                   zipf_hot=False):
    """Deterministic random left/right frames; with zipf_hot, one key
    holds ~90% of all rows (the straggler scenario the bucketed variant
    exists for)."""
    rng = random.Random(seed)
    keys = [f"u{i}" for i in range(n_keys)]

    def pick_key():
        if zipf_hot and rng.random() < 0.9:
            return keys[0]
        return rng.choice(keys)

    left = pd.DataFrame(
        {
            "event_id": list(range(n_left)),
            "user_id": [pick_key() for _ in range(n_left)],
            "ts": [_ts(rng.randrange(0, 50_000)) for _ in range(n_left)],
        }
    )
    right = pd.DataFrame(
        {
            "user_id": [pick_key() for _ in range(n_right)],
            "ts": [_ts(rng.randrange(0, 50_000)) for _ in range(n_right)],
        }
    )
    return spark.createDataFrame(left), spark.createDataFrame(right)


@pytest.mark.parametrize("zipf_hot", [False, True])
@pytest.mark.parametrize("bucket_seconds", [600, 3600, 10**9])
def test_asof_join_bucketed_matches_plain(spark, zipf_hot, bucket_seconds):
    """Property: bucketed == plain for every bucket width, including one
    huge bucket (degenerates to the plain algorithm) and fine buckets
    (carry-forward crosses many empty buckets), under a 90%-hot key."""
    left, right = _random_frames(spark, zipf_hot=zipf_hot)
    plain = {
        r.event_id: r.asof_ts for r in asof_join(left, right, "user_id").collect()
    }
    bucketed = {
        r.event_id: r.asof_ts
        for r in asof_join_bucketed(
            left, right, "user_id", bucket_seconds=bucket_seconds
        ).collect()
    }
    assert bucketed == plain


def test_asof_join_bucketed_splits_hot_key(spark):
    """The whole point: with a hot key spanning many buckets, the big
    window partitions by (key, bucket) — the plan must show the window's
    partition spec including the bucket column, so one key can never pin
    a single task's sort."""
    left, right = _random_frames(spark, zipf_hot=True)
    out = asof_join_bucketed(left, right, "user_id", bucket_seconds=600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the within-bucket window's partition spec is (user_id, _b)
    assert "windowspecdefinition(user_id" in plan and "_b" in plan
