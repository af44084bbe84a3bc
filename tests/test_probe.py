"""functions.probe.driver_probe — the shared venue-probe primitive."""

import pandas as pd

from mongo2neo_spark.functions.probe import driver_probe


def _df(spark, n):
    return spark.createDataFrame(
        pd.DataFrame({"x": pd.Series(range(n), dtype="int64")}),
        schema="x long",
    )


def test_probe_returns_complete_set_when_under_max(spark):
    rows = driver_probe(_df(spark, 5), 10)
    assert sorted(r.x for r in rows) == [0, 1, 2, 3, 4]


def test_probe_exactly_max_still_fits(spark):
    rows = driver_probe(_df(spark, 10), 10)
    assert rows is not None and len(rows) == 10


def test_probe_over_max_returns_none(spark):
    assert driver_probe(_df(spark, 11), 10) is None


def test_probe_empty_frame_is_empty_list_not_none(spark):
    rows = driver_probe(_df(spark, 0), 10)
    assert rows == []


def test_probe_disabled_when_max_nonpositive(spark):
    assert driver_probe(_df(spark, 1), 0) is None
