"""Rolling/lag feature engineering (operators/features.py, wave 10)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.features import (
    lag_features,
    rolling_features,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def series(spark):
    rows = [("u", _ts(i * 30), float(i), i) for i in range(5)]
    rows.append(("u", _ts(300), None, 9))      # NULL value at minute 300
    rows.append(("v", _ts(0), 100.0, 20))
    return spark.createDataFrame(
        rows, "uid string, ts timestamp, v double, eid long")


def test_rows_window_semantics(series):
    out = rolling_features(series, key="uid", ts="ts", value="v",
                           rows_windows=[3], stats=("avg", "count"),
                           order_tiebreak="eid")
    got = {r.eid: (r.v_avg_3r, r.v_count_3r) for r in out.collect()}
    assert got[0] == (0.0, 1)
    assert got[2] == (1.0, 3)           # mean(0,1,2)
    assert got[4] == (3.0, 3)           # mean(2,3,4)
    assert got[9] == (3.5, 2)           # NULL value skipped: mean(3,4)
    assert got[20] == (100.0, 1)        # keys independent


def test_range_window_semantics(series):
    # 60-minute trailing range at minute 120 covers minutes 60..120
    out = rolling_features(series, key="uid", ts="ts", value="v",
                           range_windows_seconds=[3600.0],
                           stats=("count",))
    got = {r.eid: r.v_count_3600s for r in out.collect()}
    assert got[0] == 1
    assert got[4] == 3                  # minutes 60, 90, 120
    # at minute 300 the trailing hour holds only the row itself, whose
    # value is NULL -> non-NULL count is 0
    assert got[9] == 0


def test_lag_and_gap(series):
    out = lag_features(series, key="uid", ts="ts", value="v",
                       lags=[1, 2], order_tiebreak="eid")
    got = {r.eid: (r.v_lag_1, r.v_lag_2, r.v_delta, r.ts_gap_micros)
           for r in out.collect()}
    assert got[0] == (None, None, None, None)
    assert got[2] == (1.0, 0.0, 1.0, 30 * 60_000_000)
    assert got[20] == (None, None, None, None)


def test_shared_single_exchange(series):
    out = rolling_features(series, key="uid", ts="ts", value="v",
                           rows_windows=[3, 5],
                           range_windows_seconds=[3600.0],
                           stats=("avg", "count"),
                           order_tiebreak="eid")
    out = lag_features(out, key="uid", ts="ts", value="v",
                       order_tiebreak="eid")
    plan = _plan(out)
    # row frames + range frame + lags all reuse one hash-partitioning
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_rejects_bad_specs(series):
    with pytest.raises(ValueError):
        rolling_features(series, key="uid", ts="ts", value="v",
                         rows_windows=[0])
    with pytest.raises(ValueError):
        rolling_features(series, key="uid", ts="ts", value="v",
                         range_windows_seconds=[-1.0])
    with pytest.raises(ValueError):
        rolling_features(series, key="uid", ts="ts", value="v",
                         rows_windows=[2], stats=("median",))
    with pytest.raises(ValueError):
        lag_features(series, key="uid", ts="ts", value="v", lags=[0])


def test_standardize_zscore_and_minmax(spark):
    from jsonschema_valid_spark.operators.features import standardize

    rows = [("g", 0.0, 1), ("g", 10.0, 2), ("g", 20.0, 3),
            ("h", 5.0, 4), ("h", 5.0, 5)]          # h: zero variance
    df = spark.createDataFrame(rows, "grp string, v double, id long")
    z = standardize(df, ["v"], by="grp", method="zscore", suffix="_z")
    got = {r.id: r.v_z for r in z.collect()}
    assert got[1] == pytest.approx(-1.0)
    assert got[2] == pytest.approx(0.0)
    assert got[3] == pytest.approx(1.0)
    assert got[4] is None and got[5] is None       # constant -> NULL

    mm = standardize(df, ["v"], by="grp", method="minmax", suffix="_mm")
    gm = {r.id: r.v_mm for r in mm.collect()}
    assert gm[1] == 0.0 and gm[2] == 0.5 and gm[3] == 1.0
    assert gm[4] is None                            # zero range -> NULL


def test_standardize_fact_side_never_shuffled(spark):
    from jsonschema_valid_spark.operators.features import standardize

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") * 1.0).alias("v"))
    out = standardize(df, ["v"], by="grp")
    plan = out._jdf.queryExecution().executedPlan().toString()
    fact = plan.split("BroadcastExchange", 1)[0]
    assert "Exchange hashpartitioning" not in fact, plan
