"""Drift monitoring (operators/drift.py) + anomaly z-score
(relational.anomaly_zscore)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from geist_spark.operators.drift import drift_stats, histogram_compare
from geist_spark.operators.relational import anomaly_zscore


def _vals(spark, xs, col="x"):
    return spark.createDataFrame([(float(v),) for v in xs], f"{col} double")


def test_identical_distributions_zero_drift(spark):
    a = _vals(spark, [1, 2, 3, 10, 20, 30])
    r = drift_stats(a, a, "x", 0.0, 32.0, bits=5).collect()[0]
    assert r["tvd"] == 0.0 and r["chi2"] == 0.0
    assert r["n_ref"] == r["n_cur"] == 6


def test_disjoint_distributions_max_tvd(spark):
    ref = _vals(spark, [1.0] * 4)
    cur = _vals(spark, [31.0] * 4)
    r = drift_stats(ref, cur, "x", 0.0, 32.0, bits=5).collect()[0]
    assert r["tvd"] == 1.0  # total mass displaced
    assert r["n_bins"] == 2


def test_histogram_compare_fractions(spark):
    ref = _vals(spark, [1, 1, 17])   # bins 0,0,16 with step=1
    cur = _vals(spark, [1, 17])
    rows = {r["bin"]: r for r in
            histogram_compare(ref, cur, "x", 0.0, 32.0, bits=5).collect()}
    assert rows[1]["ref_frac"] == pytest.approx(2 / 3)
    assert rows[1]["cur_frac"] == 0.5
    assert rows[17]["ref_n"] == 1 and rows[17]["cur_n"] == 1


def test_chi2_hand_computed(spark):
    # ref: 2 in bin A, 2 in bin B -> fracs .5/.5; cur: 3 in A, 1 in B
    # E = 2 each; chi2 = (3-2)^2/2 + (1-2)^2/2 = 1.0
    ref = _vals(spark, [1, 1, 9, 9])
    cur = _vals(spark, [1, 1, 1, 9])
    r = drift_stats(ref, cur, "x", 0.0, 32.0, bits=5).collect()[0]
    assert r["chi2"] == 1.0
    assert r["tvd"] == pytest.approx(0.25)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_anomaly_zscore_flags_spike(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, 10.0 + (i % 2)) for i in range(8)
    ]
    rows.append((99, t0 + dt.timedelta(hours=9), 1, 1000.0))  # spike
    out = {r["event_id"]: r for r in
           anomaly_zscore(_events(spark, rows), days=7, z_threshold=2.0,
                          min_n=5).collect()}
    assert out[99]["is_anomaly"] is True
    assert all(not out[i]["is_anomaly"] for i in range(8))
    # early events lack min_n history -> NULL z, not flagged
    assert out[0]["zscore"] is None


def test_anomaly_zscore_zero_variance_guard(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(hours=i), 1, 5.0) for i in range(10)]
    out = anomaly_zscore(_events(spark, rows), min_n=5).collect()
    assert all(r["zscore"] is None and not r["is_anomaly"] for r in out)


def test_anomaly_zscore_window_respects_range(spark):
    t0 = dt.datetime(2024, 1, 1)
    # 6 old events far in the past + 6 recent: window(days=7) must only
    # see the recent ones
    rows = [(i, t0 + dt.timedelta(hours=i), 1, 100.0) for i in range(6)]
    rows += [
        (10 + i, t0 + dt.timedelta(days=30, hours=i), 1, 1.0)
        for i in range(6)
    ]
    out = {r["event_id"]: r for r in
           anomaly_zscore(_events(spark, rows)).collect()}
    assert out[15]["n_window"] == 6  # recent events only
