"""Time-series regularization (operators/timeseries.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ubw_spark.operators.timeseries import gapfill, resample, time_grid


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


@pytest.fixture(scope="module")
def series(spark):
    # key "a": anchors at hours 0 (v=100) and 4 (v=500), gaps between,
    # trailing gap at 5 via an all-NULL-value event (the bucket exists,
    # its sum is NULL); key "b": a single observation
    rows = [
        ("a", _ts(0), 1.00),
        ("a", _ts(4), 5.00),
        ("a", _ts(5), None),
        ("b", _ts(2), 2.00),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def _filled(spark, series):
    obs = resample(
        series,
        ["k"],
        "ts",
        step="hour",
        aggs=[F.round(F.sum("v") * 100, 0).cast("long").alias("cents")],
    )
    dense = time_grid(obs, ["k"], "ts", step="1 hour")
    return gapfill(
        dense, ["k"], "ts", "cents",
        ffill_col="ff", interp_col="li",
    )


def test_grid_is_dense_and_gaps_are_null(spark, series):
    out = _filled(spark, series).collect()
    a = sorted(
        [r for r in out if r["k"] == "a"], key=lambda r: r["ts"]
    )
    assert [r["ts"].hour for r in a] == [0, 1, 2, 3, 4, 5]
    assert [r["cents"] for r in a] == [100, None, None, None, 500, None]


def test_ffill_carries_and_interp_is_linear(spark, series):
    out = {
        (r["k"], r["ts"].hour): r for r in _filled(spark, series).collect()
    }
    a = [out[("a", h)] for h in range(6)]
    assert [r["ff"] for r in a] == [100, 100, 100, 100, 500, 500]
    # linear between (0h, 100) and (4h, 500): +100/hour
    assert [r["li"] for r in a] == [
        100.0, 200.0, 300.0, 400.0, 500.0,
        500.0,  # trailing gap: nearest anchor, not extrapolation
    ]
    # single-observation key: grid is one row, both fills are identity
    b = out[("b", 2)]
    assert (b["cents"], b["ff"], b["li"]) == (200, 200, 200.0)


def test_leading_gap_has_no_ffill(spark):
    rows = [("a", _ts(0), None), ("a", _ts(2), 3.00)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = sorted(_filled(spark, df).collect(), key=lambda r: r["ts"])
    # ffill carries, it does not invent: NULL before the first anchor
    assert [r["ff"] for r in out] == [None, None, 300]
    # interp holds the nearest anchor on the unanchored side
    assert [r["li"] for r in out] == [300.0, 300.0, 300.0]


def test_anchor_windows_are_consolidated(spark, series):
    # the four anchor lookups must plan as exactly TWO Window nodes —
    # one per sort direction (CollapseWindow merges the two lookups
    # that share partition+order), never one node per reference (the
    # no-CSE discipline).  Two directions are deliberate: the forward
    # anchor runs as a RUNNING frame over the DESC sort because a
    # (current, UNBOUNDED FOLLOWING) frame executes O(n²) per key
    # (UnboundedFollowingWindowFunctionFrame re-scans to the partition
    # end for every row).
    plan = str(
        _filled(spark, series)._jdf.queryExecution().optimizedPlan()
    )
    n_windows = plan.count("Window [")
    assert n_windows == 2, f"expected 2 Window nodes, got {n_windows}"
    assert "unboundedfollowing" not in plan.lower(), (
        "forward anchors must not plan an UNBOUNDED FOLLOWING frame "
        "(quadratic per key)"
    )


def test_resample_steps(spark, series):
    daily = resample(
        series, ["k"], "ts", step="day",
        aggs=[F.count(F.lit(1)).alias("n")],
    ).collect()
    assert {(r["k"], r["n"]) for r in daily} == {("a", 3), ("b", 1)}
