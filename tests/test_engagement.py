"""Engagement analytics (operators/engagement.py)."""

import datetime as dt

import pytest

from ubw_spark.operators.engagement import (
    active_units,
    new_vs_returning,
    rolling_actives,
    stickiness,
)


def _t(day, hour=12):
    return dt.datetime(2024, 3, day, hour)


@pytest.fixture(scope="module")
def ev(spark):
    # day 1: users 1,2  (1 twice — day grain must dedup)
    # day 2: user 1
    # day 4: user 3     (day 3 has no activity: no row for it)
    rows = [
        (1, _t(1, 9)), (1, _t(1, 18)), (2, _t(1)),
        (1, _t(2)),
        (3, _t(4)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_active_units_day_grain(spark, ev):
    du = {(r["d"].day, r["u"]) for r in active_units(ev, "user_id").collect()}
    assert du == {(1, 1), (1, 2), (2, 1), (4, 3)}


def test_rolling_actives_window_and_ghost_days(spark, ev):
    du = active_units(ev, "user_id")
    out = {r["d"].day: r["active"] for r in rolling_actives(du, 3).collect()}
    # day 1: {1,2}; day 2: {1,2}∪{1}; day 4: {1 (from d2)}∪{3}
    # day 3 has NO activity → must not appear even though fan-out
    # produces candidate rows for it; same for ghost days 5-6.
    assert out == {1: 2, 2: 2, 4: 2}


def test_rolling_actives_dedups_across_days(spark, ev):
    # user 1 active on days 1 AND 2 → counted once in day 2's window
    du = active_units(ev, "user_id")
    out = {r["d"].day: r["active"] for r in rolling_actives(du, 7).collect()}
    assert out[2] == 2  # users {1,2}, not 3 occurrences
    assert out[4] == 3  # everyone within 7 days


def test_stickiness_exact_milli(spark, ev):
    s = {r["d"].day: r for r in stickiness(ev, "user_id", window_days=3).collect()}
    assert (s[1]["dau"], s[1]["wau"], s[1]["stickiness_milli"]) == (2, 2, 1000)
    assert (s[2]["dau"], s[2]["wau"], s[2]["stickiness_milli"]) == (1, 2, 500)
    # day 4: dau=1, wau=2 (user 1 from day 2 still in the 3-day window)
    assert (s[4]["dau"], s[4]["wau"], s[4]["stickiness_milli"]) == (1, 2, 500)


def test_new_vs_returning(spark, ev):
    out = {
        r["d"].day: (r["new_units"], r["returning_units"])
        for r in new_vs_returning(ev, "user_id").collect()
    }
    assert out == {1: (2, 0), 2: (0, 1), 4: (1, 0)}


def test_rolling_actives_rejects_nonpositive_window(spark, ev):
    du = active_units(ev, "user_id")
    with pytest.raises(ValueError, match="window_days"):
        rolling_actives(du, 0)


def test_cohort_ltv_hand_computed(spark):
    from pyspark.sql import functions as F

    from ubw_spark.operators.engagement import cohort_ltv

    # cohort week of 2024-03-04 (Mon): users 1, 2 first seen that week
    # user 3 first seen the following week (2024-03-11 cohort)
    rows = [
        (1, dt.datetime(2024, 3, 4), 100),   # w0 revenue
        (1, dt.datetime(2024, 3, 12), 50),   # age 1 week
        (2, dt.datetime(2024, 3, 5), None),  # activity, no revenue
        (2, dt.datetime(2024, 3, 20), 30),   # age 2 weeks
        (3, dt.datetime(2024, 3, 13), 40),   # second cohort, age 0
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, cents long")
    out = {
        (r["cohort_week"], r["age_week"]): r
        for r in cohort_ltv(df, "user_id", "ts", F.col("cents")).collect()
    }
    a0 = out[("2024-03-04", 0)]
    assert (a0["rev_cents"], a0["cum_rev_cents"], a0["cohort_users"]) == (
        100, 100, 2
    )
    assert a0["ltv_cents_per_user"] == 50
    a1 = out[("2024-03-04", 1)]
    assert (a1["rev_cents"], a1["cum_rev_cents"]) == (50, 150)
    a2 = out[("2024-03-04", 2)]
    assert (a2["cum_rev_cents"], a2["ltv_cents_per_user"]) == (180, 90)
    b0 = out[("2024-03-11", 0)]
    assert (b0["rev_cents"], b0["cohort_users"]) == (40, 1)
