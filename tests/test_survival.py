"""Kaplan–Meier survival (operators/survival.py)."""

import datetime as dt

import pytest

from ubw_spark.operators.survival import km_curve, lifetimes


def _d(day):
    return dt.datetime(2024, 5, day, 12)


@pytest.fixture(scope="module")
def ev(spark):
    # data window ends 2024-05-20 (user 9's last activity)
    # user 1: days 1-3   → lifetime 2, churned (17 days before end)
    # user 2: days 1-6   → lifetime 5, churned
    # user 3: day 4 only → lifetime 0, churned
    # user 9: days 1-20  → lifetime 19, CENSORED (active at window end)
    rows = (
        [(1, _d(1)), (1, _d(3)),
         (2, _d(1)), (2, _d(6)),
         (3, _d(4)),
         (9, _d(1)), (9, _d(20))]
    )
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_lifetimes_and_censoring(spark, ev):
    lt = {
        (r["t"], r["cens"])
        for r in lifetimes(ev, "user_id", censor_window_days=3).collect()
    }
    assert lt == {(2, 0), (5, 0), (0, 0), (19, 1)}


def test_km_curve_hand_computed(spark, ev):
    lt = lifetimes(ev, "user_id", censor_window_days=3)
    out = {r["t"]: r for r in km_curve(lt).collect()}
    # t=0: at_risk 4, 1 death → S = 3/4
    r0 = out[0]
    assert (r0["at_risk"], r0["deaths"], r0["leaves"]) == (4, 1, 1)
    assert r0["survival"] == pytest.approx(0.75, abs=1e-6)
    # t=2: at_risk 3, 1 death → S = 0.75 * 2/3 = 0.5
    assert out[2]["survival"] == pytest.approx(0.5, abs=1e-6)
    # t=5: at_risk 2, 1 death → S = 0.25
    assert out[5]["survival"] == pytest.approx(0.25, abs=1e-6)
    # t=19: censored exit — no death, survival unchanged
    r19 = out[19]
    assert (r19["deaths"], r19["leaves"]) == (0, 1)
    assert r19["survival"] == pytest.approx(0.25, abs=1e-6)


def test_km_total_extinction_pins_zero(spark):
    # everyone dies on day 1 → S(1) = 0 exactly, no ln(0) NULL leak
    rows = [(1, _d(1)), (1, _d(2)), (2, _d(1)), (2, _d(2))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    lt = lifetimes(df, "user_id", censor_window_days=0)
    out = {r["t"]: r for r in km_curve(lt).collect()}
    assert out[1]["survival"] == 0.0
