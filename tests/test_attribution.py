"""Multi-touch attribution (operators/attribution.py)."""

import datetime as dt

from ubw_spark.operators.attribution import position_attribution


def _ev(spark, rows):
    data = [
        (u, i, dt.datetime(2024, 1, 1, 0, i), t)
        for i, (u, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "user_id int, event_id int, ts timestamp, event_type string"
    )


def test_u_shape_credits_by_journey_size(spark):
    rows = [
        # journey 1: five touches -> 400, 66, 66, 66, 400 (200 div 3)
        (1, "view"), (1, "click"), (1, "view"), (1, "click"), (1, "view"),
        (1, "purchase"),
        # journey 2 (same user, resets after purchase): one touch -> 1000
        (1, "click"), (1, "purchase"),
        # unconverted tail: no credit rows
        (1, "view"),
        # user 2: two touches -> 500/500
        (2, "view"), (2, "click"), (2, "purchase"),
        # user 3: three touches -> 400/200/400
        (3, "view"), (3, "view"), (3, "click"), (3, "purchase"),
        # user 4: errors are not touch types and purchases alone earn 0
        (4, "error"), (4, "purchase"),
    ]
    out = position_attribution(_ev(spark, rows)).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(
            (r["event_id"], r["credit_milli"])
        )
        assert r["event_type"] in ("view", "click")
    u1 = [c for _, c in sorted(by_user[1])]
    assert u1 == [400, 66, 66, 66, 400, 1000]
    assert [c for _, c in sorted(by_user[2])] == [500, 500]
    assert [c for _, c in sorted(by_user[3])] == [400, 200, 400]
    assert 4 not in by_user  # error events never earn credit
    # the unconverted tail view (user 1, last event) earned nothing
    assert len(u1) == 6


def test_total_credit_bounded_by_conversions(spark):
    rows = [
        (1, "view"), (1, "click"), (1, "view"), (1, "purchase"),
        (2, "click"), (2, "purchase"),
    ]
    out = position_attribution(_ev(spark, rows)).collect()
    total = sum(r["credit_milli"] for r in out)
    # <= 1000 per conversion; integral middle split may leak milli
    assert 1900 <= total <= 2000
