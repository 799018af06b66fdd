"""Term-share drift (operators/drift.py)."""

import pytest

from ubw_spark.operators.drift import term_drift_topk, term_shares


def _toks(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_shares_exact_micro(spark):
    out = {
        r["term"]: r
        for r in term_shares(_toks(spark, ["a", "a", "a", "b"])).collect()
    }
    assert out["a"]["cnt"] == 3 and out["a"]["share_micro"] == 750_000
    assert out["b"]["share_micro"] == 250_000


def test_drift_ranks_movers_and_handles_one_sided_terms(spark):
    a = _toks(spark, ["x"] * 5 + ["y"] * 5)          # x 50%, y 50%
    b = _toks(spark, ["x"] * 1 + ["y"] * 5 + ["z"] * 4)  # x 10%, z 40%
    rows = term_drift_topk(a, b, k=3).collect()
    assert [r["term"] for r in rows] == ["x", "z", "y"]
    x = rows[0]
    assert (x["cnt_a"], x["cnt_b"]) == (5, 1)
    assert (x["share_a_micro"], x["share_b_micro"]) == (500_000, 100_000)
    assert x["delta_micro"] == 400_000
    z = rows[1]  # absent from A entirely
    assert (z["cnt_a"], z["share_a_micro"], z["delta_micro"]) == (
        0, 0, 400_000
    )


def test_drift_tiebreak_is_term_asc(spark):
    a = _toks(spark, ["p", "q"])
    b = _toks(spark, ["p", "q"])  # identical → all deltas 0
    rows = term_drift_topk(a, b, k=2).collect()
    assert [r["term"] for r in rows] == ["p", "q"]


def test_identical_snapshots_have_zero_delta(spark):
    a = _toks(spark, ["m", "m", "n"])
    rows = term_drift_topk(a, a, k=5).collect()
    assert all(r["delta_micro"] == 0 for r in rows)
    assert all(r["cnt_a"] == r["cnt_b"] for r in rows)
