"""Unit tests for bench.py's regression comparator (the full bench run
is the driver's job; here we pin the flagging semantics)."""

from bench import regressions


def test_flags_real_regression():
    cur = {"q1": 3.0, "q2": 0.5}
    base = {"q1": 1.0, "q2": 0.5}
    regs = regressions(cur, base)
    assert len(regs) == 1 and regs[0].startswith("q1:")


def test_absolute_floor_suppresses_noise():
    # 2x on a 0.2s query is scheduler noise, not a regression
    assert regressions({"q": 0.4}, {"q": 0.2}) == []
    # but 2x on a 1s query is real
    assert regressions({"q": 2.0}, {"q": 1.0}) != []


def test_new_queries_skip_baseline():
    assert regressions({"brand_new": 9.9}, {}) == []


def test_within_factor_passes():
    assert regressions({"q": 1.4}, {"q": 1.0}) == []
