"""Closed-form statistics (operators/regression.py)."""

import math

import pytest

from ubw_spark.operators.regression import (
    correlation_matrix,
    groupwise_ols,
    two_proportion_z,
)


@pytest.fixture(scope="module")
def xy(spark):
    # group "lin": exactly y = 2x + 1 (perfect fit, r2 = 1)
    # group "noisy": a known hand-checkable 3-point cloud
    # group "flat": constant x (degenerate — slope undefined)
    rows = [
        ("lin", 1.0, 3.0),
        ("lin", 2.0, 5.0),
        ("lin", 3.0, 7.0),
        ("noisy", 0.0, 0.0),
        ("noisy", 1.0, 1.0),
        ("noisy", 2.0, 4.0),
        ("flat", 5.0, 1.0),
        ("flat", 5.0, 2.0),
    ]
    return spark.createDataFrame(rows, "g string, x double, y double")


def test_ols_perfect_line(spark, xy):
    out = {r["g"]: r for r in groupwise_ols(xy, ["g"], "x", "y").collect()}
    lin = out["lin"]
    assert lin["n"] == 3
    assert lin["slope"] == pytest.approx(2.0)
    assert lin["intercept"] == pytest.approx(1.0)
    assert lin["r2"] == pytest.approx(1.0)


def test_ols_known_cloud(spark, xy):
    # n=3, sx=3, sy=5, sxx=5, syy=17, sxy=9
    # num = 3*9-3*5 = 12, den = 3*5-9 = 6, deny = 3*17-25 = 26
    # slope = 2, intercept = (5-2*3)/3 = -1/3, r2 = 144/156
    r = {x["g"]: x for x in groupwise_ols(xy, ["g"], "x", "y").collect()}
    noisy = r["noisy"]
    assert noisy["slope"] == pytest.approx(2.0)
    assert noisy["intercept"] == pytest.approx(-1 / 3, abs=1e-6)
    assert noisy["r2"] == pytest.approx(144 / 156, abs=1e-6)


def test_ols_degenerate_group_is_null(spark, xy):
    r = {x["g"]: x for x in groupwise_ols(xy, ["g"], "x", "y").collect()}
    flat = r["flat"]
    assert flat["slope"] is None
    assert flat["intercept"] is None
    assert flat["r2"] is None


def test_ols_scaling_matches_unscaled(spark, xy):
    """Scaling y to cents then fitting equals fitting the raw column
    (slope/intercept are in scaled units: ×100)."""
    raw = {
        r["g"]: r
        for r in groupwise_ols(xy, ["g"], "x", "y", y_scale=1).collect()
    }
    cents = {
        r["g"]: r
        for r in groupwise_ols(xy, ["g"], "x", "y", y_scale=100).collect()
    }
    assert cents["lin"]["slope"] == pytest.approx(raw["lin"]["slope"] * 100)
    assert cents["lin"]["r2"] == pytest.approx(raw["lin"]["r2"])


@pytest.fixture(scope="module")
def feats(spark):
    rows = [
        (1.0, 2.0, 5.0),
        (2.0, 4.0, 4.0),
        (3.0, 6.0, 3.0),
        (4.0, 8.0, 2.0),
    ]
    return spark.createDataFrame(rows, "a double, b double, c double")


def test_corr_matrix_exact_and_antisymmetric(spark, feats):
    out = {
        (r["col_x"], r["col_y"]): r
        for r in correlation_matrix(
            feats, [("a", "a", 1), ("b", "b", 1), ("c", "c", 1)]
        ).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(r["n"] == 4 for r in out.values())
    assert out[("a", "b")]["corr"] == pytest.approx(1.0)  # b = 2a
    assert out[("a", "c")]["corr"] == pytest.approx(-1.0)  # c = 6 - a
    assert out[("b", "c")]["corr"] == pytest.approx(-1.0)


def test_corr_constant_column_is_null(spark):
    df = spark.createDataFrame(
        [(1.0, 7.0), (2.0, 7.0), (3.0, 7.0)], "a double, k double"
    )
    rows = correlation_matrix(df, [("a", "a", 1), ("k", "k", 1)]).collect()
    assert len(rows) == 1 and rows[0]["corr"] is None


def test_two_proportion_z_hand_computed(spark):
    # variant 0: 3/4 convert; variant 1: 1/4 convert
    rows = [(0, 1), (0, 1), (0, 1), (0, 0), (1, 1), (1, 0), (1, 0), (1, 0)]
    df = spark.createDataFrame(rows, "variant long, conv int")
    r = two_proportion_z(df, "variant", "conv").collect()
    assert len(r) == 1
    r = r[0]
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (4, 3, 4, 1)
    p = 0.5
    want = (0.75 - 0.25) / math.sqrt(p * (1 - p) * (1 / 4 + 1 / 4))
    assert r["z"] == pytest.approx(want, abs=1e-6)


def test_two_proportion_z_degenerate_pool_is_null(spark):
    # everyone converts → pooled variance 0 → z NULL (not an ANSI error)
    rows = [(0, 1), (0, 1), (1, 1), (1, 1)]
    df = spark.createDataFrame(rows, "variant long, conv int")
    r = two_proportion_z(df, "variant", "conv").collect()[0]
    assert r["rate_a"] == 1.0 and r["rate_b"] == 1.0 and r["z"] is None


def test_two_proportion_z_rejects_wrong_variant_ids(spark):
    df = spark.createDataFrame([(1, 1), (2, 0)], "variant long, conv int")
    with pytest.raises(ValueError, match="exactly variants"):
        two_proportion_z(df, "variant", "conv")
    df3 = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 1)], "variant long, conv int"
    )
    with pytest.raises(ValueError, match="exactly variants"):
        two_proportion_z(df3, "variant", "conv")


def test_cuped_reduces_to_plain_means_when_theta_zero_and_adjusts(spark):
    from ubw_spark.operators.regression import cuped_adjust

    # x perfectly predicts y (y = 2x): adjusted means collapse toward
    # the grand mean of y because all variant difference is explained
    rows = [
        (0, 10, 20), (0, 20, 40), (0, 30, 60),
        (1, 40, 80), (1, 50, 100), (1, 60, 120),
    ]
    df = spark.createDataFrame(rows, "variant long, x long, y long")
    out = {r["variant"]: r for r in cuped_adjust(df, "variant", "x", "y").collect()}
    assert out[0]["theta"] == pytest.approx(2.0)
    assert out[0]["rho2"] == pytest.approx(1.0)
    # grand mean of y = 70; adjustment removes ALL the x-driven gap
    assert out[0]["mean_y_adj"] == pytest.approx(70.0)
    assert out[1]["mean_y_adj"] == pytest.approx(70.0)
    assert out[0]["mean_y"] == pytest.approx(40.0)
    assert out[1]["mean_y"] == pytest.approx(100.0)


def test_cuped_constant_pre_period_is_null(spark):
    from ubw_spark.operators.regression import cuped_adjust

    rows = [(0, 5, 10), (0, 5, 30), (1, 5, 20), (1, 5, 40)]
    df = spark.createDataFrame(rows, "variant long, x long, y long")
    out = {r["variant"]: r for r in cuped_adjust(df, "variant", "x", "y").collect()}
    for v in (0, 1):
        assert out[v]["theta"] is None and out[v]["mean_y_adj"] is None
        assert out[v]["mean_y"] is not None


def test_cuped_excludes_null_metric_units(spark):
    from ubw_spark.operators.regression import cuped_adjust

    base = [(0, 10, 20), (0, 20, 40), (1, 30, 60), (1, 40, 80)]
    clean = spark.createDataFrame(base, "variant long, x long, y long")
    dirty = spark.createDataFrame(
        base + [(0, None, 999), (1, 5, None)],
        "variant long, x long, y long",
    )
    want = {
        r["variant"]: r
        for r in cuped_adjust(clean, "variant", "x", "y").collect()
    }
    got = {
        r["variant"]: r
        for r in cuped_adjust(dirty, "variant", "x", "y").collect()
    }
    for v in (0, 1):
        assert got[v]["n"] == want[v]["n"]
        assert got[v]["theta"] == want[v]["theta"]
        assert got[v]["mean_y_adj"] == want[v]["mean_y_adj"]


def test_diff_in_diff_hand_computed(spark):
    from ubw_spark.operators.regression import diff_in_diff

    # ctl: pre means 10, post 12 (trend +2); trt: pre 20, post 27
    # → did = (27-20) - (12-10) = 5
    rows = [
        (0, 8, 10), (0, 12, 14),
        (1, 18, 25), (1, 22, 29),
    ]
    df = spark.createDataFrame(rows, "variant long, x long, y long")
    r = diff_in_diff(df, "variant", "x", "y").collect()[0]
    assert (r["n_ctl"], r["n_trt"]) == (2, 2)
    assert r["pre_ctl"] == 10.0 and r["post_ctl"] == 12.0
    assert r["pre_trt"] == 20.0 and r["post_trt"] == 27.0
    assert r["did"] == pytest.approx(5.0)


def test_diff_in_diff_rejects_wrong_variants(spark):
    from ubw_spark.operators.regression import diff_in_diff

    df = spark.createDataFrame([(2, 1, 1)], "variant long, x long, y long")
    with pytest.raises(ValueError, match="exactly variants"):
        diff_in_diff(df, "variant", "x", "y")


def test_ols_and_corr_exclude_null_rows(spark):
    """ADVICE r8: count() counts all rows while sum() skips NULLs — a
    NULL x or y must not corrupt slope/r2/corr; complete-case filter
    up front, the cuped_adjust rule applied uniformly."""
    from ubw_spark.operators.regression import (
        correlation_matrix,
        groupwise_ols,
    )

    clean = [("g", float(i), float(2 * i + 1)) for i in range(10)]
    dirty = clean + [("g", None, 99.0), ("g", 5.0, None), ("g", None, None)]
    dc = spark.createDataFrame(clean, "g string, x double, y double")
    dd = spark.createDataFrame(dirty, "g string, x double, y double")
    want = groupwise_ols(dc, ["g"], "x", "y").collect()[0]
    got = groupwise_ols(dd, ["g"], "x", "y").collect()[0]
    assert tuple(got) == tuple(want)
    assert got["n"] == 10 and got["slope"] == 2.0
    wantc = correlation_matrix(dc, [("x", "x", 1), ("y", "y", 1)]).collect()
    gotc = correlation_matrix(dd, [("x", "x", 1), ("y", "y", 1)]).collect()
    assert [tuple(r) for r in gotc] == [tuple(r) for r in wantc]
    assert gotc[0]["n"] == 10 and gotc[0]["corr"] == 1.0


def test_variant_validators_survive_null_ids(spark):
    """ADVICE r8: a NULL variant id must fire the intended ValueError
    naming the bad variants, not a None-vs-int TypeError in sorted()."""
    from ubw_spark.operators.regression import (
        diff_in_diff,
        two_proportion_z,
    )

    units = spark.createDataFrame(
        [(0, 1), (1, 0), (None, 1)], "variant int, success int"
    )
    with pytest.raises(ValueError, match="two_proportion_z"):
        two_proportion_z(units, "variant", "success")
    pp = spark.createDataFrame(
        [(0, 1, 2), (1, 3, 4), (None, 5, 6)],
        "variant int, pre int, post int",
    )
    with pytest.raises(ValueError, match="diff_in_diff"):
        diff_in_diff(pp, "variant", "pre", "post")
