"""Property tests: the closed-form statistics agree with numpy on
random data, and the sketch/bootstrap error laws hold.

Each property runs a handful of hypothesis examples (Spark jobs are
the cost); the deterministic integer pipelines mean a single
counterexample would reproduce exactly.
"""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ubw_spark.operators.regression import correlation_matrix, groupwise_ols

_OPTS = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(max_examples=6, **_OPTS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_ols_matches_numpy_polyfit(spark, pts):
    xs = np.array([p[0] for p in pts], dtype=float)
    ys = np.array([p[1] for p in pts], dtype=float)
    if np.ptp(xs) == 0:
        return  # degenerate: covered by the unit test (NULL output)
    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in pts],
        "g string, x double, y double",
    )
    r = groupwise_ols(df, ["g"], "x", "y").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    assert r["slope"] == pytest.approx(slope, abs=2e-6)
    assert r["intercept"] == pytest.approx(intercept, abs=2e-6)
    if np.ptp(ys) != 0:
        rho = np.corrcoef(xs, ys)[0, 1]
        assert r["r2"] == pytest.approx(rho * rho, abs=2e-6)


@settings(max_examples=6, **_OPTS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-100, max_value=100),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_corr_matches_numpy(spark, pts):
    xs = np.array([p[0] for p in pts], dtype=float)
    ys = np.array([p[1] for p in pts], dtype=float)
    if np.ptp(xs) == 0 or np.ptp(ys) == 0:
        return
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    r = correlation_matrix(df, [("x", "x", 1), ("y", "y", 1)]).collect()[0]
    assert r["corr"] == pytest.approx(
        np.corrcoef(xs, ys)[0, 1], abs=2e-6
    )


def test_hist_quantile_error_law_many_seeds(spark):
    """est within one bin width of the exact sample quantile, for every
    quantile probed, on several random shapes (uniform, clustered,
    heavy-tailed-ish)."""
    import random

    from ubw_spark.operators.qsketch import hist_build, hist_quantiles

    for seed, gen in [
        (1, lambda r: r.randrange(0, 10_000)),
        (2, lambda r: int(min(abs(r.gauss(5_000, 300)), 9_999))),
        (3, lambda r: int(min(r.expovariate(1 / 800), 9_999))),
    ]:
        rnd = random.Random(seed)
        data = [gen(rnd) for _ in range(3_000)]
        df = spark.createDataFrame([(v,) for v in data], "v long")
        cells = hist_build(df, "v", lo=0, hi=10_000, nbins=100)
        width = 100.0
        s = sorted(data)
        est = {
            r["q_milli"]: r["est"]
            for r in hist_quantiles(cells, [100, 500, 900, 990]).collect()
        }
        for q in (100, 500, 900, 990):
            exact = s[max(0, math.ceil(q / 1000 * len(s)) - 1)]
            assert abs(est[q] - exact) <= width, (seed, q, est[q], exact)


def test_bootstrap_weight_law_chi_square(spark):
    """Pooled over many (id, b) draws, the weight histogram matches
    Poisson(1) — a chi-square goodness-of-fit at the 99.9% level."""
    from pyspark.sql import functions as F

    from ubw_spark.operators.bootstrap import poisson_weight, row_seed

    df = spark.range(2_000).select(F.col("id"))
    counts = {k: 0 for k in range(8)}
    for b in (0, 1, 2):
        rows = df.select(
            poisson_weight(row_seed(F.col("id")), b).alias("w")
        ).groupBy("w").count().collect()
        for r in rows:
            counts[r["w"]] += r["count"]
    n = sum(counts.values())
    chi2 = 0.0
    for k in range(7):
        p = math.exp(-1) / math.factorial(k)
        expect = n * p
        chi2 += (counts[k] - expect) ** 2 / expect
    # 7 bins tracked → df≈6, chi2_0.999(6) ≈ 22.5
    assert chi2 < 22.5, (chi2, counts)
