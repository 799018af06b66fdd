"""Poisson bootstrap (operators/bootstrap.py)."""

import pytest

from pyspark.sql import functions as F

from ubw_spark.operators.bootstrap import (
    POISSON1_CDF,
    bootstrap_means,
    poisson_weight,
    row_seed,
)


@pytest.fixture(scope="module")
def pop(spark):
    # 500 ids with values 0..499 → true mean 249.5
    return spark.createDataFrame(
        [(i, i) for i in range(500)], "id long, v long"
    )


def test_weights_are_deterministic_and_poisson_like(spark, pop):
    w = pop.select(poisson_weight(row_seed(F.col("id")), 3).alias("w"))
    a = [r["w"] for r in w.collect()]
    b = [r["w"] for r in w.collect()]
    assert a == b  # pure function of (id, b)
    mean_w = sum(a) / len(a)
    assert 0.85 < mean_w < 1.15  # E[w] = 1
    assert max(a) <= 7 and min(a) >= 0
    # different resample index → different draw for at least some rows
    w5 = [
        r["w"]
        for r in pop.select(poisson_weight(row_seed(F.col("id")), 5).alias("w")).collect()
    ]
    assert w5 != a


def test_cdf_table_is_cumulative_poisson1(spark):
    import math

    cum = 0.0
    for k, t in enumerate(POISSON1_CDF):
        cum += math.exp(-1) / math.factorial(k)
        assert t == pytest.approx(cum, abs=1e-15)


def test_bootstrap_means_cluster_around_truth(spark, pop):
    rows = bootstrap_means(pop, "id", "v", b_resamples=16).collect()
    assert len(rows) == 16
    means = [r["mean"] for r in rows]
    assert all(m is not None for m in means)
    # distinct resamples → distinct means (not a constant column)
    assert len(set(means)) > 1
    # sampling distribution centered near 249.5 (sd ≈ sd_pop/√n ≈ 6.5)
    grand = sum(means) / len(means)
    assert abs(grand - 249.5) < 10
    # n_eff fluctuates around n = 500 (sd ≈ √500 ≈ 22)
    for r in rows:
        assert 380 <= r["n_eff"] <= 620


def test_bootstrap_rejects_b_below_two(spark, pop):
    with pytest.raises(ValueError):
        bootstrap_means(pop, "id", "v", b_resamples=1)


def test_null_values_excluded(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 20)], "id long, v long"
    )
    rows = bootstrap_means(df, "id", "v", b_resamples=4).collect()
    # only ids 1 and 3 participate → n_eff bounded by 2 draws of ≤7
    assert all(r["n_eff"] <= 14 for r in rows)


def test_null_ids_excluded_not_weight7(spark):
    df = spark.createDataFrame(
        [(None, 100), (1, 10)], "id long, v long"
    )
    rows = bootstrap_means(df, "id", "v", b_resamples=4).collect()
    # only id=1 participates: every resample mean is exactly 10 (or
    # NULL when its weight drew 0) — a 7x-weighted NULL-id row would
    # drag means toward 100
    for r in rows:
        assert r["n_eff"] <= 7
        assert r["mean"] is None or r["mean"] == 10.0


def test_large_b_index_no_int_wrap(spark):
    from ubw_spark.operators.bootstrap import poisson_weight, row_seed

    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    w = [
        r["w"]
        for r in df.select(
            poisson_weight(row_seed(F.col("id")), 25_000).alias("w")
        ).collect()
    ]
    # int32 wrap would corrupt the offset and skew the law hard;
    # with long arithmetic the draws stay Poisson(1)-ish
    assert 0.7 < sum(w) / len(w) < 1.3
    assert min(w) >= 0


def test_grouped_bootstrap_segments_are_independent(spark):
    # each unit's draws depend only on (id, b): the group split must
    # not change any unit's weight, so segment means derive from the
    # same draws the ungrouped run used
    rows = [(i, "a" if i < 250 else "z", i) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    grouped = bootstrap_means(
        df, "id", "v", b_resamples=8, group_cols=["g"]
    ).collect()
    assert len(grouped) == 16
    solo_a = {
        r["b"]: r
        for r in bootstrap_means(
            df.where("g = 'a'"), "id", "v", b_resamples=8
        ).collect()
    }
    got_a = {r["b"]: r for r in grouped if r["g"] == "a"}
    for b in range(8):
        assert got_a[b]["n_eff"] == solo_a[b]["n_eff"]
        assert got_a[b]["mean"] == solo_a[b]["mean"]
