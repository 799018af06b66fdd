"""Column profiler (operators/stats.py::profile_table)."""

import datetime as dt

import pytest

from ubw_spark.operators.stats import profile_table


@pytest.fixture(scope="module")
def mixed(spark):
    rows = [
        (1, "apple", 1.5, dt.datetime(2024, 1, 1)),
        (2, None, None, dt.datetime(2024, 1, 2)),
        (2, "pear", 4.0, None),
    ]
    return spark.createDataFrame(
        rows, "id int, s string, x double, ts timestamp"
    )


def test_counts_nulls_distinct_minmax(mixed):
    prof = {r["col_name"]: r for r in profile_table(mixed).collect()}
    assert set(prof) == {"id", "s", "x", "ts"}
    assert all(r["n"] == 3 for r in prof.values())
    assert (prof["s"]["n_null"], prof["x"]["n_null"]) == (1, 1)
    assert (prof["id"]["n_distinct"], prof["s"]["n_distinct"]) == (2, 2)
    assert (prof["id"]["min_num"], prof["id"]["max_num"]) == (1.0, 2.0)
    assert (prof["x"]["min_num"], prof["x"]["max_num"]) == (1.5, 4.0)
    assert (prof["s"]["min_str"], prof["s"]["max_str"]) == ("apple", "pear")
    # strings have no numeric range, numerics no string range,
    # non-num/non-str types neither — but counts always
    assert prof["s"]["min_num"] is None
    assert prof["id"]["min_str"] is None
    assert prof["ts"]["min_num"] is None and prof["ts"]["min_str"] is None
    assert prof["ts"]["n_null"] == 1 and prof["ts"]["n_distinct"] == 2


def test_column_subset_and_validation(mixed):
    got = profile_table(mixed, ["id"]).collect()
    assert [r["col_name"] for r in got] == ["id"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(mixed, ["nope"])


def test_approx_distinct_tracks_exact(spark):
    df = spark.range(5000).selectExpr("id", "cast(id % 700 as string) s")
    exact = {
        r["col_name"]: r["n_distinct"]
        for r in profile_table(df).collect()
    }
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in profile_table(df, approx_distinct=True).collect()
    }
    assert exact == {"id": 5000, "s": 700}
    for c in exact:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.1


def test_empty_table_profiles_zero_rows(spark):
    df = spark.createDataFrame([], "id int, s string")
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "s"}
    assert all(
        (r["n"], r["n_null"], r["n_distinct"]) == (0, 0, 0)
        for r in prof.values()
    )


def test_single_scan_no_join(mixed):
    # the unpivot is a literal-array explode over the one agg row —
    # profiling must not plan one scan per column or any join
    plan = profile_table(mixed)._jdf.queryExecution().optimizedPlan()
    s = str(plan)
    assert s.count("LogicalRDD") == 1
    assert "Join" not in s


class TestBenford:
    def test_digit_shares_and_expectation(self, spark):
        from ubw_spark.operators.stats import benford_digits

        # 6 values starting with 1, 3 with 2, 1 with 9
        vals = [1, 10, 19, 150, 1999, 123, 2, 25, 299, 9]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        out = {r["digit"]: r for r in benford_digits(df, "v").collect()}
        assert out[1]["cnt"] == 6 and out[1]["share_micro"] == 600_000
        assert out[2]["cnt"] == 3 and out[9]["cnt"] == 1
        # Benford expectation for digit 1 is log10(2) ≈ 0.30103
        assert out[1]["expected_micro"] == 301030
        assert out[1]["dev_micro"] == 600_000 - 301030

    def test_nonpositive_and_null_excluded(self, spark):
        from ubw_spark.operators.stats import benford_digits

        df = spark.createDataFrame(
            [(0,), (-5,), (None,), (7,)], "v long"
        )
        out = benford_digits(df, "v").collect()
        assert len(out) == 1 and out[0]["digit"] == 7 and out[0]["cnt"] == 1
