"""Unit tests for operators/ranking.py (distributed rank/ntile) and the
plans/inspect.py global-window lint — parity against Spark's own global
``row_number``/``ntile`` windows on frames small enough that the
single-partition reference plan is fine."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ubw_spark.operators.ranking import (
    distributed_ntile,
    distributed_rank,
)
from ubw_spark.plans.inspect import global_window_violations


def _frame(spark, values):
    rows = [(i, v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "id bigint, v double")


def _reference_rank(spark, df):
    w = Window.orderBy("v", "id")
    return df.withColumn("rank", F.row_number().over(w))


CASES = {
    "uniform": [float(x) for x in range(20)],
    "ties_and_dups": [1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 1.0, 2.0],
    "skewed_hot_value": [5.0] * 15 + [1.0, 9.0],
    "negative_and_wide": [-1e6, -3.5, 0.0, 0.0, 2.5, 1e6],
    "single_row": [42.0],
    "with_nulls": [3.0, None, 1.0, None, 2.0],
    "with_nans": [3.0, float("nan"), 1.0, float("nan"), 2.0],
    "nulls_and_nans": [None, float("nan"), 2.0, None, float("nan"), 1.0],
    "all_nan": [float("nan"), float("nan")],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_rank_matches_global_row_number(spark, name):
    df = _frame(spark, CASES[name])
    got = distributed_rank(df, "v", "id", num_buckets=4).orderBy("id")
    want = _reference_rank(spark, df).orderBy("id")
    # compare (id, rank), not whole rows: v is keyed by id on both sides,
    # and NaN cells would fail any dict equality (NaN != NaN)
    assert [(r.id, r.rank) for r in got.collect()] == [
        (r.id, r.rank) for r in want.collect()
    ]


@pytest.mark.parametrize(
    "n_rows,n_tiles",
    [(10, 4), (7, 3), (3, 5), (12, 12), (1, 4), (6, 1)],
)
def test_ntile_matches_spark_ntile(spark, n_rows, n_tiles):
    """Covers rem != 0, n_rows < n_tiles, n_rows == n_tiles, 1 row."""
    df = _frame(spark, [float(x % 5) for x in range(n_rows)])  # with ties
    got = distributed_ntile(df, n_tiles, "v", "id", num_buckets=3).orderBy("id")
    w = Window.orderBy("v", "id")
    want = df.withColumn("tile", F.ntile(n_tiles).over(w)).orderBy("id")
    assert [(r.id, r.tile) for r in got.collect()] == [
        (r.id, r.tile) for r in want.collect()
    ]


def test_empty_input(spark):
    df = _frame(spark, []).filter("id > 0")
    assert distributed_rank(df, "v", "id").count() == 0
    assert distributed_ntile(df, 4, "v", "id").count() == 0


def test_all_null_sort_key(spark):
    df = _frame(spark, [None, None, None])
    got = {(r.id, r.rank) for r in distributed_rank(df, "v", "id").collect()}
    assert got == {(0, 1), (1, 2), (2, 3)}  # ordered by tiebreak only


def test_reserved_column_collision_rejected(spark):
    df = _frame(spark, [1.0]).withColumn("__bucket", F.lit(0))
    with pytest.raises(ValueError, match="__bucket"):
        distributed_rank(df, "v", "id")


def test_rank_plan_has_no_global_window_and_lint_agrees(spark):
    df = _frame(spark, [float(x) for x in range(50)])
    ranked = distributed_rank(df, "v", "id", num_buckets=8)
    # The only unpartitioned window is the ledger cumsum over the
    # bucket-count Aggregate — exactly the shape the lint exempts.
    assert global_window_violations(ranked) == []


def test_lint_flags_raw_global_window(spark):
    df = _frame(spark, [float(x) for x in range(10)])
    bad = df.withColumn("r", F.row_number().over(Window.orderBy("v")))
    violations = global_window_violations(bad)
    assert violations and "empty partition spec" in violations[0]


def test_lint_passes_partitioned_window(spark):
    df = _frame(spark, [float(x) for x in range(10)])
    ok = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("id").orderBy("v"))
    )
    assert global_window_violations(ok) == []
