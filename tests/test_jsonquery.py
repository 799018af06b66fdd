"""JSON-driven query compiler tests: happy path, error accumulation,
injection safety."""

import pytest
from pyspark.sql import functions as F

from ubw_spark.core.errors import SpecValidationError
from ubw_spark.core.jsonquery import compile_json_query


@pytest.fixture()
def tables(spark, friend_df):
    grades = spark.createDataFrame(
        [(3, "C"), (4, "B"), (5, "A"), (6, "S")], "g bigint, letter string"
    )
    reg = {"friend": friend_df, "grades": grades}

    def resolve(name):
        return reg[name]

    return resolve


def test_join_derive_agg_order(spark, tables):
    q = {
        "from": "friend",
        "joins": [{"table": "grades", "on": [["grade", "g"]], "broadcast": True}],
        "columns": [
            {"name": "letter", "expr": "letter"},
            {"name": "age2", "fn": "mul", "args": [{"expr": "age"}, {"lit": 2}]},
        ],
        "group_by": ["letter"],
        "aggs": [
            {"name": "n", "fn": "count"},
            {"name": "max_age2", "fn": "max", "arg": "age2"},
        ],
        "orders": [["letter", False]],
    }
    out = compile_json_query(spark, q, tables).collect()
    got = [(r["letter"], r["n"], r["max_age2"]) for r in out]
    assert got == [("A", 1, 56), ("B", 1, 60), ("C", 1, 4666), ("S", 1, None)]


def test_errors_accumulate(spark, tables):
    q = {
        "from": "friend",
        "joins": [{"table": "nope", "on": [["grade", "g"]]}],
        "columns": [
            {"name": "x", "fn": "no_such_fn", "args": []},
            {"name": "y", "expr": "missing_col"},
            {"expr": "name"},  # missing 'name'
        ],
    }
    with pytest.raises(SpecValidationError) as ei:
        compile_json_query(spark, q, tables)
    msg = str(ei.value)
    assert "nope" in msg and "no_such_fn" in msg and "missing_col" in msg
    assert "'name' required" in msg


def test_no_implicit_cross_join(spark, tables):
    q = {
        "from": "friend",
        "joins": [{"table": "grades", "on": []}],
        "columns": [{"name": "id", "expr": "id"}],
    }
    with pytest.raises(SpecValidationError, match="no implicit cross joins"):
        compile_json_query(spark, q, tables)


def test_expression_language_cannot_inject(spark, tables):
    """Expression nodes are data: a SQL string in 'expr' is treated as a
    (nonexistent) column name, never parsed as SQL."""
    q = {
        "from": "friend",
        "columns": [
            {"name": "x", "expr": "1; DROP TABLE friend--"},
        ],
    }
    with pytest.raises(SpecValidationError, match="not in scope"):
        compile_json_query(spark, q, tables)


def test_params_block_applies(spark, tables):
    q = {
        "from": "friend",
        "columns": [
            {"name": "id", "expr": "id"},
            {"name": "grade", "expr": "grade"},
        ],
        "filters": {"grade": {"ge": 5}},
        "orders": [["id", True]],
        "take": 1,
    }
    out = compile_json_query(spark, q, tables).collect()
    assert [(r["id"], r["grade"]) for r in out] == [(4, 6)]


def test_group_type_rollup(spark, tables):
    q = {
        "from": "friend",
        "columns": [
            {"name": "grade", "expr": "grade"},
            {"name": "has_age", "fn": "when",
             "args": [{"fn": "gt", "args": [{"expr": "age"}, {"lit": 0}]},
                      {"lit": 1}, {"lit": 0}]},
        ],
        "group_by": ["grade"],
        "group_type": "rollup",
        "aggs": [{"name": "n", "fn": "count"}],
    }
    from ubw_spark.core.jsonquery import compile_json_query

    rows = compile_json_query(spark, q, tables).collect()
    # 4 grade groups + 1 grand-total rollup row
    assert len(rows) == 5
    assert sum(1 for r in rows if r["grade"] is None) == 1
    total = [r["n"] for r in rows if r["grade"] is None][0]
    assert total == 4


def test_group_type_unknown_rejected(spark, tables):
    from ubw_spark.core.jsonquery import compile_json_query
    from ubw_spark.core.errors import SpecValidationError

    q = {"from": "friend", "columns": [{"name": "id", "expr": "id"}],
         "group_by": ["id"], "group_type": "fancy",
         "aggs": [{"name": "n", "fn": "count"}]}
    with pytest.raises(SpecValidationError, match="group_type"):
        compile_json_query(spark, q, tables)
