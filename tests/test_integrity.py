"""FK/PK integrity audits (operators/integrity.py)."""

import pytest

from ubw_spark.operators.integrity import fk_audit, pk_audit


@pytest.fixture(scope="module")
def tables(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)],
        "id long, fk long",
    )
    # parent has a duplicate key (corrupt) — the audit must not let it
    # double-count child rows
    parent = spark.createDataFrame(
        [(10, "a"), (20, "b"), (20, "b2"), (30, "c")], "pk long, v string"
    )
    return child, parent


@pytest.mark.parametrize("bc", [True, False])
def test_fk_audit_counts(spark, tables, bc):
    child, parent = tables
    r = fk_audit(
        child, "fk", parent, "pk", "child.fk->parent", broadcast_parent=bc
    ).collect()
    assert len(r) == 1
    r = r[0]
    assert r["edge"] == "child.fk->parent"
    assert r["child_rows"] == 5          # dup parent key must not inflate
    assert r["null_fk"] == 1             # fk=None
    assert r["orphans"] == 1             # fk=99
    assert r["parents_referenced"] == 3  # {10, 20, 99}


def test_fk_audit_shuffled_path_plans_no_broadcast(spark, tables):
    child, parent = tables
    plan = fk_audit(
        child, "fk", parent, "pk", "e", broadcast_parent=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan


def test_pk_audit(spark, tables):
    _, parent = tables
    r = pk_audit(parent, "pk", "parent").collect()[0]
    assert (r["tbl"], r["rows"], r["null_pk"], r["distinct_pk"], r["dup_rows"]) == (
        "parent", 4, 0, 3, 1
    )


def test_pk_audit_null_keys_not_counted_as_dups(spark):
    df = spark.createDataFrame(
        [(None,), (None,), (7,)], "pk long"
    )
    r = pk_audit(df, "pk", "t").collect()[0]
    assert (r["rows"], r["null_pk"], r["distinct_pk"], r["dup_rows"]) == (
        3, 2, 1, 0
    )
