"""Incremental aggregate maintenance (operators/incremental.py)."""

import pytest
from pyspark.sql import functions as F

from ubw_spark.operators.incremental import (
    apply_delta_to_agg,
    grouped_agg,
    row_delta,
)

def MEASURES():
    return {
        "cnt": F.lit(1).cast("long"),
        "total": F.coalesce(F.col("v"), F.lit(0)).cast("long"),
    }


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, g string, v int")


def _maintain(spark, old_rows, new_rows):
    old, new = _df(spark, old_rows), _df(spark, new_rows)
    state = grouped_agg(old, ["g"], MEASURES())
    delta = row_delta(old, new, ["id"], ["g", "v"])
    got = apply_delta_to_agg(
        state, delta, ["g"], MEASURES(), count_col="cnt"
    )
    want = grouped_agg(new, ["g"], MEASURES())
    return (
        sorted(map(tuple, got.collect()), key=repr),
        sorted(map(tuple, want.collect()), key=repr),
        delta,
    )


def test_insert_delete_change_migration_extinction(spark):
    old = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)]
    new = [
        (2, "a", 25),   # changed in place
        (3, "a", 30),   # migrated b -> a
        (5, "d", 50),   # inserted (new group)
        # 1 deleted (group a survives), 4 deleted (group c goes extinct)
    ]
    got, want, delta = _maintain(spark, old, new)
    assert got == want
    assert not any(r[0] == "c" for r in got)  # extinct group dropped
    ops = {
        (r["id"], r["g"], r["op"]) for r in delta.collect()
    }
    assert ops == {
        (1, "a", -1), (4, "c", -1),
        (2, "a", -1), (2, "a", 1),   # change = delete + insert
        (3, "b", -1), (3, "a", 1),   # migration carries both groups
        (5, "d", 1),
    }


def test_unchanged_rows_produce_no_delta(spark):
    rows = [(1, "a", 10), (2, "b", None)]
    got, want, delta = _maintain(spark, rows, rows)
    assert delta.count() == 0
    assert got == want


def test_null_values_count_but_do_not_sum(spark):
    old = [(1, "a", None)]
    new = [(1, "a", None), (2, "a", 7)]
    got, want, _ = _maintain(spark, old, new)
    assert got == want == [("a", 2, 7)]


def test_all_null_group_sum_stays_null(spark):
    """code-review r11: SUM is NULL iff every input is NULL — the
    maintained fold must preserve that, not coalesce it to 0, or
    maintained != recomputed for all-NULL groups.  Uses a raw
    (uncoalesced) measure: the shared MEASURES maps NULL v to 0."""
    meas = {
        "cnt": F.lit(1).cast("long"),
        "vsum": F.col("v").cast("long"),
    }
    old = _df(spark, [(1, "a", None), (2, "a", None), (10, "b", 3)])
    new = _df(
        spark, [(1, "a", None), (2, "a", None), (3, "a", None), (10, "b", 4)]
    )
    state = grouped_agg(old, ["g"], meas)
    delta = row_delta(old, new, ["id"], ["g", "v"])
    got = sorted(
        map(tuple, apply_delta_to_agg(
            state, delta, ["g"], meas, count_col="cnt"
        ).collect()),
        key=repr,
    )
    want = sorted(map(tuple, grouped_agg(new, ["g"], meas).collect()), key=repr)
    assert got == want
    by_g = {t[0]: t for t in got}
    assert by_g["a"][2] is None  # really NULL on both paths, not 0
    assert by_g["b"][2] == 4


def test_validation(spark):
    df = _df(spark, [(1, "a", 1)])
    with pytest.raises(ValueError, match="at least one value column"):
        row_delta(df, df, ["id"], [])
    with pytest.raises(ValueError, match="at least one measure"):
        apply_delta_to_agg(df, df, ["g"], {})


def test_empty_state_bootstraps_from_delta(spark):
    old = _df(spark, [])
    new = _df(spark, [(1, "a", 10), (2, "b", 20)])
    state = grouped_agg(old, ["g"], MEASURES())
    delta = row_delta(old, new, ["id"], ["g", "v"])
    got = apply_delta_to_agg(
        state, delta, ["g"], MEASURES(), count_col="cnt"
    )
    assert sorted(map(tuple, got.collect())) == [("a", 1, 10), ("b", 1, 20)]


def _join_maintained(spark, old_a, new_a, old_b, new_b):
    from ubw_spark.operators.incremental import join_delta

    oa = spark.createDataFrame(old_a, "ka int, fk int, v int")
    na = spark.createDataFrame(new_a, "ka int, fk int, v int")
    ob = spark.createDataFrame(old_b, "kb int, g string")
    nb = spark.createDataFrame(new_b, "kb int, g string")
    measures = {
        "cnt": F.lit(1).cast("long"),
        "total": F.col("v").cast("long"),
    }
    state = grouped_agg(
        oa.join(ob, oa["fk"] == ob["kb"]), ["g"], measures
    )
    da = row_delta(oa, na, ["ka"], ["fk", "v"])
    db = row_delta(ob, nb, ["kb"], ["g"])
    jd = join_delta(
        oa.drop("ka"), da.drop("ka"), ob, db, on=[("fk", "kb")]
    )
    got = apply_delta_to_agg(state, jd, ["g"], measures, count_col="cnt")
    want = grouped_agg(
        na.join(nb, na["fk"] == nb["kb"]), ["g"], measures
    )
    return (
        sorted(map(tuple, got.collect())),
        sorted(map(tuple, want.collect())),
    )


def test_join_delta_bilinear_identity(spark):
    old_a = [(1, 10, 5), (2, 10, 7), (3, 20, 9)]
    old_b = [(10, "x"), (20, "y"), (30, "z")]
    new_a = [
        (1, 10, 5),    # unchanged
        (2, 30, 7),    # fk migrated 10 -> 30 (cross term with changed b?)
        (4, 30, 11),   # inserted, joins a row whose group CHANGED (dAxdB)
        # 3 deleted
    ]
    new_b = [(10, "x"), (20, "y2"), (30, "z2")]  # 20, 30 re-grouped
    got, want = _join_maintained(spark, old_a, new_a, old_b, new_b)
    assert got == want


def test_join_delta_no_churn_is_empty(spark):
    from ubw_spark.operators.incremental import join_delta

    a = spark.createDataFrame([(1, 10, 5)], "ka int, fk int, v int")
    b = spark.createDataFrame([(10, "x")], "kb int, g string")
    da = row_delta(a, a, ["ka"], ["fk", "v"])
    db = row_delta(b, b, ["kb"], ["g"])
    jd = join_delta(a.drop("ka"), da.drop("ka"), b, db, [("fk", "kb")])
    assert jd.count() == 0


def test_join_delta_guards(spark):
    from ubw_spark.operators.incremental import join_delta

    a = spark.createDataFrame([(1, 5)], "k int, v int")
    b = spark.createDataFrame([(1, 5)], "k int, v int")
    with pytest.raises(ValueError, match="must be disjoint"):
        join_delta(a, a.withColumn("op", F.lit(1)), b,
                   b.withColumn("op", F.lit(1)), [("k", "k")])
    c = spark.createDataFrame([(1, "x")], "kb int, g string")
    with pytest.raises(ValueError, match="delta_a has no `op`"):
        join_delta(a, a, c, c.withColumn("op", F.lit(1)), [("k", "kb")])


def test_null_keys_and_null_groups_are_single_rows(spark):
    # NULL row key: unchanged row must NOT appear in the delta; NULL
    # group: state and delta merge into ONE row (null-safe group join)
    old = [(None, None, 10), (1, None, 5), (2, "a", 1)]
    new = [(None, None, 10), (1, None, 7), (2, "a", 1), (3, None, 2)]
    got, want, delta = _maintain(spark, old, new)
    assert got == want
    assert len([g for g, *_ in got if g is None]) == 1
    # the NULL-keyed unchanged row produced no delta rows
    assert not [r for r in delta.collect() if r["id"] is None]


def test_null_position_swap_is_detected(spark):
    # concat_ws would fingerprint (NULL,'x') == ('x',NULL); the JSON
    # fingerprint must not
    old = spark.createDataFrame(
        [(1, None, "x")], "id int, a string, b string"
    )
    new = spark.createDataFrame(
        [(1, "x", None)], "id int, a string, b string"
    )
    delta = row_delta(old, new, ["id"], ["a", "b"])
    assert {
        (r["a"], r["b"], r["op"]) for r in delta.collect()
    } == {(None, "x", -1), ("x", None, 1)}


def test_zero_sum_group_survives_with_count_measure(spark):
    # values netting to zero is NOT extinction when the count says the
    # group still has rows
    old = [(1, "a", 5)]
    new = [(1, "a", 5), (2, "a", -5)]
    got, want, _ = _maintain(spark, old, new)
    assert got == want == [("a", 2, 0)]


def test_no_count_col_keeps_zeroed_groups(spark):
    old = _df(spark, [(1, "a", 5)])
    new = _df(spark, [])
    state = grouped_agg(old, ["g"], {"total": F.col("v").cast("long")})
    delta = row_delta(old, new, ["id"], ["g", "v"])
    got = apply_delta_to_agg(
        state, delta, ["g"], {"total": F.col("v").cast("long")}
    )
    # without a declared count measure, extinction is not inferred
    assert sorted(map(tuple, got.collect())) == [("a", 0)]
    with pytest.raises(ValueError, match="not a measure"):
        apply_delta_to_agg(
            state, delta, ["g"],
            {"total": F.col("v").cast("long")}, count_col="cnt",
        )
