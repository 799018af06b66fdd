"""Property-based tests for the param layer (SURVEY §5c): random
order/filter/paging dicts never crash, unknown keys are no-ops, paging
partitions the sorted result."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ubw_spark import ColumnSpec, QueryParams, QuerySpec, apply_params

SPEC = QuerySpec(
    [
        ColumnSpec("id", orderable=True, filterable=True),
        ColumnSpec("name", order_target="nick"),
        ColumnSpec("nick", orderable=True, filterable=True, likeable=True),
        ColumnSpec("ageOpt", expr="age", filterable=True),
    ]
)

col_names = st.sampled_from(["id", "name", "nick", "ageOpt", "bogus", "", "grade"])
ops = st.sampled_from(["eq", "ne", "gt", "lt", "like", "in", "zzz", ""])
operands = st.one_of(
    st.integers(-5, 5000),
    st.text(max_size=5),
    st.lists(st.integers(0, 10), max_size=3),
)

orders_strategy = st.lists(
    st.one_of(col_names, st.tuples(col_names, st.booleans())), max_size=5
)
filters_strategy = st.dictionaries(
    col_names, st.dictionaries(ops, operands, max_size=3), max_size=3
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(orders=orders_strategy, filters=filters_strategy)
def test_random_params_never_crash(spark, friend_df, orders, filters):
    """RAW junk straight from a hypothetical JSON layer: wrong types,
    unknown ops/columns, lists where scalars belong.  The engine must
    silently drop what doesn't apply — never raise (the reference's
    out-of-range-filter contract, doc-01.md:148-152)."""
    df = apply_params(
        friend_df, SPEC, QueryParams(orders=orders, filters=filters)
    )
    rows = df.collect()
    assert len(rows) <= 4
    assert df.columns == ["id", "name", "nick", "ageOpt"]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(page_size=st.integers(1, 5))
def test_paging_partitions_sorted_result(spark, friend_df, page_size):
    """Union of all pages == full sorted result, no dupes, no gaps."""
    base = QueryParams(orders=[("id", False)])
    full = [
        r["id"]
        for r in apply_params(friend_df, SPEC, base).collect()
    ]
    paged = []
    page = 1
    while True:
        p = QueryParams(
            orders=[("id", False)], page_index=page, page_size=page_size
        )
        chunk = [r["id"] for r in apply_params(friend_df, SPEC, p).collect()]
        if not chunk:
            break
        paged.extend(chunk)
        page += 1
        if page > 10:
            break
    assert paged == full


def test_unknown_keys_are_exact_noops(spark, friend_df):
    """Adding unknown order/filter keys must not change the result."""
    clean = apply_params(
        friend_df, SPEC, QueryParams(orders=[("id", False)])
    ).collect()
    noisy = apply_params(
        friend_df,
        SPEC,
        QueryParams(
            orders=[("bogus", True), ("id", False), ("", False)],
            filters={"bogus": {"eq": 1}, "name": {"zzz": 2}},
        ),
    ).collect()
    assert clean == noisy
