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


# ---------------------------------------------------------------- keyset


KEYSET_SPEC = QuerySpec(
    [
        ColumnSpec("age", orderable=True, default_desc=True),
        ColumnSpec("id", orderable=True),
        ColumnSpec("name"),
    ]
)
_ORDERS = [("age", True), ("id", False)]


def _page(df, after=None, take=2, **kw):
    return apply_params(
        df, KEYSET_SPEC,
        QueryParams(orders=_ORDERS, after_key=after, take=take, **kw),
    ).collect()


def test_keyset_pages_equal_offset_pages(spark, friend_df):
    """Walking the whole relation by keyset cursor reproduces the
    offset paging row-for-row — including across the NULL-age row
    (NULLS LAST): the boundary predicate must admit NULL keys after
    any value and order ties by the unique id tiebreak."""
    full = apply_params(
        friend_df, KEYSET_SPEC, QueryParams(orders=_ORDERS)
    ).collect()
    walked, after = [], None
    while True:
        page = _page(friend_df, after)
        if not page:
            break
        walked.extend(page)
        after = {"age": page[-1]["age"], "id": page[-1]["id"]}
    assert [tuple(r) for r in walked] == [tuple(r) for r in full]
    # a NULL boundary age: only deeper-tie rows may follow
    assert walked[-1]["age"] is None


def test_keyset_is_take_ordered_no_offset(spark, friend_df):
    """The page plan must be TakeOrderedAndProject with NO offset —
    the whole point of keyset paging is that page depth never enters
    the plan."""
    out = apply_params(
        friend_df, KEYSET_SPEC,
        QueryParams(orders=_ORDERS, after_key={"age": 30, "id": 2}, take=2),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "offset=" not in plan.lower().replace("offset= ", "offset=")


def test_keyset_rejects_partial_boundary_and_offset_mix(spark, friend_df):
    with pytest.raises(ValueError, match="exactly the effective sort"):
        _page(friend_df, {"age": 30})
    with pytest.raises(ValueError, match="mutually exclusive"):
        _page(friend_df, {"age": 30, "id": 2}, drop=2)
    with pytest.raises(ValueError, match="requires orders"):
        apply_params(
            friend_df, KEYSET_SPEC,
            QueryParams(after_key={"age": 30, "id": 2}, take=2),
        ).collect()


def test_keyset_all_null_boundary_is_terminal(spark, friend_df):
    """A boundary row whose keys are all NULL is the true end of a
    NULLS-LAST order (when the tiebreak is also exhausted): the next
    page must be empty, not an error."""
    one_null = friend_df.where(F.col("id") == 4).withColumn(
        "id", F.lit(None).cast("bigint")
    )
    assert _page(one_null, {"age": None, "id": None}) == []


def test_keyset_rejects_page1_and_drop0_too(spark, friend_df):
    """code-review r9: page_index=1 / drop=0 compute to a ZERO offset
    but still declare offset paging — they must raise with after_key,
    not silently serve page 1 and defer the error to page 2."""
    for kw in ({"page_index": 1, "page_size": 2}, {"drop": 0}):
        with pytest.raises(ValueError, match="mutually exclusive"):
            apply_params(
                friend_df, KEYSET_SPEC,
                QueryParams(orders=_ORDERS,
                            after_key={"age": 30, "id": 2}, take=2, **kw),
            ).collect()
