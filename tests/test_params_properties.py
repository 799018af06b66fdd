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


# ------------------------------------------------- keyset × redirect fuzz
#
# The param layer's trickiest interaction (VERDICT r10 #6): after_key +
# orderTarget redirect + hidden sort keys + NULL boundaries.  SPY and
# HIDDEN share declarations except rank's visibility, so SPY pages can
# supply boundary values that HIDDEN's caller could never read off a page.

_FUZZ_SCHEMA = "age bigint, label string, rank bigint, id bigint, name string"
_FUZZ_ROWS = [
    (30, "a", 5, 1, "n1"),
    (30, "b", None, 2, "n2"),
    (None, "c", 2, 3, "n3"),
    (12, "d", 2, 4, "n4"),
    (12, "e", 7, 5, "n5"),
    (None, "f", None, 6, "n6"),
    (44, "g", 5, 7, "n7"),
    (44, "h", 5, 8, "n8"),
    (30, "i", 5, 9, "n9"),
]


def _fuzz_specs():
    cols = lambda vis: [  # noqa: E731
        ColumnSpec("age", orderable=True, filterable=True),
        ColumnSpec("label", order_target="rank"),
        ColumnSpec("rank", orderable=True, visible=vis),
        ColumnSpec("id", orderable=True),
        ColumnSpec("name"),
    ]
    return QuerySpec(cols(True)), QuerySpec(cols(False))


_fuzz_keys = st.sampled_from(["age", "label", "rank", "id", "name", "bogus"])
_fuzz_orders = st.lists(
    st.tuples(_fuzz_keys, st.booleans()), min_size=0, max_size=4
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(orders=_fuzz_orders, take=st.integers(1, 4))
def test_keyset_fuzz_pages_partition_redirected_order(spark, orders, take):
    """For ANY random order request (redirects, hidden keys, unknown and
    non-orderable names, NULL-heavy sort values), walking the keyset
    cursor reproduces the unpaged result exactly — no dup, no gap, no
    crash — and the hidden-rank variant returns the same rows minus the
    hidden column (hidden sort keys stay live)."""
    from ubw_spark.params import _effective_order_keys

    spy_spec, hidden_spec = _fuzz_specs()
    df = spark.createDataFrame(_FUZZ_ROWS, _FUZZ_SCHEMA)
    orders = list(orders) + [("id", False)]  # unique tiebreak => total order
    eff = [s.name for s, _ in _effective_order_keys(spy_spec, tuple(orders))]

    full = apply_params(df, spy_spec, QueryParams(orders=orders)).collect()
    walked, after = [], None
    for _ in range(len(_FUZZ_ROWS) + 2):
        page = apply_params(
            df, spy_spec,
            QueryParams(orders=orders, after_key=after, take=take),
        ).collect()
        if not page:
            break
        walked.extend(page)
        after = {n: page[-1][n] for n in eff}
    assert [tuple(r) for r in walked] == [tuple(r) for r in full]

    hidden_full = apply_params(
        df, hidden_spec, QueryParams(orders=orders)
    ).collect()
    vis = [c.name for c in hidden_spec.visible_columns()]
    assert [tuple(r) for r in hidden_full] == [
        tuple(r[n] for n in vis) for r in full
    ]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    boundary=st.dictionaries(
        _fuzz_keys,
        st.one_of(st.none(), st.integers(-5, 50), st.text(max_size=3)),
        max_size=3,
    ),
    take=st.integers(1, 3),
)
def test_keyset_fuzz_junk_boundary_valueerror_or_valid_page(
    spark, boundary, take
):
    """A random after_key dict either raises the documented ValueError
    (wrong names, un-coercible values) or returns a well-formed page —
    never an AnalysisException or an ANSI cast failure mid-job."""
    spy_spec, _ = _fuzz_specs()
    df = spark.createDataFrame(_FUZZ_ROWS, _FUZZ_SCHEMA)
    try:
        rows = apply_params(
            df, spy_spec,
            QueryParams(
                orders=[("age", True), ("id", False)],
                after_key=boundary, take=take,
            ),
        ).collect()
    except ValueError:
        return  # the documented loud contract
    assert len(rows) <= take


def test_keyset_boundary_values_coerce_like_filters(spark):
    """JSON-layer boundary values: a numeric string coerces, junk text
    raises the loud ValueError (not an opaque ANSI cast error)."""
    spy_spec, _ = _fuzz_specs()
    df = spark.createDataFrame(_FUZZ_ROWS, _FUZZ_SCHEMA)
    base = dict(orders=[("age", False), ("id", False)], take=3)
    want = apply_params(
        df, spy_spec, QueryParams(after_key={"age": 30, "id": 2}, **base)
    ).collect()
    got = apply_params(
        df, spy_spec,
        QueryParams(after_key={"age": "30", "id": "2"}, **base),
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    with pytest.raises(ValueError, match="not coercible"):
        apply_params(
            df, spy_spec,
            QueryParams(after_key={"age": "zz", "id": 2}, **base),
        ).collect()


def test_boundary_coercion_temporal_and_decimal_exactness():
    """code-review r11: the boundary coercer's two remaining holes —
    (a) date/timestamp STRING boundaries must PARSE, not pass on
    any-non-empty-string (a junk cursor becomes col > lit('zz'): an
    ANSI CAST_INVALID_INPUT mid-job, or with ANSI off a silently empty
    page forever); (b) decimal string cursors must not round through
    float() — above 2^53 that pages from the wrong row."""
    import datetime
    import decimal

    from ubw_spark.params import _coerce_boundary

    ok, v = _coerce_boundary("date", "zz")
    assert not ok
    ok, v = _coerce_boundary("date", "2024-02-03")
    assert ok and v == datetime.date(2024, 2, 3)
    ok, v = _coerce_boundary("timestamp", "2024-02-03T01:02:03")
    assert ok and v == datetime.datetime(2024, 2, 3, 1, 2, 3)
    ok, v = _coerce_boundary("timestamp", "not a time")
    assert not ok
    # native Row types still pass through untouched
    ok, v = _coerce_boundary("date", datetime.date(2020, 1, 1))
    assert ok and v == datetime.date(2020, 1, 1)
    # decimal string: exact, no float round-trip (2^53 + 1 survives)
    big = "9007199254740993"
    ok, v = _coerce_boundary("decimal(20,0)", big)
    assert ok and isinstance(v, decimal.Decimal) and int(v) == int(big)
    assert float(big) != int(big)  # the hazard the branch exists for
    ok, v = _coerce_boundary("decimal(20,2)", "12.34")
    assert ok and v == decimal.Decimal("12.34")


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
