from ubw_spark.plans.inspect import (
    formatted_plan,
    simple_plan,
    pushed_filters,
    read_schema_columns,
    has_broadcast_join,
    broadcast_join_count,
    sortmerge_or_shuffledhash_count,
    has_take_ordered,
    shuffle_count,
    hof_filter_violations,
    assert_plan,
)

__all__ = [
    "formatted_plan",
    "simple_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "broadcast_join_count",
    "sortmerge_or_shuffledhash_count",
    "has_take_ordered",
    "shuffle_count",
    "hof_filter_violations",
    "assert_plan",
]
