"""Profiling queries (operators/stats.py::profile_table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ubw_spark.operators.stats import profile_table
from ubw_spark.queries.registry import register, table

_PART_COLS = [
    ("p_partkey", "num"),
    ("p_name", "str"),
    ("p_brand", "str"),
    ("p_type", "str"),
    ("p_size", "num"),
    ("p_retailprice", "num"),
]


def _profile_row_sql(c: str, kind: str) -> str:
    if kind == "num":
        mn, mx = f"min({c})::DOUBLE", f"max({c})::DOUBLE"
        ms, xs = "NULL::VARCHAR", "NULL::VARCHAR"
    else:
        mn, mx = "NULL::DOUBLE", "NULL::DOUBLE"
        ms, xs = f"min({c})", f"max({c})"
    return f"""
    SELECT '{c}' AS col_name, count(*)::BIGINT AS n,
           (count(*) - count({c}))::BIGINT AS n_null,
           count(DISTINCT {c})::BIGINT AS n_distinct,
           {mn} AS min_num, {mx} AS max_num,
           {ms} AS min_str, {xs} AS max_str
    FROM part"""


@register(
    "profile_table_columns",
    oracle=" UNION ALL ".join(
        _profile_row_sql(c, k) for c, k in _PART_COLS
    ),
    tags=("stats", "engine"),
)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the part table: one aggregate
    pass computing count / nulls / exact distinct / min / max per
    column, unpivoted to one row per column with no driver loop.
    Numerics surface as DOUBLE (value compare, no engine-specific
    number formatting); strings compare under binary collation on both
    engines.  Scale: exact multi-column distinct plans an Expand (k×
    map-side rows) — the ``approx_distinct=True`` path (HLL++, one
    combiner per column) is the 100 TB default and is pinned against
    the exact path in the unit tests."""
    return profile_table(
        table(spark, sf_dir, "part"), [c for c, _ in _PART_COLS]
    )
