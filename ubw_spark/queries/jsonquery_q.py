"""JSON-driven query — the reference's claim #7 exercised end-to-end:
one dict describes scan + join + derived columns + multi-dimensional
aggregation + filter + order + paging (doc-01.md:136-158)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ubw_spark.core.jsonquery import compile_json_query
from ubw_spark.queries.registry import register, table

QUERY_JSON = {
    "from": "lineitem",
    "joins": [
        {
            "table": "orders",
            "on": [["l_orderkey", "o_orderkey"]],
            "how": "inner",
        }
    ],
    "columns": [
        {"name": "status", "expr": "o_orderstatus"},
        {"name": "yr", "fn": "year", "args": [{"expr": "o_orderdate"}]},
        {
            "name": "rev",
            "fn": "mul",
            "args": [
                {"fn": "cast_decimal", "args": [{"expr": "l_extendedprice"}]},
                {
                    "fn": "sub",
                    "args": [
                        {"lit": 1},
                        {"fn": "cast_decimal", "args": [{"expr": "l_discount"}]},
                    ],
                },
            ],
        },
    ],
    "group_by": ["status", "yr"],
    "aggs": [
        {"name": "total_rev", "fn": "sum", "arg": "rev"},
        {"name": "n", "fn": "count"},
    ],
    "filters": {"yr": {"ge": 1996}},
    "orders": [["status", False], ["yr", False]],
    "take": 12,
}


@register(
    "json_driven_query",
    oracle="""
    SELECT * FROM (
      SELECT o_orderstatus AS status, year(o_orderdate) AS yr,
             sum(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS total_rev,
             count(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2) t
    WHERE yr >= 1996
    ORDER BY status ASC, yr ASC
    LIMIT 12
    """,
    tags=("engine", "json"),
)
def json_driven_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compile_json_query(
        spark, QUERY_JSON, lambda name: table(spark, sf_dir, name)
    )
