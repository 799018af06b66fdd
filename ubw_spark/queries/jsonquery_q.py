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
        # exact decimal sum, display-rounded once and cast — the money
        # convention that stays hash-identical cross-engine at ANY
        # magnitude (a raw decimal out of the harness round-trips
        # through float64 and loses the 3rd decimal at sf1 sums ~1.5e10)
        {"name": "total_rev", "fn": "sum", "arg": "rev",
         "post": ["round2", "cast_double"]},
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
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE)
               AS total_rev,
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


WINDOW_JSON = {
    "from": "orders",
    "columns": [
        {"name": "status", "expr": "o_orderstatus"},
        {"name": "okey", "expr": "o_orderkey"},
        {"name": "price", "fn": "cast_double", "args": [{"expr": "o_totalprice"}]},
    ],
    # declaration order matters: later windows may use earlier outputs
    "windows": [
        {
            "name": "rk",
            "fn": "rank",
            "partition_by": ["status"],
            "order_by": [["price", True], ["okey", False]],
        },
        {
            "name": "prev_price",
            "fn": "lag",
            "arg": "price",
            "offset": 1,
            "partition_by": ["status"],
            "order_by": [["price", True], ["okey", False]],
        },
        {
            "name": "cum_price",
            "fn": "sum",
            "arg": "price",
            "partition_by": ["status"],
            "order_by": [["price", True], ["okey", False]],
            "frame": {
                "type": "rows",
                "start": "unbounded_preceding",
                "end": "current",
            },
        },
    ],
    # filter on a window column = QUALIFY: top-3 per status
    "filters": {"rk": {"le": 3}},
    "orders": [["status", False], ["rk", False]],
}


@register(
    "json_driven_window",
    oracle="""
    SELECT * FROM (
      SELECT o_orderstatus AS status, o_orderkey AS okey,
             CAST(o_totalprice AS DOUBLE) AS price,
             rank() OVER w AS rk,
             lag(CAST(o_totalprice AS DOUBLE), 1) OVER w AS prev_price,
             sum(CAST(o_totalprice AS DOUBLE)) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_price
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) t
    WHERE rk <= 3
    ORDER BY status, rk
    """,
    tags=("engine", "json", "window"),
)
def json_driven_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSON DSL's window nodes (reference wishlist doc-01.md:136-158)
    exercised end-to-end: rank + lag + framed running sum per status,
    with a QUALIFY-style filter (top-3 per group) from the same dict.
    The order_by carries a full tiebreak (price, okey) so rank == a
    total order and the lag/cumulative values are deterministic on both
    engines."""
    return compile_json_query(
        spark, WINDOW_JSON, lambda name: table(spark, sf_dir, name)
    )


WRITE_JSON = {
    "verb": "upsert",
    "target": "orders_small",
    "keys": ["o_orderkey"],
    # one replacement of an existing key, one brand-new key; o_orderdate
    # intentionally absent → typed NULL via target-schema alignment
    "rows": [
        {"o_orderkey": 1, "o_custkey": 999, "o_orderstatus": "X",
         "o_totalprice": 123.45, "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 99999, "o_custkey": 1, "o_orderstatus": "N",
         "o_totalprice": 1.0, "o_orderpriority": "5-LOW"},
    ],
}


@register(
    "json_driven_upsert",
    oracle="""
    WITH t AS (SELECT * FROM orders WHERE o_orderkey < 50),
    u(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority) AS (
      VALUES (CAST(1 AS BIGINT), CAST(999 AS BIGINT), 'X',
              CAST(123.45 AS DOUBLE), '1-URGENT'),
             (CAST(99999 AS BIGINT), CAST(1 AS BIGINT), 'N',
              CAST(1.0 AS DOUBLE), '5-LOW')),
    m AS (
      SELECT * FROM t
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             NULL AS o_orderdate, o_orderpriority
      FROM u)
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 2) AS total,
           strftime(o_orderdate, '%Y-%m-%d') AS odate,
           o_orderpriority
    FROM m
    """,
    tags=("engine", "json", "write"),
)
def json_driven_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write half of pain-point #7 (doc-01.md:156, reference
    SlickCRUDImplicits import in Sample05.scala:15): a JSON upsert spec
    compiled to the anti-join+union MERGE shape.  The merged frame is
    returned (the driver-checkable part); persisting it is
    sources.writers.write_table."""
    from pyspark.sql import functions as F

    from ubw_spark.core.jsonquery import compile_json_write

    reg = {"orders_small": table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 50
    )}
    _verb, merged = compile_json_write(spark, WRITE_JSON, lambda n: reg[n])
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        "o_orderpriority",
    )


SETOP_JSON = {
    # nested set ops: (customer nations UNION supplier nations)
    # EXCEPT nation keys >= 20 — a branch can itself be a setop spec
    "setop": {
        "op": "except",
        "queries": [
            {
                "setop": {
                    "op": "union",
                    "queries": [
                        {
                            "from": "customer",
                            "columns": [{"name": "nk", "expr": "c_nationkey"}],
                        },
                        {
                            "from": "supplier",
                            "columns": [{"name": "nk", "expr": "s_nationkey"}],
                        },
                    ],
                }
            },
            {
                "from": "nation",
                "columns": [{"name": "nk", "expr": "n_nationkey"}],
                "filters": {"nk": {"ge": 20}},
            },
        ],
    },
    "orders": [["nk", False]],
}


@register(
    "json_driven_setop",
    oracle="""
    SELECT nk FROM (
      (SELECT c_nationkey AS nk FROM customer
       UNION
       SELECT s_nationkey FROM supplier)
      EXCEPT
      SELECT n_nationkey FROM nation WHERE n_nationkey >= 20)
    ORDER BY nk
    """,
    tags=("engine", "json", "setop"),
)
def json_driven_setop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation verbs in the JSON DSL (reference wishlist
    doc-01.md:136-158): nested union/except over three table scans,
    ANSI distinct semantics, branches aligned by column name.  All
    branches stay declarative, so Catalyst still prunes each scan to
    the single projected key column."""
    return compile_json_query(
        spark, SETOP_JSON, lambda name: table(spark, sf_dir, name)
    )


PAGING_JSON = {
    "from": "orders",
    # NOTE: effective sort runs in COLUMN DECLARATION order (the L1
    # reference-parity rule, doc-02.md:130) — price is declared first so
    # the page is price DESC, okey ASC
    "columns": [
        {"name": "price", "fn": "cast_double", "args": [{"expr": "o_totalprice"}]},
        {"name": "okey", "expr": "o_orderkey"},
    ],
    "orders": [["price", True], ["okey", False]],
    "page_index": 3,  # 1-based → rows 41..60
    "page_size": 20,
}


@register(
    "json_driven_paging",
    oracle="""
    SELECT o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    ORDER BY price DESC, okey
    LIMIT 20 OFFSET 40
    """,
    tags=("engine", "json", "paging"),
)
def json_driven_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-based page_index/page_size paging from the JSON dict (the
    reference's paging strategy, doc-02.md:135), compiled through the
    same L3 offset/limit path as programmatic QueryParams.  The full
    (price, okey) tiebreak makes the page deterministic on both
    engines."""
    return compile_json_query(
        spark, PAGING_JSON, lambda name: table(spark, sf_dir, name)
    )
