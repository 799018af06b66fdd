"""Queries exercising the ubw engine layer itself (SURVEY §2.1/2.2/2.6):
spec projection+rename, dynamic filters, dynamic ordering with redirects,
paging, schema-on-read dynamic tables, derived when-chains, defaults.

These prove the param compiler produces exactly the SQL the reference
would have generated — the oracle IS that SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.core.spec import ColumnSpec, QuerySpec
from ubw_spark.functions import derive, when_present
from ubw_spark.params import QueryParams, apply_params
from ubw_spark.queries.registry import register, table
from ubw_spark.sources.readers import dynamic_table


@register(
    "engine_param_query",
    oracle="""
    SELECT c_custkey AS key, c_name AS name, round(c_acctbal, 2) AS balance
    FROM customer
    WHERE c_mktsegment LIKE '%BUILD%' AND c_acctbal > 1000.0
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 50 OFFSET 10
    """,
    tags=("engine",),
)
def engine_param_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Sample05/09 path on TPC-H data: rename + hidden filter
    column + dynamic orders (one bogus key silently dropped) + paging."""
    # raw_balance is declared BEFORE key: effective ORDER BY keys are
    # emitted in declaration order (FIXTURES.md G3), so the plan sorts
    # by balance desc, then custkey asc — matching the oracle.
    spec = QuerySpec(
        [
            ColumnSpec(
                "raw_balance", expr="c_acctbal", orderable=True, visible=False,
                filterable=True,
            ),
            ColumnSpec("key", expr="c_custkey", orderable=True, default_desc=False),
            ColumnSpec("name", expr="c_name"),
            ColumnSpec(
                "balance",
                expr=F.round("c_acctbal", 2),
                orderable=True,
                filterable=True,
            ),
            ColumnSpec(
                "segment",
                expr="c_mktsegment",
                filterable=True,
                likeable=True,
                visible=False,
            ),
        ]
    )
    params = QueryParams(
        orders=[("raw_balance", True), ("key", False), ("no_such_col", True)],
        filters={
            "segment": {"like": "%BUILD%"},
            "raw_balance": {"gt": 1000.0},
            "unknown_col": {"eq": 1},  # silently ignored
        },
        drop=10,
        take=50,
    )
    return apply_params(table(spark, sf_dir, "customer"), spec, params)


@register(
    "engine_dynamic_table",
    oracle="""
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
           CAST(s_name AS VARCHAR)   AS s_name,
           CAST(trunc(s_acctbal) AS INTEGER) AS bal_int
    FROM supplier
    """,
    tags=("engine", "source"),
)
def engine_dynamic_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 schema-on-read: columns conjured from runtime (name, type)
    strings (Models.scala:26-36, doc-03.md:71-84)."""
    sup = table(spark, sf_dir, "supplier")
    dyn = dynamic_table(
        sup, [("s_suppkey", "bigint"), ("s_name", "string"), ("s_acctbal", "int")]
    )
    return dyn.withColumnRenamed("s_acctbal", "bal_int")


@register(
    "engine_derived_when",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_class,
           CASE WHEN p_retailprice IS NOT NULL AND p_retailprice > 1500.0
                THEN concat(p_brand, '-premium') ELSE p_brand END AS brand_tier
    FROM part
    """,
    tags=("engine", "derive"),
)
def engine_derived_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 poly.transform as a native when-chain (PileHelper.scala:117-179
    semantics: ordered cases, guard conditions, fallback)."""
    p = table(spark, sf_dir, "part")
    size_class = derive(
        [
            (F.col("p_size") < 10, "small"),
            (F.col("p_size") < 30, "medium"),
        ],
        otherwise="large",
    )
    brand_tier = derive(
        [
            (
                when_present("p_retailprice") & (F.col("p_retailprice") > 1500.0),
                F.concat(F.col("p_brand"), F.lit("-premium")),
            )
        ],
        otherwise=F.col("p_brand"),
    )
    return p.select(
        "p_partkey",
        size_class.alias("size_class"),
        brand_tier.alias("brand_tier"),
    )


@register(
    "engine_default_value",
    oracle="""
    SELECT event_id,
           coalesce(CASE WHEN value < 0.5 THEN NULL ELSE value END, -1.0) AS value_or_default
    FROM events WHERE event_id <= 3000
    """,
    tags=("engine",),
)
def engine_default_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 DefaultValue atomic → coalesce with the declared default.
    (The nullable expression is synthesized since testdata has no NULL
    column; semantics are the point.)"""
    ev = table(spark, sf_dir, "events").where(F.col("event_id") <= 3000)
    nullable_value = F.when(F.col("value") >= 0.5, F.col("value"))
    spec = QuerySpec(
        [
            ColumnSpec("event_id"),
            ColumnSpec("value_or_default", expr=nullable_value, default=-1.0),
        ]
    )
    return apply_params(ev, spec, QueryParams())


@register(
    "engine_projection_pruning",
    oracle="""
    SELECT n_name AS nation FROM nation ORDER BY n_nationkey LIMIT 10
    """,
    tags=("engine",),
)
def engine_projection_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4: hidden sort key (n_nationkey invisible but orders the
    output) + list-driven projection."""
    spec = QuerySpec(
        [
            ColumnSpec("hidden_key", expr="n_nationkey", orderable=True, visible=False),
            ColumnSpec("nation", expr="n_name"),
            ColumnSpec("regionkey", expr="n_regionkey"),
        ]
    )
    params = QueryParams(
        orders=[("hidden_key", False)], take=10, select=["hidden_key", "nation"]
    )
    return apply_params(table(spark, sf_dir, "nation"), spec, params)


@register(
    "engine_keyset_paging",
    oracle="""
    SELECT o_orderkey AS okey, o_totalprice AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 60
    """,
    tags=("engine", "paging"),
)
def engine_keyset_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 at scale: page 4 fetched by KEYSET (after_key = the boundary
    row that ends page 3) must equal the OFFSET 60 page row-for-row —
    the oracle IS the offset form.  OFFSET n sorts and discards n rows
    on every page (cost grows with depth); the keyset predicate is a
    sargable filter, so every page stays at TakeOrderedAndProject cost
    (plan-asserted in tests/test_params.py).  The key set ends in the
    unique o_orderkey tiebreak — the contract that makes the two
    pagings row-identical."""
    spec = QuerySpec(
        [
            ColumnSpec(
                "price", expr="o_totalprice", orderable=True,
                default_desc=True,
            ),
            ColumnSpec("okey", expr="o_orderkey", orderable=True),
        ]
    )
    orders_df = table(spark, sf_dir, "orders")
    # The previous page's last row — in a service this arrives FROM the
    # client as the page cursor; here it is fetched once (1 bounded row)
    boundary = apply_params(
        orders_df,
        spec,
        QueryParams(
            orders=[("price", True), ("okey", False)], drop=59, take=1
        ),
    ).collect()[0]
    page4 = QueryParams(
        orders=[("price", True), ("okey", False)],
        after_key={"price": boundary["price"], "okey": boundary["okey"]},
        take=20,
    )
    out = apply_params(orders_df, spec, page4)
    return out.select("okey", "price")
