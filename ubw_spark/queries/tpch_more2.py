"""TPC-H Q13/Q18/Q19/Q22 analogs: outer-join histograms, HAVING over
grouped joins, disjunctive predicate pushdown, correlated/decorrelated
subqueries — plus grouped-map and ntile coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ubw_spark.queries.registry import register, table


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) GROUP BY c_count
    """,
    tags=("join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: two-level aggregation over a filtered left join (the order
    count histogram).  The join predicate lives in the ON clause —
    filtering before the join would drop zero-order customers."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150)
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(total_qty, 2) AS total_qty
    FROM (SELECT o_custkey AS c_custkey, o_orderkey, o_orderdate, o_totalprice,
                 (SELECT sum(l_quantity) FROM lineitem WHERE l_orderkey = o_orderkey)
                   AS total_qty
          FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM big))
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: HAVING-filtered aggregate as a semi-join source, then the
    aggregate value re-attached — aggregate once, reuse for both the
    filter and the output (no second scan of lineitem)."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                          * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'PROMO' AND l_quantity >= 40)
    """,
    tags=("join", "agg"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs across both join sides.  Catalyst extracts
    the common l_quantity/p_* conjuncts it can push per side; the
    residual disjunction evaluates post-join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 40))
    )
    return (
        li.join(broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,4)")
                    * (1 - F.col("l_discount").cast("decimal(12,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    tags=("join", "agg"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar subquery (global average) + anti join (no
    urgent orders — every customer here has SOME order, so the classic
    never-ordered predicate is vacuous).  The scalar aggregate
    broadcasts as a one-row cross join — no driver-side collect of the
    threshold."""
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        cust.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "grouped_map_zscore",
    oracle="""
    SELECT c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4)
             AS bal_zscore
    FROM customer WHERE c_custkey < 400
    """,
    tags=("udf",),
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map (U-surface): per-segment z-score
    normalization in pandas — deterministic, so even the Python-side
    path is oracle-checked against the SQL window formulation.

    (The window formulation is what production would use; this query
    exists to pin the grouped-map batch contract: one group = one pandas
    DataFrame in, same-length frame out.)"""
    import pandas as pd

    cust = table(spark, sf_dir, "customer").where(F.col("c_custkey") < 400)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["c_acctbal"].mean()
        s = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "bal_zscore": ((pdf["c_acctbal"] - m) / s).round(4),
            }
        )

    return cust.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey bigint, bal_zscore double"
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT quartile, count(*) AS n,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM (SELECT o_totalprice,
                 ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
          FROM orders)
    GROUP BY quartile
    """,
    tags=("window", "agg"),
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartile bucketing (unique tiebreak keeps bucket edges
    deterministic).  NOT a global ORDER window: that plan funnels the
    whole table through one task.  Uses operators/ranking.py's two-phase
    distributed rank (value-bucket ledger + per-bucket row_number) and
    derives the quartile arithmetically — identical ANSI ntile output,
    every window partitioned or over the tiny ledger."""
    from ubw_spark.operators.ranking import distributed_ntile

    o = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    tiled = distributed_ntile(
        o, 4, "o_totalprice", "o_orderkey", tile_name="quartile"
    )
    return (
        tiled.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )
