"""Third TPC-H batch: Q8/Q15/Q17 analogs — the shapes the synthetic
star schema can express without partsupp (Q2/Q9/Q11/Q16/Q20 need
ps_supplycost/ps_availqty; Q21 needs receipt/commit dates — documented
out of scope in COVERAGE.md).

Same discipline as relational.py/tpch_more.py: DECIMAL money sums cast
to DOUBLE only after rounding, ratios divided in float64 on both
engines, broadcast dims, deterministic tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ubw_spark.queries.registry import register, table


def _dec(c: str):
    return F.col(c).cast("decimal(12,4)")


@register(
    "q8_national_market_share",
    oracle="""
    WITH flat AS (
      SELECT year(o_orderdate) AS yr,
             CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(12,4))) AS vol,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT yr,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol END)
                      AS DOUBLE)
                 / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
    FROM flat GROUP BY yr
    """,
    tags=("join", "agg", "tpch"),
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: 7-table star with nation joined TWICE (customer side
    filters the market, supplier side attributes the share).  All dims
    broadcast; the ratio divides exact decimal sums in float64 so both
    engines agree bit-for-bit."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")

    cust_asia = cust.join(
        broadcast(
            nat.join(
                broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
            ).select("n_nationkey")
        ),
        cust["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nat = supp.join(
        broadcast(nat.select("n_nationkey", "n_name")),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    flat = (
        li.join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(cust_asia), orders["o_custkey"] == F.col("c_custkey"))
        .join(broadcast(supp_nat), li["l_suppkey"] == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("yr"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("vol")))
    return flat.groupBy("yr").agg(
        F.round(
            num.cast("double") / F.sum("vol").cast("double"), 6
        ).alias("mkt_share")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                            * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2)
                  AS DOUBLE) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    tags=("join", "agg", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: aggregate once, reuse for both the ranking and the
    max — the scalar max rides back as a broadcast 1-row join, not a
    second scan of lineitem."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
        .cast("double")
        .alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(broadcast(mx), rev["total_rev"] == F.col("__mx"))
        .join(broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qlim
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)))
                           AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'ECONOMY'
      AND l_quantity < qlim
    """,
    tags=("join", "agg", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (container → brand+type, the synthetic schema's
    columns): correlated avg-quantity subquery decorrelated into a
    per-part aggregate joined back.  Quantities are small integers, so
    avg is sum/count of exact doubles — identical in both engines, and
    the strict < comparison is deterministic."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    avgq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qlim")
    )
    return (
        li.join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(avgq, li["l_partkey"] == avgq["pk"])
        .where(F.col("l_quantity") < F.col("qlim"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )
