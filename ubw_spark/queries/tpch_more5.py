"""Fifth TPC-H batch: Q9/Q11/Q16 analogs — the last three classic
shapes absent from the vocabulary.  The synthetic schema has no
partsupp, so the supply relation is again lineitem and supply cost is
proxied by ``0.6 × p_retailprice`` (any deterministic cost column
preserves the shape):

- Q9  (profit by nation × year): multi-way star join with an arithmetic
  measure spanning fact and dim columns.
- Q11 (important inventory): group aggregate filtered against a SCALED
  GLOBAL aggregate of the same expression (HAVING sum > total × f).
- Q16 (supplier count by part attrs): multi-attribute distinct-count
  with a NOT-IN exclusion subquery.

Same engine-parity discipline as the other tpch_more files: money maths
in DECIMAL (order-independent sums), scalar thresholds ride as one-row
broadcasts (never driver collects), NOT IN compiles to left-anti, and
ORDER BY under LIMIT always carries a full tiebreak.  Reference parity:
documentation/doc-01.md:136-158 (query vocabulary wishlist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ubw_spark.queries.registry import register, table


def _dec(c: str):
    return F.col(c).cast("decimal(12,4)")


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                            * (1 - CAST(l_discount AS DECIMAL(12,4)))
                          - CAST(0.6 AS DECIMAL(2,1))
                            * CAST(p_retailprice AS DECIMAL(12,4))
                            * CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey  = l_partkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%blue%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape — profit by nation × order-year over a 4-dim star join;
    supply cost proxied by 0.6 × p_retailprice (no partsupp table).

    Plan: part/supplier/nation broadcast into the fact scan (all tiny
    dims), lineitem⋈orders is the one fact-fact shuffle, and the profit
    expression stays entirely in DECIMAL so the sum is accumulation-
    order independent — the same money discipline as q1/q10.  The
    part-name filter broadcasts pre-filtered keys, so the fact rows for
    other parts are dropped at the first join, before the shuffle."""
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%blue%"))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit = _dec("l_extendedprice") * (1 - _dec("l_discount")) - F.lit(
        "0.6"
    ).cast("decimal(2,1)") * _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_inventory",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS val
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
      GROUP BY 1)
    SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS val
    FROM pv
    WHERE val > (SELECT avg(val) * CAST(1.5 AS DECIMAL(2,1)) FROM pv)
    ORDER BY val DESC, l_partkey
    """,
    tags=("tpch", "agg", "having"),
)
def q11_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — a group aggregate kept only when it exceeds a scaled
    GLOBAL aggregate of the same expression (correlated HAVING).
    TPC-H's ``sum(val) × fraction`` threshold is replaced by
    ``avg(val) × 1.5``: a fixed fraction of SUM empties as the part
    count grows with scale factor, while a multiple of AVG keeps the
    same selectivity at every SF — the plan shape (scalar subquery over
    the grouped CTE) is identical.

    Plan: filtered supplier keys broadcast-semi into the fact, ONE
    shuffle for the per-part sum, then the global threshold derives from
    the per-part sums themselves (re-aggregating the already-reduced
    pv, NOT a second fact pass) and rides back as a one-row broadcast
    cross join — the q22 idiom, no driver collect.  Both the values and
    the threshold stay DECIMAL until the final display rounding."""
    keys = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 0)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    pv = (
        li.join(broadcast(keys), F.col("l_suppkey") == F.col("s_suppkey"), "leftsemi")
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("__val"))
    )
    threshold = pv.agg(
        (F.avg("__val") * F.lit("1.5").cast("decimal(2,1)")).alias("__thr")
    )
    return (
        pv.crossJoin(broadcast(threshold))
        .where(F.col("__val") > F.col("__thr"))
        .select(
            "l_partkey", F.round("__val", 2).cast("double").alias("val")
        )
        .orderBy(F.col("val").desc(), F.col("l_partkey"))
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'STANDARD%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%5%')
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "agg", "anti"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — distinct-supplier counts by part attributes with a
    NOT-IN exclusion list.

    Plan: the part-attribute filters broadcast into the fact; NOT IN
    compiles to a LEFT-ANTI against the (tiny, pre-filtered) excluded
    supplier keys — never a NOT-IN null-aware nested loop, which is the
    classic Q16 trap (null-aware anti join degenerates to broadcast
    nested loop; s_suppkey is non-null by schema so plain anti is
    equivalent).  count(DISTINCT) shuffles once on the group keys with
    partial distinct aggregation map-side."""
    p = (
        table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").like("STANDARD%")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%5%"))
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "leftanti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )
