"""Fourth TPC-H batch: Q2/Q20/Q21 *analogs* — the three classic shapes
previously documented out of scope because the synthetic star schema has
no partsupp table and no receipt/commit dates.  The shapes survive the
schema translation; the business story is adapted:

- Q2  (correlated scalar-subquery MIN): cheapest unit price per part,
  lineitem standing in for partsupp as the supply relation.
- Q20 (IN-subquery driven by a correlated aggregate threshold):
  suppliers who shipped a majority of a part's annual volume.
- Q21 (multi-correlated EXISTS + NOT EXISTS on the same fact): the only
  late supplier on a multi-supplier order — lateness derived from
  shipdate vs orderdate instead of receipt vs commit.

Scale discipline matches the rest of the file family: correlated
subqueries become broadcast dims + a single keyed shuffle (window or
re-join on the correlation key), EXISTS/NOT EXISTS become left-semi /
left-anti joins on the already-shuffled key, money/quantity sums go
through DECIMAL, and every ORDER BY under a LIMIT carries a full
tiebreak.  Reference parity: the reference's test queries stop at the
same sample vocabulary (documentation/doc-01.md:136-158); these cover
the JOIN SHAPES its engine would express as correlated Slick queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ubw_spark.queries.registry import register, table


def _dec(c: str):
    return F.col(c).cast("decimal(12,4)")


@register(
    "q2_min_price_supplier",
    oracle="""
    WITH li AS (
      SELECT l_partkey, l_suppkey,
             l_extendedprice / l_quantity AS unit_price
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
    )
    SELECT DISTINCT s_acctbal, s_name, p_partkey, p_name, unit_price
    FROM li
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE unit_price = (
      SELECT min(l2.l_extendedprice / l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = li.l_partkey
    )
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
    tags=("tpch", "join", "correlated"),
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — correlated scalar subquery with MIN: for each size-15
    part, the supplier(s) offering its minimum unit price.

    The correlated ``= (SELECT min(..) WHERE l2.l_partkey = p_partkey)``
    compiles to ONE shuffle: broadcast the 41-part filtered dim into the
    fact scan, then a min-over-partition window on the same l_partkey
    key — no second pass over lineitem, no join-back exchange.  Unit
    price stays a raw IEEE division (bit-identical on both engines);
    rounding it would reopen the HALF_UP-vs-half-even trap."""
    p = table(spark, sf_dir, "part").where(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    w = Window.partitionBy("l_partkey")
    cand = (
        li.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_unit", F.min("unit_price").over(w))
        .where(F.col("unit_price") == F.col("min_unit"))
    )
    return (
        cand.join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "p_partkey", "p_name", "unit_price")
        .dropDuplicates()
        .orderBy(
            F.col("s_acctbal").desc(), F.col("p_partkey"), F.col("s_name")
        )
        .limit(100)
    )


@register(
    "q20_dominant_supplier",
    oracle="""
    WITH sp AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(12,4))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'small%')
      GROUP BY 1, 2),
    tot AS (SELECT l_partkey, sum(qty) AS tq FROM sp GROUP BY 1)
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM sp JOIN tot USING (l_partkey)
      WHERE 2 * qty > tq)
    ORDER BY s_name
    """,
    tags=("tpch", "join", "correlated", "semi"),
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — IN-subquery gated by a correlated aggregate
    threshold: suppliers who shipped >half of a 'small%' part's total
    1997 volume.

    Plan: date filter pushed to the scan, part keys broadcast-LEFT-SEMI
    into the fact, one shuffle on (l_partkey, l_suppkey) for the
    partial-agg groupBy, the correlated total as a window over the same
    partkey (no second fact pass), and the final supplier membership as
    a left-semi against the (tiny, distinct) dominant-supplier keys.
    The majority test is ``2*qty > total`` — pure DECIMAL integer
    comparison, no 0.5 literal whose type could drift between engines."""
    part_keys = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sp = (
        li.join(
            broadcast(part_keys),
            F.col("l_partkey") == F.col("p_partkey"),
            "leftsemi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        sp.withColumn("tq", F.sum("qty").over(w))
        .where(F.lit(2) * F.col("qty") > F.col("tq"))
        .select("l_suppkey")
        .dropDuplicates()
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(
            broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("tpch", "join", "semi", "anti"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — multi-correlated EXISTS + NOT EXISTS against the same
    fact: suppliers who were the ONLY late shipper on a finished
    multi-supplier order (late = shipped >60 days after the order date,
    standing in for receipt>commit which the synthetic schema lacks).

    Plan: EXISTS compiles to a LEFT-SEMI and NOT EXISTS to a LEFT-ANTI
    self-join, both keyed on the SAME l_orderkey, so the three
    exchanges line up and no probe row ever fans out (semi/anti emit
    each row at most once, unlike a rewrite through inner
    join + distinct).  Spark scans the pruned 3-column fact once per
    branch (no common-subplan reuse across DataFrame handles); each
    scan is column-pruned + null-filter-pushed, and the sibling
    branches pre-aggregate to distinct (orderkey, suppkey) pairs
    before shuffling, so the semi/anti build sides carry no payload.
    The supplier dim broadcasts for the final name lookup."""
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    fact = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    l1 = fact.where("late").alias("l1")
    pairs = fact.select("l_orderkey", "l_suppkey").dropDuplicates().alias("p")
    late_pairs = (
        fact.where("late").select("l_orderkey", "l_suppkey").dropDuplicates().alias("lp")
    )
    waiting = l1.join(
        pairs,
        (F.col("l1.l_orderkey") == F.col("p.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("p.l_suppkey")),
        "leftsemi",
    ).join(
        late_pairs,
        (F.col("l1.l_orderkey") == F.col("lp.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("lp.l_suppkey")),
        "leftanti",
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )
