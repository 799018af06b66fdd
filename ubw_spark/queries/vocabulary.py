"""Vocabulary-completing queries: regexp functions, the SQL API entry
(spark.sql over temp views — GROUPING SETS), exact percentiles, and
range-frame windows.

The reference exposes host-language escape hatches instead of a function
library (SURVEY §2.8); the engine's vocabulary is Spark's own, and these
queries pin down the cross-engine-stable subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ubw_spark.queries.registry import register, table


@register(
    "scalar_regexp_funcs",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           len(regexp_split_to_array(text, 'the')) - 1 AS the_count,
           regexp_replace(text, '\d+', '#', 'g') AS digits_masked,
           regexp_matches(text, '^[a-z]') AS starts_lower
    FROM documents WHERE doc_id < 200
    """,
    tags=("scalar", "text"),
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp vocabulary on the RE2∩Java-compatible subset (character
    classes, anchors, quantifiers — no lookarounds/backrefs, which RE2
    lacks)."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        (F.size(F.split("text", "the")) - 1).alias("the_count"),
        F.regexp_replace("text", r"\d+", "#").alias("digits_masked"),
        F.col("text").rlike(r"^[a-z]").alias("starts_lower"),
    )


@register(
    "sql_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "sql"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point: same engine, SQL text in — registered
    temp views make every table available to raw SQL users (the
    reference's JSON-driven-SQL audience often wants plain SQL too)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT c_mktsegment,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal), 4) AS p50,
           round(percentile_cont(0.95) WITHIN GROUP (ORDER BY c_acctbal), 4) AS p95
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating percentiles (Spark `percentile` == SQL
    percentile_cont).  At 100 TB switch to approx_percentile — exact
    percentiles need a per-group sort; the approximate sketch merges."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.95)"), 4).alias("p95"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
             AS orders_30d
    FROM orders
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time seconds: orders per customer in the
    trailing 30 days — the value-based frame rowsBetween can't express."""
    o = table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ: no direct →long cast in Spark 4;
    # go through timestamp (session is UTC, so epoch seconds agree).
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-2_592_000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("orders_30d"),
    )


@register(
    "agg_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_orders,
           count(DISTINCT l_partkey) AS exact_parts,
           count(*) AS n,
           TRUE AS orders_within_tol,
           TRUE AS parts_within_tol,
           TRUE AS median_within_tol,
           TRUE AS p99_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "sketch"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch aggregates that REPLACE their exact forms at 100 TB:
    approx_count_distinct (HyperLogLog++ — mergeable, O(1) memory vs a
    full distinct shuffle) and approx_percentile (KLL-style — no
    per-group sort).

    Sketch *estimates* are engine-specific, so the value check is the
    accuracy contract itself: compute exact and approximate forms over
    the same data, emit the exact values plus per-group booleans
    "approx within documented relative error of exact" (5% — generous
    vs rsd=0.01 for HLL++ and 1/1000 rank error for the percentile
    sketch).  The oracle recomputes the exact values in DuckDB and
    expects every boolean TRUE — a drifting sketch hash-mismatches.

    Two scale lessons are baked into the SHAPE of this query (both
    measured at sf1 — 6M rows — where the naive single-agg form OOMed
    an 8 GB heap in isolation and ground 15 minutes of GC in the
    harness; this form runs in seconds):

    - NEVER mix exact-distinct aggregates with sketch buffers in one
      ``agg``: countDistinct plans an Expand whose partial-aggregate
      grouping key includes the distinct VALUE, so every non-distinct
      buffer (each HLL++ sketch at rsd=0.01 is ~16k registers) is
      materialized once per distinct key — sketch_size × key
      cardinality of heap.  The sketch aggregates and the exact
      distinct counts run as SEPARATE 3-row aggregations joined at
      the end.
    - EXACT percentiles ride a (group, value, freq) pre-aggregation +
      the frequency-weighted ``percentile(col, p, freq)`` form: raw
      ``percentile(col, p)`` keeps a value map per partition per
      group; the pre-aggregated form is one spillable Tungsten hash
      agg + a distinct-values-sized percentile input."""
    li = table(spark, sf_dir, "lineitem")
    tol = 0.05

    def within(approx, exact, name):
        return (F.abs(approx - exact) <= tol * exact).alias(name)

    pct = (
        li.groupBy("l_returnflag", "l_extendedprice")
        .agg(F.count(F.lit(1)).alias("freq"))
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5, freq)").alias(
                "exact_median"
            ),
            F.expr("percentile(l_extendedprice, 0.99, freq)").alias(
                "exact_p99"
            ),
        )
    )
    exact_cd = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias(
                "approx_orders"
            ),
            F.approx_count_distinct("l_partkey", rsd=0.01).alias(
                "approx_parts"
            ),
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias(
                "approx_median"
            ),
            F.expr("approx_percentile(l_extendedprice, 0.99, 1000)").alias(
                "approx_p99"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .join(exact_cd, "l_returnflag")
        .join(pct, "l_returnflag")
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        "n",
        within(F.col("approx_orders"), F.col("exact_orders"), "orders_within_tol"),
        within(F.col("approx_parts"), F.col("exact_parts"), "parts_within_tol"),
        within(F.col("approx_median"), F.col("exact_median"), "median_within_tol"),
        within(F.col("approx_p99"), F.col("exact_p99"), "p99_within_tol"),
    )


@register(
    "window_analytic_suite",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_ok,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           CAST(dense_rank() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderpriority) AS BIGINT)
             AS prio_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window vocabulary beyond rank/lag: first_value /
    last_value (with the full-frame gotcha — default frames cut
    last_value at CURRENT ROW), percent_rank, cume_dist, dense_rank.
    All windows share the o_custkey partition key (the date-ordered pair
    re-sorts in place; the priority-ordered one plans its own exchange);
    every value ORDER BY carries the orderkey tiebreak so ties can't
    flip frames between engines."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wp = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wfull).alias("last_ok"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.dense_rank().over(wp).cast("long").alias("prio_rank"),
    )


@register(
    "scalar_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           dayofweek(o_orderdate) + 1 AS dow_sun1,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY, '%Y-%m-%d')
             AS due_90d,
           CAST(quarter(o_orderdate) AS INT) AS qtr
    FROM orders WHERE o_orderkey < 500
    """,
    tags=("scalar", "date"),
)
def scalar_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime vocabulary beyond year/month: date_trunc (month/week —
    both engines start weeks on Monday), last_day, day-of-week
    (normalized to Spark's Sunday=1 convention; DuckDB's dayofweek is
    Sunday=0), date arithmetic, quarter.  Dates emit as yyyy-MM-dd
    strings — DuckDB DATE reaches pandas as midnight datetime64, so raw
    date columns can never hash-match (repo-wide convention)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias("week_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek("o_orderdate").cast("long").alias("dow_sun1"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_90d"),
        F.quarter("o_orderdate").alias("qtr"),
    )


@register(
    "scalar_url_funcs",
    oracle=r"""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com:8443/corpus/' ||
             lang || '/doc?id=' || doc_id::VARCHAR || '&v=2' AS url
      FROM documents WHERE doc_id < 200)
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/:]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
    tags=("scalar", "url"),
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL vocabulary over Spark's native parse_url (JVM, codegen) —
    host / path / query-param / protocol extraction, the per-document
    provenance parsing a web-corpus pipeline runs on every row.  The
    oracle mirrors each accessor with an equivalent regexp, pinning
    parse_url's semantics cross-engine on the synthesized URLs."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com:8443/corpus/"),
        F.col("lang"), F.lit("/doc?id="), F.col("doc_id").cast("string"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("id")).alias(
            "id_param"
        ),
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
    )
