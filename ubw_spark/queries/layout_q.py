"""Z-order layout queries — the clustering math is fully oracled.

The histogram query computes the exact per-row z-values (bucketize →
Morton interleave) and aggregates per coarse z-prefix: this pins the
whole bit pipeline cross-engine, so :func:`zorder_write` (tested
against real files in tests/test_layout.py) rides on verified math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.layout import (
    bucketize_by_cutpoints,
    exact_quantile_cuts,
    with_zvalue,
    zvalue_sql,
)
from ubw_spark.queries.registry import register, table


@register(
    "layout_zorder_histogram",
    oracle=r"""
    WITH s AS (
      SELECT min(o_custkey)::DOUBLE AS mnx, max(o_custkey)::DOUBLE AS mxx,
             min(o_totalprice)::DOUBLE AS mny, max(o_totalprice)::DOUBLE AS mxy
      FROM orders),
    b AS (
      SELECT o_custkey, o_totalprice,
             least(coalesce(floor((o_custkey::DOUBLE - mnx)
               / (mxx - mnx + 1e-9) * 256), 0), 255)::BIGINT AS bx,
             least(coalesce(floor((o_totalprice::DOUBLE - mny)
               / (mxy - mny + 1e-9) * 256), 0), 255)::BIGINT AS by
      FROM orders, s),
    z AS (SELECT o_custkey, o_totalprice, ("""
    + zvalue_sql(["bx", "by"], 8)
    + r""") AS zv FROM b)
    SELECT zv >> 10 AS zbucket, count(*) AS n,
           min(o_custkey) AS min_custkey, max(o_custkey) AS max_custkey,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM z GROUP BY zbucket
    """,
    tags=("layout", "zorder"),
)
def layout_zorder_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse Z-curve histogram of orders over (o_custkey,
    o_totalprice): per 64-bucket z-prefix, the row count and the
    bounding box — small boxes per contiguous z-range are exactly the
    file-pruning property :func:`zorder_write` lays on disk.  One
    one-row stats broadcast + map-side bit math + one groupBy."""
    o = table(spark, sf_dir, "orders")
    z = with_zvalue(o, ["o_custkey", "o_totalprice"], bits=8, out_col="__z")
    return (
        z.select(
            F.shiftrightunsigned("__z", 10).alias("zbucket"),
            "o_custkey",
            "o_totalprice",
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "layout_quantile_bucket_histogram",
    oracle="""
    WITH nrow AS (SELECT count(*) AS nn FROM orders),
    vc AS (SELECT o_totalprice::DOUBLE AS v, count(*) AS c
           FROM orders GROUP BY 1),
    cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cc FROM vc),
    idx AS (SELECT i FROM generate_series(1, 15) AS t(i)),
    cuts AS (
      SELECT i, min(v) AS cut
      FROM cum, idx, nrow
      WHERE cc >= ceil(i * nn / 16.0)
      GROUP BY i),
    b AS (
      SELECT o.o_totalprice,
             (SELECT count(*) FROM cuts
              WHERE cut <= o.o_totalprice::DOUBLE) AS bucket
      FROM orders o)
    SELECT bucket, count(*) AS n,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM b GROUP BY bucket
    """,
    tags=("layout", "zorder", "quantile"),
)
def layout_quantile_bucket_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equal-mass bucketing of orders by o_totalprice through the
    quantile kernel (:func:`bucketize_by_cutpoints`) — per bucket, row
    count and price bounds.  Cutpoints are EXACT nb-quantiles by the
    cumulative-count rule (no interpolation), so the whole pipeline —
    cutpoint selection, array bucketing, histogram — reproduces
    bit-for-bit in DuckDB; the production layout path swaps in
    ``approx_percentile`` cutpoints over the same kernel
    (with_zvalue(cutpoints='quantile')).  Shape: one distinct-value
    aggregate + cumulative window over it, cutpoint array broadcast
    back, map-side bucketing, one histogram groupBy."""
    o = table(spark, sf_dir, "orders")
    cuts = exact_quantile_cuts(o, "o_totalprice", 16)
    b = o.crossJoin(F.broadcast(cuts)).select(
        "o_totalprice",
        bucketize_by_cutpoints(
            F.col("o_totalprice"), F.col("__cuts"), 4
        ).alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
