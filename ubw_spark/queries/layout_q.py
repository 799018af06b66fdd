"""Z-order layout queries — the clustering math is fully oracled.

The histogram query computes the exact per-row z-values (bucketize →
Morton interleave) and aggregates per coarse z-prefix: this pins the
whole bit pipeline cross-engine, so :func:`zorder_write` (tested
against real files in tests/test_layout.py) rides on verified math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.layout import with_zvalue, zvalue_sql
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
