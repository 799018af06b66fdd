"""Count-min sketch: fixed-size frequency tracking for unbounded streams.

At 100 TB the exact token-frequency table is itself huge (billions of
distinct n-grams); a count-min sketch (Cormode & Muthukrishnan 2005)
bounds the state at ``depth x width`` counters REGARDLESS of corpus
size, at the price of one-sided error: estimates never undercount,
and overcount by at most eps*N with probability 1-delta
(width ~ e/eps, depth ~ ln(1/delta)).  The production uses: heavy-
hitter screening before an exact pass, frequency features for quality
scoring, and cross-dump frequency drift without re-reading old dumps
(sketches MERGE by cell-wise addition — ``cms_merge``).

Spark shape: building is one explode (depth rows per item, map-only)
plus one map-side-combining groupBy whose key space is AT MOST
depth*width — the shuffle is bounded by the sketch size, not the data.
Estimation broadcasts the (bounded) sketch and joins probes to it;
probes never shuffle.  Hashes are the portable md5 recipe so every
cell is oracle-checkable in SQL.

Reference parity: extends the reference's aggregate vocabulary
(SURVEY.md §2.4; no sketch surface exists there) with the LLM-pipeline
frequency primitive, same pattern as the Bloom decontamination family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ubw_spark.operators.dedup import portable_hash


def cms_pairs(item_col: Column, width: int, depth: int) -> Column:
    """``array<struct<i,bucket>>`` — the depth hash cells of an item.

    Row i's hash salts the md5 input with ``cms:{i}:`` so the rows are
    independent; the SQL oracles regenerate the same cells literally."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; got {width}x{depth}")
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (
                    portable_hash(F.concat(F.lit(f"cms:{i}:"), item_col))
                    % width
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    item_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch a column of items into ``(i, bucket, cnt)`` cells —
    at most depth*width rows however large ``df`` is.

    ``weight_col`` counts each row with a weight (e.g. token counts
    pre-aggregated per document) instead of 1."""
    cols = [F.explode(cms_pairs(F.col(item_col), width, depth)).alias("p")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("__w"))
    w = F.col("__w") if weight_col is not None else F.lit(1).cast("long")
    return (
        df.select(*cols)
        .groupBy(F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum(w).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the SAME (width, depth)
    — sketch(A ∪ B) exactly (tested); the cross-dump merge needs no
    access to either dump's rows."""
    return (
        a.unionByName(b)
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Estimated count per distinct probe item: min over the item's
    depth cells (missing cell = 0).  The sketch side is broadcast —
    bounded at depth*width rows BY CONSTRUCTION, so this is the rare
    broadcast that is safe at any corpus scale; probe rows never
    shuffle (the min folds map-side per item)."""
    p = probes.select(item_col).distinct()
    cells = p.select(
        F.col(item_col),
        F.explode(cms_pairs(F.col(item_col), width, depth)).alias("p"),
    ).select(item_col, F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
    j = cells.join(F.broadcast(sketch), ["i", "bucket"], "left")
    return j.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est")
    )
