"""Temporal join operators: as-of join and bounded range join.

Spark has no native as-of join; the naive formulation (join on key +
inequality, then keep max) explodes quadratically per key.  These
implementations use scale-safe shapes:

- ``asof_join``: union both sides tagged, ONE shuffle on the key, one
  ordered window pass carrying the most recent right-side values forward
  (last_value IGNORE NULLS) — O(n log n) per key, no fanout at all.
- ``range_join``: equi-join on (key, time_bin) with neighbor-bin
  expansion — the classic bin-bucketed interval join.  Fanout is the
  bin-width/range ratio (constant), never |left|×|right| per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    *,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on within the same ``by`` group.

    Implementation: tag and union, sort each ``by`` group by
    (on, right-first), carry the right row forward AS ONE STRUCT, keep
    left rows.  The struct matters: carrying each right column
    independently with last(ignorenulls) would backfill a NULL attribute
    of the true as-of row from an older row — stitching columns from two
    different right rows together."""
    rtypes = dict(right.dtypes)
    struct_type = "struct<" + ",".join(
        f"{c}:{rtypes[c]}" for c in right_cols
    ) + ">"
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(struct_type).alias("__r"),
    )
    rt = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    # align schemas: left columns missing on right side become NULL
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    rt = rt.select(*lt.columns)
    unioned = lt.unionByName(rt)
    # right rows sort before left rows at equal timestamps so a left row
    # at t sees a right row at exactly t (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__r_match", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("__is_left") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[
                F.col("__r_match").getField(c).alias(f"{c}{suffix}")
                for c in right_cols
            ],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Join rows where right_ts ∈ [left_ts - lower, left_ts + upper]
    within the same key, via time-binning.

    Each side is assigned to bins of width (lower+upper); left rows probe
    their own bin and the two neighbors, so every qualifying pair meets
    in exactly one equi-join lookup — bounded 3× fanout instead of a
    per-key cartesian."""
    width_us = max(lower_seconds + upper_seconds, 1) * 1_000_000
    lus, rus = F.unix_micros(F.col(left_ts)), F.unix_micros(F.col(right_ts))
    lbin = F.floor(lus / width_us).cast("long")
    l3 = left.withColumn(
        "__bin", F.explode(F.array(lbin - 1, lbin, lbin + 1))
    )
    r1 = right.withColumn("__bin", F.floor(rus / width_us).cast("long"))
    cond = (rus >= lus - lower_seconds * 1_000_000) & (
        rus <= lus + upper_seconds * 1_000_000
    )
    return l3.join(r1, [key, "__bin"]).where(cond).drop("__bin")
