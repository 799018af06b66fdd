"""Time-series regularization: resample to a fixed grid, fill the gaps.

Event streams are irregular; most downstream consumers (rate monitors,
training-curriculum schedules, seasonality models) want a REGULAR
series per key — one row per (key, step) with the holes made explicit
and then filled.  This module does it in three declarative stages:

1. ``resample``  — bucket events to the step and aggregate per bucket;
2. ``time_grid`` — explode each key's [min bucket, max bucket] span
   into the dense grid and left-join the observed buckets (absent
   bucket → NULL value, the explicit gap);
3. ``gapfill``   — forward-fill and/or linearly interpolate the NULLs
   with per-key windows.

Scale: the grid is keyed — ``sequence`` explodes min..max PER KEY, so
a key observed for an hour never pays for the corpus's full span, and
every window is partitioned by the key columns (the global-window lint
applies to this module like any other).  The only shuffles are the
bucket aggregate and the per-key sort the windows need; both are keyed
on the series key, so at 100 TB they scale with keys × span/step, not
with raw events.  Skewed keys (one device emitting most events) are
bounded by the bucket aggregate's map-side combine: the window stage
sees at most span/step rows per key, however hot the key.

Interpolation arithmetic is pinned for oracle parity: values are fixed
at long "cents" before interpolating (the events.py convention), the
fraction is computed in double with the SAME association both engines
use, and outputs round at 6dp.

Reference parity: the reference has no time-series surface; this
extends its window vocabulary (SURVEY.md §2.5) with the
training-pipeline regularization shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    step: str = "hour",
    aggs: list[Column],
) -> DataFrame:
    """Aggregate events into per-(key, bucket) rows: ``date_trunc`` to
    the step unit, one map-side-combining groupBy.  ``aggs`` are the
    aggregate expressions (already aliased)."""
    return (
        df.withColumn("__bucket", F.date_trunc(step, F.col(ts_col)))
        .groupBy(*key_cols, "__bucket")
        .agg(*aggs)
        .withColumnRenamed("__bucket", ts_col)
    )


def time_grid(
    observed: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    step: str = "1 hour",
) -> DataFrame:
    """Densify: one row per (key, step) from each key's first to last
    observed bucket, observed values joined in, gaps as NULLs.

    The bounds aggregate runs on the ALREADY-AGGREGATED buckets (keys ×
    span rows, not raw events), and the grid explode is per key —
    ``sequence(min, max, interval)`` never descends because min <= max
    within a key by construction.  The grid-to-observed join is keyed
    on (key, bucket): with AQE it broadcasts when the observed side is
    small and shuffle-joins otherwise — both correct, neither
    corpus-sized."""
    bounds = observed.groupBy(*key_cols).agg(
        F.min(ts_col).alias("__t0"), F.max(ts_col).alias("__t1")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.col("__t0"), F.col("__t1"), F.expr(f"INTERVAL {step}")
            )
        ).alias(ts_col),
    )
    return grid.join(observed, [*key_cols, ts_col], "left")


def gapfill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    *,
    ffill_col: str | None = None,
    interp_col: str | None = None,
) -> DataFrame:
    """Fill NULL gaps in a dense per-key series.

    ``ffill_col``  — last non-NULL value at or before the row (NULL
    before the key's first observation: forward fill carries, it does
    not invent).
    ``interp_col`` — linear interpolation between the surrounding
    non-NULL anchors, double rounded 6dp; rows outside the anchored
    span hold the nearest anchor.  Anchor timestamps travel through the
    same IGNORE NULLS windows as the values, so both lookups are one
    per-key sort, not self-joins."""
    back = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # The FORWARD anchor ("first non-null at or after this row") is
    # expressed as a RUNNING frame over the DESCENDING sort — same
    # value, different execution class: Spark evaluates a (current row,
    # UNBOUNDED FOLLOWING) frame by re-scanning to the partition end
    # for every row (UnboundedFollowingWindowFunctionFrame — O(n²) per
    # key), while an (UNBOUNDED PRECEDING, current row) frame is a
    # running accumulator (O(n)).  Cost: one extra per-key sort — at
    # span/step rows per key that is the cheap side of the trade
    # (measured 15.3 s → ~3 s on the sf1 gapfill query).
    fwd_as_back = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(value_col)
    anchor_ts = F.when(v.isNotNull(), F.col(ts_col))
    # materialize the four anchors as COLUMNS, then derive from the
    # columns: every later reference is an attribute read, so no window
    # expression can be replanted per reference (the no-CSE discipline,
    # functions/hof.py — here applied to window trees)
    anchored = df.select(
        "*",
        F.last(v, ignorenulls=True).over(back).alias("__pv"),
        F.last(anchor_ts, ignorenulls=True).over(back).alias("__pt"),
        F.last(v, ignorenulls=True).over(fwd_as_back).alias("__nv"),
        F.last(anchor_ts, ignorenulls=True).over(fwd_as_back).alias("__nt"),
    )
    pv, pt = F.col("__pv"), F.col("__pt")
    nv, nt = F.col("__nv"), F.col("__nt")

    out = anchored
    if ffill_col is not None:
        out = out.withColumn(ffill_col, pv)
    if interp_col is not None:
        # fraction in DOUBLE with pinned association — the SQL oracle
        # mirrors this exact tree: pv + (nv - pv) * dt / dT
        dt = (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(pt)
        ).cast("double")
        d_total = (F.unix_timestamp(nt) - F.unix_timestamp(pt)).cast(
            "double"
        )
        interp = (
            F.when(v.isNotNull(), v.cast("double"))
            .when(
                pv.isNotNull() & nv.isNotNull(),
                pv.cast("double") + (nv - pv).cast("double") * dt / d_total,
            )
            .otherwise(F.coalesce(pv, nv).cast("double"))
        )
        out = out.withColumn(interp_col, F.round(interp, 6))
    return out.drop("__pv", "__pt", "__nv", "__nt")
