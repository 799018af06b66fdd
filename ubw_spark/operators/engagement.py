"""Engagement analytics: daily/rolling active units and
new-vs-returning decomposition — the DAU/MAU product-health readouts.

Everything works on the DAY GRAIN: the first step reduces the raw
event stream to distinct (day, unit) rows, after which every
computation is bounded by units × days, typically 4–6 orders of
magnitude smaller than the stream.

The rolling-distinct shape deserves care at scale.  ``count(DISTINCT
user) OVER (last N days)`` has no partial aggregation; a naive
day-spine × day-grain range join is a nested loop.  Instead
:func:`rolling_actives` FANS each (day, unit) row out to the ≤N later
days it keeps alive (``explode(sequence(d, d+N−1))`` — map-only, ×N
row amplification on day-grain rows), then one distinct-count per day:
shuffle volume is N × |day-grain|, no join at all.  For corpora where
even that is too much, the approximate path is per-day HLL registers
max-merged across the window (operators/hll.py) — same shape the
persisted HLL store already uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "active_units",
    "rolling_actives",
    "stickiness",
    "new_vs_returning",
    "cohort_ltv",
]


def active_units(
    df: DataFrame, unit_col: str, ts_col: str = "ts"
) -> DataFrame:
    """Distinct (d, u) day-grain activity rows — the shared input of
    every metric here.  One distinct shuffle on (day, unit); partial
    aggregation dedups map-side first."""
    return df.select(
        F.to_date(F.col(ts_col)).alias("d"), F.col(unit_col).alias("u")
    ).distinct()


def rolling_actives(
    du: DataFrame, window_days: int
) -> DataFrame:
    """(d, active): distinct units seen in the ``window_days`` ending
    at d, for every day with any activity.

    Each day-grain row is exploded to the window_days it contributes
    to (map-only), clipped back to days that actually occur (semi-join
    against the broadcastable distinct-day set — so trailing ghost days
    past the data's end don't appear), then distinct-counted per day."""
    if window_days < 1:
        # sequence(d, d-1) would DESCEND (Spark defaults step to -1),
        # silently counting each day's activity toward the previous day
        raise ValueError(f"need window_days >= 1; got {window_days}")
    fan = du.select(
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("d"),
        "u",
    )
    days = du.select("d").distinct()
    return (
        fan.join(F.broadcast(days), "d", "left_semi")
        .groupBy("d")
        .agg(F.count_distinct("u").alias("active"))
    )


def stickiness(
    df: DataFrame,
    unit_col: str,
    ts_col: str = "ts",
    *,
    window_days: int = 7,
) -> DataFrame:
    """(d, dau, wau, stickiness_milli): daily actives, rolling
    ``window_days`` actives, and their ratio in exact integer
    milli-units (dau·1000 div wau) — the DAU/WAU stickiness curve.

    The dau and wau aggregates share the one day-grain reduction; the
    final join is day-keyed on O(days) rows."""
    du = active_units(df, unit_col, ts_col)
    dau = du.groupBy("d").agg(F.count_distinct("u").alias("dau"))
    wau = rolling_actives(du, window_days).withColumnRenamed(
        "active", "wau"
    )
    return dau.join(wau, "d").select(
        "d",
        "dau",
        "wau",
        F.expr("(dau * 1000) div wau").alias("stickiness_milli"),
    )


def new_vs_returning(
    df: DataFrame, unit_col: str, ts_col: str = "ts"
) -> DataFrame:
    """(d, new_units, returning_units): per day, units active for the
    first time ever vs seen before — acquisition vs retention.

    First-seen day is a min window PARTITIONED BY UNIT over the
    day-grain rows (bounded by that unit's active days), so no
    self-join against a first-seen table."""
    du = active_units(df, unit_col, ts_col)
    first = F.min("d").over(Window.partitionBy("u"))
    flagged = du.withColumn("is_new", (F.col("d") == first).cast("int"))
    return flagged.groupBy("d").agg(
        F.sum("is_new").alias("new_units"),
        F.sum(1 - F.col("is_new")).alias("returning_units"),
    )


def cohort_ltv(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    value_col,
) -> DataFrame:
    """Cohort lifetime-value curves: units cohort by their FIRST-seen
    week, revenue accumulates along age-in-weeks — ``(cohort_week,
    age_week, rev_cents, cum_rev_cents, cohort_users,
    ltv_cents_per_user)``.

    ``value_col`` is the integer-grain revenue of each row (rows with
    NULL contribute nothing).  The cumulative window is partitioned by
    cohort over the (cohort × age) AGGREGATE — bounded by the calendar,
    not the stream; the per-unit first-seen reduction and the revenue
    aggregate both map-side combine.  Ages with zero revenue emit no
    row (the curve keeps its last value across them)."""
    first = df.groupBy(F.col(unit_col).alias("u")).agg(
        F.min(F.col(ts_col)).alias("f")
    )
    cohort = first.select(
        "u", F.to_date(F.date_trunc("week", F.col("f"))).alias("cw")
    )
    size = cohort.groupBy("cw").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    val = value_col if not isinstance(value_col, str) else F.col(value_col)
    rev = (
        df.select(
            F.col(unit_col).alias("u"),
            F.to_date(F.date_trunc("week", F.col(ts_col))).alias("ew"),
            val.alias("cents"),
        )
        .where(F.col("cents").isNotNull())
        .join(cohort, "u")
        .select(
            "cw",
            F.expr("datediff(ew, cw) div 7").cast("long").alias("age_week"),
            "cents",
        )
        .groupBy("cw", "age_week")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    cum = rev.withColumn(
        "cum_rev_cents",
        F.sum("rev_cents").over(
            Window.partitionBy("cw")
            .orderBy("age_week")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return cum.join(size, "cw").select(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        "age_week",
        "rev_cents",
        "cum_rev_cents",
        "cohort_users",
        F.expr("cum_rev_cents div cohort_users").alias(
            "ltv_cents_per_user"
        ),
    )
