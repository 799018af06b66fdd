"""Engagement analytics queries (operators/engagement.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.engagement import new_vs_returning, stickiness
from ubw_spark.queries.registry import register, table

_DU = (
    "du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, "
    "user_id AS u FROM events)"
)


@register(
    "events_dau_wau_stickiness",
    oracle=f"""
    WITH {_DU},
    dau AS (SELECT d, count(DISTINCT u)::BIGINT AS dau FROM du GROUP BY 1),
    fan AS (SELECT unnest(generate_series(d::TIMESTAMP,
                                          d::TIMESTAMP + INTERVAL 6 DAY,
                                          INTERVAL 1 DAY))::DATE AS d, u
            FROM du),
    days AS (SELECT DISTINCT d FROM du),
    wau AS (SELECT f.d, count(DISTINCT f.u)::BIGINT AS wau
            FROM fan f WHERE f.d IN (SELECT d FROM days) GROUP BY 1)
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           CAST((dau.dau * 1000) // wau.wau AS BIGINT) AS stickiness_milli
    FROM dau JOIN wau ON dau.d = wau.d
    """,
    tags=("events", "engagement", "llm"),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives, 7-day rolling actives, and the DAU/WAU stickiness
    ratio in exact integer milli-units — the product-health curve.

    Scale: the stream reduces to day-grain (users × days) rows first;
    the rolling distinct is a map-only ×7 explode of those rows plus
    one distinct-count per day — NO day-spine nested-loop join, no
    unpartitioned window.  The exact path is fine at 1000 executors;
    the HLL max-merge over per-day registers (operators/hll.py) is the
    documented approximation when even day-grain × window is too big."""
    e = table(spark, sf_dir, "events")
    s = stickiness(e, "user_id", "ts", window_days=7)
    return s.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "dau",
        F.col("wau"),
        "stickiness_milli",
    )


@register(
    "events_new_vs_returning",
    oracle=f"""
    WITH {_DU},
    n AS (SELECT d, u, min(d) OVER (PARTITION BY u) AS fd FROM du)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           sum(CASE WHEN d = fd THEN 1 ELSE 0 END)::BIGINT AS new_units,
           sum(CASE WHEN d = fd THEN 0 ELSE 1 END)::BIGINT
             AS returning_units
    FROM n GROUP BY 1
    """,
    tags=("events", "engagement"),
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition vs retention split per day: units active for the
    first time ever vs seen on an earlier day.

    Scale: first-seen is a min window partitioned BY UNIT over
    day-grain rows (bounded by a unit's active days), then one day
    aggregate — no self-join against a first-seen dimension."""
    e = table(spark, sf_dir, "events")
    nr = new_vs_returning(e, "user_id", "ts")
    return nr.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_units",
        "returning_units",
    )
