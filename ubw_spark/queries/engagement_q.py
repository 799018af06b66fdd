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


@register(
    "events_cohort_ltv",
    oracle="""
    WITH u AS (SELECT user_id, min(ts) AS f FROM events GROUP BY 1),
    c AS (SELECT user_id, CAST(date_trunc('week', f) AS DATE) AS cw
          FROM u),
    sz AS (SELECT cw, count(*)::BIGINT AS cohort_users FROM c GROUP BY 1),
    p AS (SELECT c.cw,
                 CAST(datediff('day', c.cw,
                               CAST(date_trunc('week', e.ts) AS DATE))
                      // 7 AS BIGINT) AS age_week,
                 CAST(round(e.value * 100) AS BIGINT) AS cents
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.value IS NOT NULL),
    a AS (SELECT cw, age_week, CAST(sum(cents) AS BIGINT) AS rev_cents
          FROM p GROUP BY 1, 2),
    w AS (SELECT cw, age_week, rev_cents,
                 CAST(sum(rev_cents)
                      OVER (PARTITION BY cw ORDER BY age_week)
                      AS BIGINT) AS cum_rev_cents
          FROM a)
    SELECT strftime(w.cw, '%Y-%m-%d') AS cohort_week, w.age_week,
           w.rev_cents, w.cum_rev_cents, sz.cohort_users,
           CAST(w.cum_rev_cents // sz.cohort_users AS BIGINT)
             AS ltv_cents_per_user
    FROM w JOIN sz ON w.cw = sz.cw
    """,
    tags=("events", "engagement", "window"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-cohort LTV curves: purchase revenue (exact cents)
    accumulating along age-in-weeks, with the per-user LTV in integer
    division — the retention-economics readout next to
    events_retention_cohorts.

    Scale: first-seen and revenue both reduce with map-side combine;
    the cumulative window runs per cohort over the calendar-bounded
    (cohort × age) aggregate."""
    from ubw_spark.operators.engagement import cohort_ltv

    e = table(spark, sf_dir, "events")
    cents = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100, 0).cast("long"),
    )
    return cohort_ltv(e, "user_id", "ts", cents)
