"""Survival-analysis queries (operators/survival.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ubw_spark.operators.survival import km_curve, lifetimes
from ubw_spark.queries.registry import register, table


@register(
    "events_survival_curve",
    oracle="""
    WITH b AS (SELECT user_id AS u,
                      CAST(date_trunc('day', ts) AS DATE) AS d
               FROM events),
    mx AS (SELECT max(d) AS mx FROM b),
    us AS (SELECT u, min(d) AS f, max(d) AS l FROM b GROUP BY 1),
    ul AS (SELECT CAST(datediff('day', f, l) AS BIGINT) AS t,
                  CASE WHEN datediff('day', l, mx.mx) < 3
                       THEN 1 ELSE 0 END AS cens
           FROM us, mx),
    g AS (SELECT t, count(*)::BIGINT AS leaves,
                 CAST(sum(1 - cens) AS BIGINT) AS deaths
          FROM ul GROUP BY 1),
    w AS (SELECT t, leaves, deaths,
                 CAST(sum(leaves) OVER (ORDER BY t ROWS BETWEEN
                        UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                      - coalesce(sum(leaves)
                        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS BIGINT) AS at_risk
          FROM g),
    s AS (SELECT t, at_risk, deaths, leaves,
                 CASE WHEN deaths < at_risk
                      THEN round(ln(1 - deaths::DOUBLE
                                    / at_risk::DOUBLE), 12) END AS term,
                 CASE WHEN deaths >= at_risk THEN 1 ELSE 0 END AS zf
          FROM w),
    c AS (SELECT t, at_risk, deaths, leaves,
                 coalesce(sum(term) OVER (ORDER BY t ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW),
                          0.0e0) AS logs,
                 max(zf) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS anyzero
          FROM s)
    SELECT t, at_risk, deaths, leaves,
           CASE WHEN anyzero = 1 THEN 0.0e0
                ELSE round(exp(logs), 6) END AS survival
    FROM c
    """,
    tags=("events", "survival", "window"),
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier user-retention curve: lifetime = first→last active
    day, right-censored inside the trailing 3-day window — the churn
    readout behind "what fraction of users survive N days".

    Scale: one per-user min/max reduction, then everything runs on the
    ≤31-row day-grain aggregate; the KM product is a 12dp-rounded log
    sum (the cross-engine float recipe), so the curve oracles exactly
    despite being a product of 30 ratios."""
    e = table(spark, sf_dir, "events")
    lt = lifetimes(e, "user_id", "ts", censor_window_days=3)
    return km_curve(lt)
