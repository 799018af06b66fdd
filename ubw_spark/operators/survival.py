"""Survival analysis: Kaplan–Meier curves over unit lifetimes with
right-censoring — the churn-analysis standard.

The estimator S(t) = Π_{s≤t} (1 − d_s/n_s) is a product over event
times; engines can't mirror a windowed product directly, so it runs as
exp(Σ ln(1 − d_s/n_s)) with EACH log term rounded to 12dp before the
sum — the repo's cross-engine float rule (identical addends → bit-
identical sums; see text_unigram_logprob for the precedent).  Counts
(at-risk, deaths, censored) are exact integers throughout.

Scale posture: lifetimes reduce to one row per unit (map-side min/max),
then everything lives on the TIME-GRAIN aggregate — at most one row per
distinct lifetime day — so the cumulative windows are bounded by the
calendar, not the population.  The day-0 risk total is a one-row
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lifetimes", "km_curve"]


def lifetimes(
    df: DataFrame,
    unit_col: str,
    ts_col: str = "ts",
    *,
    censor_window_days: int = 3,
) -> DataFrame:
    """(t, cens) per unit: lifetime in days (first activity → last
    activity) and a right-censoring flag — a unit still active within
    ``censor_window_days`` of the data's end hasn't churned, it just
    ran out of observation window.

    One per-unit min/max aggregate; the global max day is a one-row
    broadcast."""
    b = df.select(
        F.col(unit_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    )
    mx = b.agg(F.max("d").alias("mx"))
    u = b.groupBy("u").agg(F.min("d").alias("f"), F.max("d").alias("l"))
    return u.crossJoin(F.broadcast(mx)).select(
        F.datediff("l", "f").cast("long").alias("t"),
        F.when(
            F.datediff("mx", "l") < censor_window_days, 1
        ).otherwise(0).alias("cens"),
    )


def km_curve(lt: DataFrame, *, dp: int = 6) -> DataFrame:
    """Kaplan–Meier estimate from :func:`lifetimes` rows: one row per
    distinct lifetime day ``(t, at_risk, deaths, leaves, survival)``
    where ``leaves`` counts every unit exiting the risk set at t
    (deaths + censored) and ``survival`` = S(t) through end of day t.

    at_risk_t = N − Σ_{s<t} leaves_s (exact); the product runs as a
    12dp-rounded log sum (module docstring); a day where everyone at
    risk dies pins survival to exactly 0 from then on (ln(0) would be
    NULL in Spark and -inf elsewhere — the flag sidesteps the engine
    disagreement).

    N itself is a FULL-FRAME window over the same time-grain aggregate
    (not a one-row join): every unpartitioned window here then grounds
    directly on the bounded aggregate, which both keeps the plan
    join-free and is what the registry's global-window lint verifies
    statically."""
    g = lt.groupBy("t").agg(
        F.count(F.lit(1)).alias("leaves"),
        F.sum(1 - F.col("cens")).alias("deaths"),
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cur = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = F.sum("leaves").over(w_all) - F.coalesce(
        F.sum("leaves").over(w_prev), F.lit(0)
    )
    s = (
        g.withColumn("at_risk", at_risk)
        .withColumn(
            "term",
            F.when(
                F.col("deaths") < F.col("at_risk"),
                F.round(
                    F.log(
                        1
                        - F.col("deaths").cast("double")
                        / F.col("at_risk").cast("double")
                    ),
                    12,
                ),
            ),
        )
        .withColumn(
            "zf", F.when(F.col("deaths") >= F.col("at_risk"), 1).otherwise(0)
        )
    )
    logs = F.coalesce(F.sum("term").over(w_cur), F.lit(0.0))
    anyzero = F.max("zf").over(w_cur)
    survival = F.when(anyzero == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(logs), dp)
    )
    return s.select(
        "t",
        F.col("at_risk").cast("long").alias("at_risk"),
        "deaths",
        "leaves",
        survival.alias("survival"),
    )
