"""Poisson-bootstrap queries (operators/bootstrap.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.bootstrap import POISSON1_CDF, bootstrap_means
from ubw_spark.queries.registry import register, table

_B = 32

#: The CDF cascade as SQL, generated from the same constant table the
#: Spark side inverts — one source of truth for the thresholds.
#: ``e0`` suffix: a bare decimal literal is DECIMAL in DuckDB — the
#: exponent forces DOUBLE, whose parse of the repr round-trips to the
#: exact bits Spark's lit() carries.
_CDF_CASE = (
    "CASE "
    + " ".join(
        f"WHEN u < {t!r}e0 THEN {k}" for k, t in enumerate(POISSON1_CDF)
    )
    + " ELSE 7 END"
)

_BOOT_SQL = f"""
WITH r AS (SELECT o_orderkey AS id,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS x
           FROM orders WHERE o_totalprice IS NOT NULL),
h AS (SELECT x, ('0x' || substr(md5('boot:' || id::VARCHAR),
                                1, 8))::BIGINT AS h
      FROM r),
f AS (SELECT h, x, unnest(generate_series(0, {_B - 1})) AS b FROM h),
u AS (SELECT b, x,
             ((h * (b * 2 + 1) + (b * 104729 + 17))
              % 4294967296)::DOUBLE / 4294967296.0 AS u
      FROM f),
w AS (SELECT b, x, {_CDF_CASE} AS w FROM u),
a AS (SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
             CAST(sum(w * x) AS BIGINT) AS wx
      FROM w GROUP BY 1)
SELECT b::INTEGER AS b, n_eff,
       CASE WHEN n_eff > 0
            THEN round(wx::DOUBLE / n_eff::DOUBLE, 6) END AS mean
FROM a
"""


@register(
    "stats_bootstrap_means",
    oracle=_BOOT_SQL,
    tags=("stats", "agg", "llm"),
)
def stats_bootstrap_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32 Poisson-bootstrap resample means of the order total (cents) —
    the sampling distribution of the mean from ONE pass, no resampling
    passes, no RNG state: every weight is a pure md5 function of
    (resample index, order key), so all 32 means oracle bit-for-bit.

    Scale: the ×32 explode is map-only and combines immediately — the
    shuffle carries 32 partial-sum rows per task and the result is 32
    rows; read p5/p95 off them for the CI."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return bootstrap_means(o, "o_orderkey", "cents", b_resamples=_B)


_AB_BOOT_SQL = f"""
WITH u AS (SELECT user_id,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS spend
           FROM events GROUP BY 1),
r AS (SELECT CAST(user_id % 2 AS BIGINT) AS variant, user_id AS id,
             spend AS x
      FROM u),
h AS (SELECT variant, x,
             ('0x' || substr(md5('boot:' || id::VARCHAR), 1, 8))::BIGINT
               AS h
      FROM r),
f AS (SELECT variant, h, x,
             unnest(generate_series(0, {_B - 1})) AS b FROM h),
uu AS (SELECT variant, b, x,
              ((h * (b * 2 + 1) + (b * 104729 + 17))
               % 4294967296)::DOUBLE / 4294967296.0 AS u
       FROM f),
w AS (SELECT variant, b, x, {_CDF_CASE} AS w FROM uu),
a AS (SELECT variant, b, CAST(sum(w) AS BIGINT) AS n_eff,
             CAST(sum(w * x) AS BIGINT) AS wx
      FROM w GROUP BY 1, 2)
SELECT variant, b::INTEGER AS b, n_eff,
       CASE WHEN n_eff > 0
            THEN round(wx::DOUBLE / n_eff::DOUBLE, 6) END AS mean
FROM a
"""


@register(
    "stats_bootstrap_by_variant",
    oracle=_AB_BOOT_SQL,
    tags=("stats", "events", "agg"),
)
def stats_bootstrap_by_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm bootstrap: 32 resample means of per-user purchase spend
    for EACH experiment variant, from one pass — the distribution-free
    CI readout an A/B dashboard overlays on the CUPED point estimates.

    Scale: the per-user reduction map-combines; the ×32 explode
    aggregates to variants×32 rows; a unit's draws depend only on
    (id, b), so segment membership never perturbs the resampling."""
    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("long"),
            ).otherwise(0)
        ).alias("spend")
    ).select(
        (F.col("user_id") % 2).cast("long").alias("variant"),
        "user_id",
        "spend",
    )
    return bootstrap_means(
        units, "user_id", "spend",
        b_resamples=_B, group_cols=["variant"],
    )
