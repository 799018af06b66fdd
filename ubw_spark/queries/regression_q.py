"""Closed-form statistics queries (operators/regression.py).

All three are the sufficient-statistics shape: exact integer sums in
one aggregate pass, floats only at the final mirrored division — so the
DuckDB oracles are bit-exact, not tolerance checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.regression import (
    correlation_matrix,
    groupwise_ols,
    two_proportion_z,
)
from ubw_spark.queries.registry import register, table

_OLS_SQL = """
WITH s AS (
  SELECT p.p_brand AS brand,
         CAST(round(l.l_quantity * 1) AS HUGEINT) AS x,
         CAST(round(l.l_extendedprice * 100) AS HUGEINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
a AS (SELECT brand, count(*)::HUGEINT AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
      FROM s GROUP BY 1),
d AS (SELECT brand, n, sx, sy,
             n*sxy - sx*sy AS num,
             n*sxx - sx*sx AS den,
             n*syy - sy*sy AS deny
      FROM a)
SELECT brand, n::BIGINT AS n,
  CASE WHEN den <> 0
       THEN round(num::DOUBLE / den::DOUBLE, 6) END AS slope,
  CASE WHEN den <> 0
       THEN round((sy::DOUBLE - (num::DOUBLE / den::DOUBLE)
                   * sx::DOUBLE) / n::DOUBLE, 6) END AS intercept,
  CASE WHEN den <> 0 AND deny <> 0
       THEN round((num::DOUBLE * num::DOUBLE)
                  / (den::DOUBLE * deny::DOUBLE), 6) END AS r2
FROM d
"""


@register(
    "stats_groupwise_ols",
    oracle=_OLS_SQL,
    tags=("stats", "agg", "llm"),
)
def stats_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS fit of extended price (cents) on quantity — the
    classic "is this dimension's pricing linear in volume" readout.

    Scale: part is the dimension side and broadcasts; the fact scan
    reduces to 6 exact decimal sums per brand with map-side combine, so
    the shuffle carries O(brands) rows.  Slope/intercept/r² are single
    mirrored double divisions over those exact sums (rounded 6dp) —
    the same fixed-point-then-divide recipe as pagerank_fixed."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"), "l_quantity", "l_extendedprice"
    )
    return groupwise_ols(
        j, ["brand"], "l_quantity", "l_extendedprice",
        x_scale=1, y_scale=100,
    )


_CORR_SPECS = [
    ("qty", "l_quantity", 1),
    ("price", "l_extendedprice", 100),
    ("disc", "l_discount", 100),
    ("tax", "l_tax", 100),
]


def _corr_pair_sql(a: str, b: str) -> str:
    da = f"(n*p_{a}_{a} - s_{a}*s_{a})"
    db = f"(n*p_{b}_{b} - s_{b}*s_{b})"
    num = f"(n*p_{a}_{b} - s_{a}*s_{b})"
    return f"""
    SELECT '{a}' AS col_x, '{b}' AS col_y, n::BIGINT AS n,
           CASE WHEN {da} <> 0 AND {db} <> 0
                THEN round({num}::DOUBLE
                           / sqrt({da}::DOUBLE * {db}::DOUBLE), 6)
           END AS corr
    FROM a"""


_CORR_SQL = (
    """
WITH s AS (SELECT CAST(round(l_quantity * 1) AS HUGEINT) AS qty,
                  CAST(round(l_extendedprice * 100) AS HUGEINT) AS price,
                  CAST(round(l_discount * 100) AS HUGEINT) AS disc,
                  CAST(round(l_tax * 100) AS HUGEINT) AS tax
           FROM lineitem),
a AS (SELECT count(*)::HUGEINT AS n, """
    + ", ".join(f"sum({n}) AS s_{n}" for n, _, _ in _CORR_SPECS)
    + ", "
    + ", ".join(
        f"sum({_CORR_SPECS[i][0]}*{_CORR_SPECS[j][0]}) "
        f"AS p_{_CORR_SPECS[i][0]}_{_CORR_SPECS[j][0]}"
        for i in range(len(_CORR_SPECS))
        for j in range(i, len(_CORR_SPECS))
    )
    + " FROM s)\n"
    + " UNION ALL ".join(
        _corr_pair_sql(_CORR_SPECS[i][0], _CORR_SPECS[j][0])
        for i in range(len(_CORR_SPECS))
        for j in range(i + 1, len(_CORR_SPECS))
    )
)


@register(
    "stats_correlation_matrix",
    oracle=_CORR_SQL,
    tags=("stats", "agg"),
)
def stats_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations among the four lineitem numeric
    columns (quantity, price-in-cents, discount/tax in basis points) —
    the feature-screening pass before any modeling work.

    Scale: ONE aggregate pass reducing the whole table to a single row
    of k(k+3)/2 exact integer sums (map-side combine), then the 6 pair
    rows are exploded from that row — no second scan, no join.  sqrt is
    the only libm call and IEEE defines it correctly-rounded, so the
    oracle is still exact."""
    l = table(spark, sf_dir, "lineitem")
    return correlation_matrix(l, _CORR_SPECS)


#: The pooled rate, inlined wherever the z formula needs it (the oracle
#: mirrors the Spark expression tree literally, including repeats).
_POOL = "((x_a::DOUBLE + x_b::DOUBLE) / (n_a::DOUBLE + n_b::DOUBLE))"

_AB_SQL = f"""
WITH u AS (SELECT user_id,
                  sum(CASE WHEN event_type = 'purchase' AND value > 80
                      THEN 1 ELSE 0 END) AS big
           FROM events GROUP BY user_id),
c AS (SELECT CAST(user_id % 2 AS BIGINT) AS variant,
             CASE WHEN big >= 3 THEN 1 ELSE 0 END AS conv
      FROM u),
v AS (SELECT variant, count(*)::BIGINT AS n, sum(conv)::BIGINT AS x
      FROM c GROUP BY 1),
a AS (SELECT n AS n_a, x AS x_a FROM v WHERE variant = 0),
b AS (SELECT n AS n_b, x AS x_b FROM v WHERE variant = 1)
SELECT n_a, x_a, n_b, x_b,
  round(x_a::DOUBLE / n_a::DOUBLE, 6) AS rate_a,
  round(x_b::DOUBLE / n_b::DOUBLE, 6) AS rate_b,
  CASE WHEN {_POOL} > 0 AND {_POOL} < 1 THEN
    round((x_a::DOUBLE / n_a::DOUBLE - x_b::DOUBLE / n_b::DOUBLE)
          / sqrt({_POOL}
                 * (1 - {_POOL})
                 * (1 / n_a::DOUBLE + 1 / n_b::DOUBLE)), 6)
  END AS z
FROM a, b
"""


@register(
    "stats_ab_proportion_z",
    oracle=_AB_SQL,
    tags=("stats", "events"),
)
def stats_ab_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test readout for a deterministic 50/50 user
    split (variant = user_id mod 2, success = at least three purchases
    over 80): the experiment-dashboard primitive.

    Scale: the unit reduction (one 0/1 row per user) is a map-side
    count per user; the test statistic then lives on a 2-row aggregate,
    and pairing the variants is a broadcast of a single row.  Counts
    are exact; rates and z are mirrored double arithmetic rounded 6dp,
    NULL when the pooled variance degenerates."""
    e = table(spark, sf_dir, "events")
    units = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 80),
                    1,
                ).otherwise(0)
            ).alias("big")
        )
        .select(
            (F.col("user_id") % 2).cast("long").alias("variant"),
            F.when(F.col("big") >= 3, 1).otherwise(0).alias("conv"),
        )
    )
    return two_proportion_z(units, "variant", "conv")


_CUPED_SQL = """
WITH u AS (SELECT user_id,
        CAST(sum(CASE WHEN event_type = 'purchase'
                       AND ts < TIMESTAMP '2024-01-15'
                 THEN CAST(round(value * 100) AS BIGINT)
                 ELSE 0 END) AS HUGEINT) AS x,
        CAST(sum(CASE WHEN event_type = 'purchase'
                       AND ts >= TIMESTAMP '2024-01-15'
                 THEN CAST(round(value * 100) AS BIGINT)
                 ELSE 0 END) AS HUGEINT) AS y
      FROM events GROUP BY 1),
c AS (SELECT CAST(user_id % 2 AS BIGINT) AS variant, x, y FROM u),
pool AS (SELECT count(*)::HUGEINT AS n_all, sum(x) AS sx, sum(y) AS sy,
                sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
         FROM c),
v AS (SELECT variant, count(*)::BIGINT AS n, sum(x) AS vx, sum(y) AS vy
      FROM c GROUP BY 1),
d AS (SELECT v.variant, v.n, v.vx, v.vy,
             pool.n_all, pool.sx,
             pool.n_all*pool.sxy - pool.sx*pool.sy AS num,
             pool.n_all*pool.sxx - pool.sx*pool.sx AS den,
             pool.n_all*pool.syy - pool.sy*pool.sy AS deny
      FROM v, pool)
SELECT variant, n,
  round(vy::DOUBLE / n::DOUBLE, 6) AS mean_y,
  CASE WHEN den <> 0 THEN
    round(vy::DOUBLE / n::DOUBLE
          - (num::DOUBLE / den::DOUBLE)
            * (vx::DOUBLE / n::DOUBLE - sx::DOUBLE / n_all::DOUBLE), 6)
  END AS mean_y_adj,
  CASE WHEN den <> 0
       THEN round(num::DOUBLE / den::DOUBLE, 6) END AS theta,
  CASE WHEN den <> 0 AND deny <> 0
       THEN round((num::DOUBLE * num::DOUBLE)
                  / (den::DOUBLE * deny::DOUBLE), 6) END AS rho2
FROM d
"""


@register(
    "stats_cuped_adjusted",
    oracle=_CUPED_SQL,
    tags=("stats", "events"),
)
def stats_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout (Deng et al. 2013): per-variant
    post-period purchase means adjusted by the pre-period covariate —
    the variance-reduction standard of every large experimentation
    platform, here entirely from sufficient statistics (θ and ρ² from
    one pooled aggregate, adjusted means without materializing a single
    per-unit adjusted value).

    Scale: one per-user aggregate (map-side combine), one 1-row pooled
    aggregate broadcast onto the 2-row variant aggregate."""
    from ubw_spark.operators.regression import cuped_adjust

    e = table(spark, sf_dir, "events")
    cut = F.to_timestamp(F.lit("2024-01-15"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    is_p = F.col("event_type") == "purchase"
    units = e.groupBy("user_id").agg(
        F.sum(
            F.when(is_p & (F.col("ts") < cut), cents).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(is_p & (F.col("ts") >= cut), cents).otherwise(0)
        ).alias("y"),
    ).select(
        (F.col("user_id") % 2).cast("long").alias("variant"), "x", "y"
    )
    return cuped_adjust(units, "variant", "x", "y")


_DID_SQL = """
WITH u AS (SELECT user_id,
        CAST(sum(CASE WHEN event_type = 'purchase'
                       AND ts < TIMESTAMP '2024-01-15'
                 THEN CAST(round(value * 100) AS BIGINT)
                 ELSE 0 END) AS HUGEINT) AS x,
        CAST(sum(CASE WHEN event_type = 'purchase'
                       AND ts >= TIMESTAMP '2024-01-15'
                 THEN CAST(round(value * 100) AS BIGINT)
                 ELSE 0 END) AS HUGEINT) AS y
      FROM events GROUP BY 1),
c AS (SELECT CAST(user_id % 2 AS BIGINT) AS variant, x, y FROM u),
v AS (SELECT variant, count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy
      FROM c GROUP BY 1),
a AS (SELECT n AS n_ctl, sx AS sx_ctl, sy AS sy_ctl FROM v
      WHERE variant = 0),
b AS (SELECT n AS n_trt, sx AS sx_trt, sy AS sy_trt FROM v
      WHERE variant = 1)
SELECT n_ctl, n_trt,
  round(sx_ctl::DOUBLE / n_ctl::DOUBLE, 6) AS pre_ctl,
  round(sy_ctl::DOUBLE / n_ctl::DOUBLE, 6) AS post_ctl,
  round(sx_trt::DOUBLE / n_trt::DOUBLE, 6) AS pre_trt,
  round(sy_trt::DOUBLE / n_trt::DOUBLE, 6) AS post_trt,
  round((sy_trt::DOUBLE / n_trt::DOUBLE - sx_trt::DOUBLE / n_trt::DOUBLE)
        - (sy_ctl::DOUBLE / n_ctl::DOUBLE
           - sx_ctl::DOUBLE / n_ctl::DOUBLE), 6) AS did
FROM a, b
"""


@register(
    "stats_diff_in_diff",
    oracle=_DID_SQL,
    tags=("stats", "events"),
)
def stats_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the same pre/post purchase split
    as the CUPED readout: the treated arm's post−pre change net of the
    control arm's — the trend-robust effect estimate completing the
    experimentation suite (z-test, CUPED, per-arm bootstrap CI, DiD).

    Scale: one per-user aggregate, one 2-row variant aggregate, one
    1×1 broadcast cross."""
    from ubw_spark.operators.regression import diff_in_diff

    e = table(spark, sf_dir, "events")
    cut = F.to_timestamp(F.lit("2024-01-15"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    is_p = F.col("event_type") == "purchase"
    units = e.groupBy("user_id").agg(
        F.sum(
            F.when(is_p & (F.col("ts") < cut), cents).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(is_p & (F.col("ts") >= cut), cents).otherwise(0)
        ).alias("y"),
    ).select(
        (F.col("user_id") % 2).cast("long").alias("variant"), "x", "y"
    )
    return diff_in_diff(units, "variant", "x", "y")
