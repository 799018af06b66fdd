"""Time-series regularization queries (operators/timeseries.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.timeseries import gapfill, resample, time_grid
from ubw_spark.queries.registry import register, table

#: Window fragments shared by the four anchor lookups — DuckDB's
#: last_value/first_value with IGNORE NULLS mirror Spark's
#: last(ignorenulls)/first(ignorenulls) frame-for-frame.
_BACK = (
    "OVER (PARTITION BY user_id ORDER BY h "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)
_FWD = (
    "OVER (PARTITION BY user_id ORDER BY h "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
)


@register(
    "ts_gapfill_interpolate",
    oracle=f"""
    WITH e AS (SELECT user_id, ts, value FROM events
               WHERE user_id % 10 = 0),
    obs AS (SELECT user_id, date_trunc('hour', ts) AS h,
                   CAST(round(sum(value) * 100) AS BIGINT) AS cents
            FROM e GROUP BY 1, 2),
    bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1
               FROM obs GROUP BY 1),
    grid AS (SELECT user_id,
                    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             FROM bounds),
    g AS (SELECT grid.user_id, grid.h, obs.cents
          FROM grid LEFT JOIN obs USING (user_id, h)),
    w AS (SELECT user_id, h, cents,
            last_value(cents IGNORE NULLS) {_BACK} AS pv,
            last_value(CASE WHEN cents IS NOT NULL THEN h END
                       IGNORE NULLS) {_BACK} AS pt,
            first_value(cents IGNORE NULLS) {_FWD} AS nv,
            first_value(CASE WHEN cents IS NOT NULL THEN h END
                        IGNORE NULLS) {_FWD} AS nt
          FROM g)
    SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, cents,
           pv AS ffill_cents,
           round(CASE WHEN cents IS NOT NULL THEN cents::DOUBLE
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                 THEN pv::DOUBLE + (nv - pv)::DOUBLE
                      * (epoch(h) - epoch(pt))::DOUBLE
                      / (epoch(nt) - epoch(pt))::DOUBLE
                 ELSE coalesce(pv, nv)::DOUBLE END, 6) AS interp_cents
    FROM w
    """,
    tags=("timeseries", "window", "llm"),
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize a sampled slice of the event stream (15 of 150 users)
    to a dense per-user hourly series: bucket-aggregate spend to cents,
    explode each user's [first, last] hour span, then forward-fill AND
    linearly interpolate the gap hours between observed anchors.

    Scale: the grid explode and every window are PER USER — span/step
    rows per key regardless of corpus size; the bucket aggregate has
    map-side combine, so a hot user costs one combiner, not a sort of
    raw events.  Values are pinned to long cents BEFORE interpolating
    and the fraction's association is mirrored literally by the oracle
    (pv + (nv - pv) * dt / dT, all double), rounded 6dp."""
    e = table(spark, sf_dir, "events").where(F.col("user_id") % 10 == 0)
    obs = resample(
        e,
        ["user_id"],
        "ts",
        step="hour",
        aggs=[F.round(F.sum("value") * 100, 0).cast("long").alias("cents")],
    )
    dense = time_grid(obs, ["user_id"], "ts", step="1 hour")
    filled = gapfill(
        dense,
        ["user_id"],
        "ts",
        "cents",
        ffill_col="ffill_cents",
        interp_col="interp_cents",
    )
    return filled.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "cents",
        "ffill_cents",
        "interp_cents",
    )
