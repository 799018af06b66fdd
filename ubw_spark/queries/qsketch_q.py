"""Quantile-histogram sketch queries (operators/qsketch.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.qsketch import (
    hist_build,
    hist_quantiles,
    probe_hist_quantiles,
    write_hist_store,
)
from ubw_spark.queries.registry import register, table

#: Pinned range for the orders total-price histogram, in CENTS.
#: o_totalprice tops out near $555k at every generated sf; the clamp
#: keeps any outlier counted in the edge bin rather than dropped.
_LO, _HI, _NBINS = 0, 60_000_000, 256

_CELLS_SQL = f"""
v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders WHERE o_totalprice IS NOT NULL),
cells AS (SELECT CAST(least(greatest(((c - {_LO}) * {_NBINS})
                                     // ({_HI} - {_LO}), 0),
                            {_NBINS - 1}) AS INTEGER) AS bin,
                 count(*)::BIGINT AS cnt
          FROM v GROUP BY 1)
"""

def _est_sql(cells_cte: str, lo: int, hi: int, nbins: int, qs: list[int]) -> str:
    """The DuckDB twin of qsketch.hist_quantiles over a ``cells`` CTE
    (must expose (bin, cnt)) — the interpolation arithmetic is mirrored
    literally, so any query that builds cells this way oracles exactly."""
    values = ", ".join(f"({q})" for q in qs)
    return f"""
WITH {cells_cte},
c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM cells),
n AS (SELECT sum(cnt) AS n FROM cells),
q AS (SELECT * FROM (VALUES {values}) t(q_milli)),
pick AS (SELECT q.q_milli, n.n, min(c.bin) AS bin
         FROM q, c, n
         WHERE c.cum::DOUBLE >= (q.q_milli::DOUBLE * n.n::DOUBLE) / 1000
         GROUP BY 1, 2),
x AS (SELECT pick.q_milli, pick.n, pick.bin, c.cnt, c.cum
      FROM pick JOIN c ON pick.bin = c.bin)
SELECT q_milli, CAST(n AS BIGINT) AS n,
       round({lo} + (bin::DOUBLE
                      + ((q_milli::DOUBLE * n::DOUBLE) / 1000
                         - (cum - cnt)::DOUBLE) / cnt::DOUBLE)
                     * (({hi} - {lo}) / {nbins}), 6) AS est
FROM x
"""


_EST_SQL = _est_sql(_CELLS_SQL, _LO, _HI, _NBINS, [500, 900, 990])


def _cents_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )


@register(
    "sketch_quantile_histogram",
    oracle=f"WITH {_CELLS_SQL} SELECT bin, cnt FROM cells",
    tags=("sketch", "agg"),
)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The histogram cells themselves, oracled cell-for-cell: exact
    integer bucketize of order totals (cents) into 256 pinned-range
    bins.

    Scale: map-only bucketize + a groupBy bounded at nbins keys —
    the shuffle carries the sketch, not the table."""
    return hist_build(
        _cents_orders(spark, sf_dir), "cents", lo=_LO, hi=_HI, nbins=_NBINS
    )


@register(
    "sketch_quantile_estimate",
    oracle=_EST_SQL,
    tags=("sketch", "agg", "window"),
)
def sketch_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of order totals from the 256-cell sketch: cumulative
    counts over the re-aggregated cells, then mirrored linear
    interpolation inside the picked bin — deterministic error under one
    bin width (~$2.3k here) without sorting the table.

    Scale: the cumulative window runs on ≤nbins aggregated rows (lint-
    grounded); the quantile targets ride a broadcast of a one-row
    aggregate exploded to three rows."""
    cells = hist_build(
        _cents_orders(spark, sf_dir), "cents", lo=_LO, hi=_HI, nbins=_NBINS
    )
    return hist_quantiles(cells, [500, 900, 990])


@register(
    "sketch_quantile_store_probe",
    oracle=_EST_SQL,
    tags=("sketch", "index", "llm"),
)
def sketch_quantile_store_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PERSISTED lifecycle (10th versioned store): histogram HALF
    the orders (even keys), write the store, ADD-merge-append the odd
    half, estimate from the store — and the oracle is the in-memory
    estimate over the FULL table: write → append → load must not move
    an estimate by one ulp (hist(A∪B) == hist(A)+hist(B) exactly).

    Scale: every store step moves ≤nbins cells; each half is scanned
    once to build its own cells and never re-read."""
    import hashlib

    from ubw_spark.operators.iterate import truncate
    from ubw_spark.operators.qsketch import (
        append_hist_cells,
        grouped_hist_build,
    )

    path = "/tmp/ubw_spark_qh_store_" + hashlib.md5(
        sf_dir.encode()
    ).hexdigest()[:10]
    o = _cents_orders(spark, sf_dir)
    parity = F.coalesce(F.pmod(F.col("o_orderkey"), F.lit(2)), F.lit(0))
    # ONE corpus pass (round 13, guide §1.2): both halves' cells come
    # from a single parity-grouped histogram build (≤ 2·nbins rows
    # materialized) instead of two full orders scans; filtering the
    # grouped cells by parity is cell-for-cell the per-half build.
    cells = grouped_hist_build(
        o.withColumn("__par", parity), ["__par"], "cents",
        lo=_LO, hi=_HI, nbins=_NBINS,
    )
    cells = truncate(cells, "local", eager=False)
    half = lambda p: cells.where(F.col("__par") == p).select(  # noqa: E731
        "bin", "cnt"
    )
    write_hist_store(half(0), path)
    append_hist_cells(spark, half(1), path)
    return probe_hist_quantiles(spark, path, [500, 900, 990])


#: Conversion latency range: [0, 2 days) in MICROSECONDS, 15-minute bins.
_LAT_LO, _LAT_HI, _LAT_NBINS = 0, 2 * 24 * 3600 * 1_000_000, 192

_LAT_CELLS_SQL = f"""
u AS (SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS s
      FROM events GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS p
      FROM events e JOIN u ON e.user_id = u.user_id
      WHERE e.event_type = 'purchase' AND u.s IS NOT NULL
        AND e.ts >= u.s
      GROUP BY 1),
lat AS (SELECT epoch_us(p.p) - epoch_us(u.s) AS c
        FROM u JOIN p ON u.user_id = p.user_id),
cells AS (SELECT CAST(least(greatest(((c - {_LAT_LO}) * {_LAT_NBINS})
                                     // ({_LAT_HI} - {_LAT_LO}), 0),
                            {_LAT_NBINS - 1}) AS INTEGER) AS bin,
                 count(*)::BIGINT AS cnt
          FROM lat GROUP BY 1)
"""


@register(
    "events_conversion_latency_quantiles",
    oracle=_est_sql(_LAT_CELLS_SQL, _LAT_LO, _LAT_HI, _LAT_NBINS, [500, 900]),
    tags=("events", "sketch", "engagement"),
)
def events_conversion_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """p50/p90 signup→first-purchase latency via the quantile sketch —
    two operator families composed: the funnel pairing derives an
    integer-grain latency (microseconds), the fixed-bin histogram turns
    it into percentile estimates with deterministic <15-minute error
    and nbins of state.

    Scale: first-signup is one per-user aggregate; first-purchase-after
    is one filtered join + aggregate keyed on user; the latency column
    then collapses to 192 cells before any quantile math."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("s")
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(u.where(F.col("s").isNotNull()), "user_id")
        .where(F.col("ts") >= F.col("s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    lat = u.join(p, "user_id").select(
        (F.unix_micros("p") - F.unix_micros("s")).alias("lat_us")
    )
    cells = hist_build(
        lat, "lat_us", lo=_LAT_LO, hi=_LAT_HI, nbins=_LAT_NBINS
    )
    return hist_quantiles(cells, [500, 900])


@register(
    "sketch_grouped_quantiles",
    oracle=f"""
    WITH v AS (SELECT o_orderpriority AS priority,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS c
               FROM orders WHERE o_totalprice IS NOT NULL),
    cells AS (SELECT priority,
                     CAST(least(greatest(((c - {_LO}) * {_NBINS})
                                         // ({_HI} - {_LO}), 0),
                                {_NBINS - 1}) AS INTEGER) AS bin,
                     count(*)::BIGINT AS cnt
              FROM v GROUP BY 1, 2),
    c AS (SELECT priority, bin, cnt,
                 sum(cnt) OVER (PARTITION BY priority ORDER BY bin) AS cum
          FROM cells),
    n AS (SELECT priority, sum(cnt) AS n FROM cells GROUP BY 1),
    q AS (SELECT * FROM (VALUES (500), (900)) t(q_milli)),
    pick AS (SELECT n.priority, q.q_milli, n.n, min(c.bin) AS bin
             FROM q, n
             JOIN c ON c.priority = n.priority
             WHERE c.cum::DOUBLE
                   >= (q.q_milli::DOUBLE * n.n::DOUBLE) / 1000
             GROUP BY 1, 2, 3),
    x AS (SELECT pick.priority, pick.q_milli, pick.n, pick.bin,
                 c.cnt, c.cum
          FROM pick JOIN c ON pick.priority = c.priority
                          AND pick.bin = c.bin)
    SELECT priority, q_milli, CAST(n AS BIGINT) AS n,
           round({_LO} + (bin::DOUBLE
                          + ((q_milli::DOUBLE * n::DOUBLE) / 1000
                             - (cum - cnt)::DOUBLE) / cnt::DOUBLE)
                         * (({_HI} - {_LO}) / {_NBINS}), 6) AS est
    FROM x
    """,
    tags=("sketch", "agg", "window"),
)
def sketch_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority p50/p90 of order totals from ONE grouped cell
    table — the per-segment SLO-monitoring shape: segments share the
    pinned range so their curves are comparable and their cells
    mergeable.

    Scale: groups×nbins cells, a per-group cumulative window (≤nbins
    rows per partition), totals joined back on the group key."""
    from ubw_spark.operators.qsketch import (
        grouped_hist_build,
        grouped_hist_quantiles,
    )

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cells = grouped_hist_build(
        o, ["priority"], "cents", lo=_LO, hi=_HI, nbins=_NBINS
    )
    return grouped_hist_quantiles(cells, ["priority"], [500, 900])


@register(
    "stats_winsorized_mean",
    oracle=f"""
    WITH e AS ({_est_sql(_CELLS_SQL, _LO, _HI, _NBINS, [990])}),
    cut AS (SELECT CAST(round(est) AS BIGINT) AS cut FROM e
            WHERE q_milli = 990),
    v2 AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
           FROM orders WHERE o_totalprice IS NOT NULL),
    w AS (SELECT v2.c, cut.cut, least(v2.c, cut.cut) AS wc
          FROM v2, cut)
    SELECT count(*)::BIGINT AS n,
           CAST(max(cut) AS BIGINT) AS cut,
           CAST(sum(CASE WHEN c > cut THEN 1 ELSE 0 END) AS BIGINT)
             AS clipped,
           round(CAST(sum(c) AS BIGINT)::DOUBLE
                 / count(*)::DOUBLE, 6) AS mean_raw,
           round(CAST(sum(wc) AS BIGINT)::DOUBLE
                 / count(*)::DOUBLE, 6) AS mean_winsorized
    FROM w
    """,
    tags=("stats", "sketch", "agg"),
)
def stats_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-robust mean of order totals: clamp at the sketch's p99
    estimate, then one exact-integer mean pass — the trimmed statistic
    without a sort, with the raw mean alongside to quantify what the
    clipping changed.

    Scale: the cut costs nbins cells; the clamp+means are one map-only
    pass; the one-row cut broadcasts."""
    from ubw_spark.operators.qsketch import winsorized_mean

    o = _cents_orders(spark, sf_dir)
    cells = hist_build(o, "cents", lo=_LO, hi=_HI, nbins=_NBINS)
    return winsorized_mean(o, "cents", cells, q_milli=990)
