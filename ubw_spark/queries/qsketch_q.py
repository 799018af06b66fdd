"""Quantile-histogram sketch queries (operators/qsketch.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.qsketch import (
    append_hist_batch,
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

_EST_SQL = f"""
WITH {_CELLS_SQL},
c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM cells),
n AS (SELECT sum(cnt) AS n FROM cells),
q AS (SELECT * FROM (VALUES (500), (900), (990)) t(q_milli)),
pick AS (SELECT q.q_milli, n.n, min(c.bin) AS bin
         FROM q, c, n
         WHERE c.cum::DOUBLE >= (q.q_milli::DOUBLE * n.n::DOUBLE) / 1000
         GROUP BY 1, 2),
x AS (SELECT pick.q_milli, pick.n, pick.bin, c.cnt, c.cum
      FROM pick JOIN c ON pick.bin = c.bin)
SELECT q_milli, CAST(n AS BIGINT) AS n,
       round({_LO} + (bin::DOUBLE
                      + ((q_milli::DOUBLE * n::DOUBLE) / 1000
                         - (cum - cnt)::DOUBLE) / cnt::DOUBLE)
                     * (({_HI} - {_LO}) / {_NBINS}), 6) AS est
FROM x
"""


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

    path = "/tmp/ubw_spark_qh_store_" + hashlib.md5(
        sf_dir.encode()
    ).hexdigest()[:10]
    o = _cents_orders(spark, sf_dir)
    parity = F.coalesce(F.pmod(F.col("o_orderkey"), F.lit(2)), F.lit(0))
    write_hist_store(
        hist_build(
            o.where(parity == 0), "cents", lo=_LO, hi=_HI, nbins=_NBINS
        ),
        path,
    )
    append_hist_batch(spark, o.where(parity == 1), "cents", path)
    return probe_hist_quantiles(spark, path, [500, 900, 990])
