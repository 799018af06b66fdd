"""Distributed global ranking / ntile — the scale-safe replacement for
unpartitioned ``Window.orderBy(...)`` analytics.

A global ``row_number()``/``ntile()`` window with no PARTITION BY funnels
the whole table through ONE task (Spark logs ``WindowExec: No Partition
Defined``) — a non-starter at 100 TB.  This module computes the same
answers with the **two-phase prefix-sum** pattern (same shape as
``operators/packing.py``):

1. bucket rows by a deterministic VALUE range of the sort key (width
   derived from one 3-scalar aggregate: min, max, count — a driver
   action on one row, not a collect of data);
2. per-bucket row counts → cumulative offsets over the bucket ledger
   (a window over ≤ ``num_buckets`` rows — intentionally tiny);
3. broadcast the offsets back; finish with ``row_number()`` over a
   window PARTITIONED BY BUCKET — each task sorts one bucket.

Bucketing by value (not ``spark_partition_id`` after
``repartitionByRange``) matters for correctness: the bucket id is a pure
function of the row, so when Spark recomputes the input subtree on both
sides of the ledger self-join the assignment cannot drift, whereas
range-partitioner sampling is not guaranteed stable across recomputes.

Skew caveat: a single hot value lands in one bucket, same as any
value-bucketed prefix sum; acceptable for rank keys (prices, scores)
which are near-continuous.  Reference parity: windowed rank/quartile
reports (reference doc-02.md pagination+order surface); semantics are
ANSI ``ntile``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


_RESERVED = ("__bucket", "__offset", "__rank")


def _is_float(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes).get(col) in ("float", "double")


def _key_stats(df: DataFrame, value_col: str):
    """(min, max, count) of the sort key — ONE aggregate action returning
    a single 3-scalar row to the driver.  NOTE: this is an EAGER action
    (triggers a scan of ``df``'s subtree at build time, before the
    caller's own action); persist the input first if that subtree is
    expensive, since the rank phase scans it again.

    NaN keys are excluded from min/max (F.max returns NaN if ANY key is
    NaN, which would poison the bucket width — every row would collapse
    into one bucket, silently recreating the single-task sort); they
    still count toward the row total and get their own bucket in
    :func:`distributed_rank`."""
    col = F.col(value_col)
    if _is_float(df, value_col):
        col = F.when(~F.isnan(col), col)  # NaN → NULL, ignored by min/max
    return df.agg(F.min(col), F.max(col), F.count(F.lit(1))).first()


def distributed_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    *,
    num_buckets: int = 256,
    rank_name: str = "rank",
    _stats=None,
) -> DataFrame:
    """Exact 1-based ``row_number() OVER (ORDER BY value_col,
    tiebreak_col)`` without a single-partition window.  ``tiebreak_col``
    must be unique (row_number over a unique key == rank == dense_rank,
    which keeps the result deterministic).  Adds ``rank_name``.

    NULL sort keys rank first (Spark's ASC NULLS FIRST window default):
    they get a dedicated bucket ordered before every value bucket.  NaN
    keys rank last (Spark orders NaN above every real value): dedicated
    bucket ``num_buckets``, ordered after every value bucket, tiebreak
    deciding within.  Builds eagerly (see :func:`_key_stats`)."""
    taken = set(_RESERVED) & set(df.columns)
    if taken:
        raise ValueError(f"input columns collide with reserved names: {sorted(taken)}")
    lo, hi, n = _stats if _stats is not None else _key_stats(df, value_col)
    if n == 0 or n is None:
        return df.withColumn(rank_name, F.lit(None).cast("long"))
    if lo is None:  # every non-NaN sort key is NULL
        value_bucket = F.lit(-1)
    else:
        width = (float(hi) - float(lo)) / num_buckets or 1.0
        value_bucket = F.least(
            F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)),
            F.lit(num_buckets - 1),
        )
    bucket = F.when(F.col(value_col).isNull(), F.lit(-1))
    if _is_float(df, value_col):
        bucket = bucket.when(F.isnan(F.col(value_col)), F.lit(num_buckets))
    bucket = bucket.otherwise(value_bucket).cast("long")
    t = df.withColumn("__bucket", bucket)

    counts = t.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    # Ledger cumsum: ≤ num_buckets rows through one narrow window.
    ledger = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(ledger), F.lit(0)).alias("__offset"),
    )

    within = Window.partitionBy("__bucket").orderBy(value_col, tiebreak_col)
    return (
        t.join(broadcast(offsets), "__bucket")
        .withColumn(
            rank_name,
            (F.row_number().over(within) + F.col("__offset")).cast("long"),
        )
        .drop("__bucket", "__offset")
    )


def ntile_from_rank(rank: Column, n_rows: int, n_tiles: int) -> Column:
    """ANSI ``ntile(n_tiles)`` bucket from a 1-based global rank and the
    total row count: the first ``n_rows % n_tiles`` buckets take
    ``n_rows // n_tiles + 1`` rows, the rest one fewer — identical to
    Spark's and DuckDB's ntile.  Pure arithmetic on plan literals."""
    q, rem = divmod(int(n_rows), int(n_tiles))
    big = q + 1  # size of each of the first `rem` buckets
    head = rem * big  # rows covered by the big buckets
    in_head = (F.floor((rank - 1) / F.lit(big)) + 1).cast("int")
    in_tail = (
        F.lit(rem) + F.floor((rank - F.lit(head) - 1) / F.lit(max(q, 1))) + 1
    ).cast("int")
    return F.when(rank <= F.lit(head), in_head).otherwise(in_tail)


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    value_col: str,
    tiebreak_col: str,
    *,
    num_buckets: int = 256,
    tile_name: str = "tile",
) -> DataFrame:
    """Exact ``ntile(n_tiles) OVER (ORDER BY value_col, tiebreak_col)``
    via :func:`distributed_rank` — every window in the plan is either
    partitioned or over the tiny bucket ledger."""
    stats = _key_stats(df, value_col)
    n = stats[2]
    if not n:
        return df.withColumn(tile_name, F.lit(None).cast("int"))
    ranked = distributed_rank(
        df,
        value_col,
        tiebreak_col,
        num_buckets=num_buckets,
        rank_name="__rank",
        _stats=stats,
    )
    return ranked.withColumn(
        tile_name, ntile_from_rank(F.col("__rank"), n, n_tiles)
    ).drop("__rank")
