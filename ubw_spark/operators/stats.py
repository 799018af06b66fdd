"""Grouped-map statistics via applyInPandas — the batch escape hatch
for per-group algorithms that need the whole group in memory (the
streaming twin is applyInPandasWithState in ubw_spark.streaming).

Robust stats (median / MAD / outlier counts) are the canonical case:
exact medians are rank statistics, so a distributed exact computation
either sorts per group anyway or round-trips percentile indexes; with
bounded per-group cardinality, shipping the group through Arrow into
numpy is both simpler and faster.

Scale contract: applyInPandas materializes ONE GROUP PER TASK — safe
when group count × group size is bounded (dimension-keyed groups), a
skew hazard when a single key can hold billions of rows.  For unbounded
keys use sketches (approx_percentile) instead; this operator asserts
nothing about group size, so the caller owns that bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def grouped_robust_stats(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    outlier_k: float = 3.0,
) -> DataFrame:
    """Per-group n / median / MAD / outlier count (|x - med| > k·MAD).

    Exact rank statistics per group (numpy sorts inside the Arrow
    batch); deterministic regardless of partition order.  Output
    schema: key columns + (n bigint, med double, mad double,
    n_outliers bigint)."""
    import numpy as np
    import pandas as pd

    keys = list(key_cols)
    schema = ", ".join(
        [f"`{k}` {dict(df.dtypes)[k]}" for k in keys]
        + ["n bigint", "med double", "mad double", "n_outliers bigint"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            med = mad = float("nan")
            n_out = 0
        else:
            med = float(np.median(v))
            mad = float(np.median(np.abs(v - med)))
            n_out = int((np.abs(v - med) > outlier_k * mad).sum())
        row = [pdf[k].iloc[0] for k in keys] + [len(v), med, mad, n_out]
        return pd.DataFrame([row], columns=keys + ["n", "med", "mad", "n_outliers"])

    return df.groupBy(*keys).applyInPandas(fn, schema)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx_distinct: bool = False,
) -> DataFrame:
    """Schema-driven column profile — the ANALYZE-style summary a
    catalog or data card starts from: one row per column with row
    count, null count, distinct count, and min/max (numerics as
    DOUBLE in ``min_num``/``max_num``; strings in ``min_str``/
    ``max_str`` under binary collation — both engine-portable, unlike
    engine-formatted numeric strings; other orderable types profile
    counts + distinct; maps, which Spark can neither order nor
    distinct, profile counts only).

    ONE aggregate pass over the table, then a driver-free unpivot
    (explode of a literal struct array over the single agg row).
    ``approx_distinct=True`` swaps exact count_distinct for Spark's
    HyperLogLog++ ``approx_count_distinct`` — at 100 TB the exact
    multi-column distinct plans an Expand (one projection per
    profiled column, k× the map-side rows), while the approx pass
    keeps one combiner per column; same trade the hll operator module
    makes, engine-side.  The oracle pins the exact path on the
    moderate-width part table.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    schema = {f.name: f.dataType for f in df.schema.fields}

    distinct = (
        F.approx_count_distinct if approx_distinct else F.count_distinct
    )
    # maps are unorderable (min/max) and un-distinct-able in Spark —
    # profile counts only, instead of letting one map column fail the
    # whole single-pass aggregate
    orderable = {
        c: not isinstance(schema[c], T.MapType) for c in cols
    }
    null_long = F.lit(None).cast("long")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__cnt_{c}"))
        if orderable[c]:
            aggs += [
                distinct(F.col(c)).alias(f"__dst_{c}"),
                F.min(F.col(c)).alias(f"__min_{c}"),
                F.max(F.col(c)).alias(f"__max_{c}"),
            ]
    row = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in cols:
        numeric = isinstance(schema[c], T.NumericType)
        stringy = isinstance(schema[c], T.StringType)
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n"),
                (F.col("__n") - F.col(f"__cnt_{c}")).alias("n_null"),
                (
                    F.col(f"__dst_{c}") if orderable[c] else null_long
                ).alias("n_distinct"),
                (
                    F.col(f"__min_{c}").cast("double")
                    if numeric
                    else null_d
                ).alias("min_num"),
                (
                    F.col(f"__max_{c}").cast("double")
                    if numeric
                    else null_d
                ).alias("max_num"),
                (
                    F.col(f"__min_{c}")
                    if stringy and orderable[c]
                    else null_s
                ).alias("min_str"),
                (
                    F.col(f"__max_{c}")
                    if stringy and orderable[c]
                    else null_s
                ).alias("max_str"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def benford_digits(
    df, value_col: str, *, scale: int = 1_000_000, dp: int = 6
):
    """First-significant-digit distribution vs Benford's law — the
    fabricated-data / unit-mixup audit: ``(digit, cnt, share_micro,
    expected_micro, dev_micro)`` for digits 1-9.

    The first digit comes from the STRING head of the positive
    integer-grain value (no log10 on data, so the bucketing is exact
    and engine-independent); only the CONSTANT Benford expectation
    log10(1 + 1/d) is a libm call, on the nine small integers both
    engines evaluate identically.  One map-only projection + one
    9-group aggregate with map-side combine."""
    from pyspark.sql import functions as F

    v = F.col(value_col).cast("long")
    d = (
        df.where(v.isNotNull() & (v > 0))
        .select(
            F.substring(v.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = d.agg(F.sum("cnt").alias("__n"))
    expected = F.round(
        F.log10(1 + 1 / F.col("digit").cast("double")) * scale, 0
    ).cast("long")
    return d.crossJoin(F.broadcast(total)).select(
        "digit",
        "cnt",
        F.expr(f"(cnt * {scale}) div __n").alias("share_micro"),
        expected.alias("expected_micro"),
        (
            F.expr(f"(cnt * {scale}) div __n") - expected
        ).alias("dev_micro"),
    )
