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
