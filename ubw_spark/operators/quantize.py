"""Embedding quantization — the storage side of vector infrastructure:
per-vector affine int8 quantization cuts an ANN candidate store 4× (and
its shuffle/scan bytes with it) at a bounded reconstruction error of
scale/2 per dimension.

Map-only array expressions (JVM codegen, no UDF): each vector carries
its own (min, scale) so dequantization is self-contained.  Rounding is
``floor(x + 0.5)`` — explicitly, NOT ``round()`` — because engines
disagree on round-half (Spark HALF_UP, DuckDB half-even on doubles)
while floor is exact everywhere; that's what keeps the whole
quantization oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
) -> DataFrame:
    """Add int8 codes + dequant params: ``qvec`` in [-127, 127],
    ``q_min``/``q_scale`` such that x̂_i = (qvec_i + 127)·q_scale + q_min.

    Degenerate constant vectors (max == min) quantize to all-zero codes
    with scale 0 — dequant returns the constant exactly."""
    from ubw_spark.functions.hof import fence, let

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mn, mx = F.array_min(v), F.array_max(v)

    # codes: the per-element lambda references mn/scale — let-bound
    # (functions/hof.py), because unbound each of the d elements would
    # re-walk the O(d) min/max folds (O(d²) per row; no CSE inside HOF
    # lambdas).  The cast vector is bound too so it is built once.
    def codes_of(vv: F.Column) -> F.Column:
        def with_stats(s: F.Column) -> F.Column:
            lo, hi = s["mn"], s["mx"]
            sc = (hi - lo) / F.lit(254.0)
            return F.when(
                hi > lo,
                F.transform(
                    vv,
                    lambda x: (
                        F.floor((x - lo) / sc + F.lit(0.5)).cast("int")
                        - F.lit(127)
                    ),
                ),
            ).otherwise(F.transform(vv, lambda x: F.lit(0)))

        return let(
            F.struct(
                F.array_min(vv).alias("mn"), F.array_max(vv).alias("mx")
            ),
            with_stats,
        )

    # fence (scalars only): downstream predicates / join-key null checks
    # on q_min/q_scale would otherwise be pushdown-substituted and re-run
    # the min/max pipeline per row (hof_filter_violations).  The codes
    # array itself is never filtered on, and fencing it would add a
    # per-row array copy for nothing.
    return (
        df.withColumn("q_min", fence(mn))
        .withColumn(
            "q_scale",
            fence(F.when(mx > mn, (mx - mn) / F.lit(254.0)).otherwise(F.lit(0.0))),
        )
        .withColumn(out_col, let(v, codes_of))
    )


def dequantize_int8(
    df: DataFrame,
    qvec_col: str = "qvec",
    out_col: str = "dequant",
) -> DataFrame:
    """Reconstruct approximate doubles from int8 codes + params."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col),
            lambda q: (q.cast("double") + F.lit(127.0)) * F.col("q_scale")
            + F.col("q_min"),
        ),
    )
