"""Multi-touch attribution: credit conversions across the touchpoints
that preceded them.

The standard marketing-analytics shape: each conversion (purchase)
closes a JOURNEY — the touch events (views, clicks) since the user's
previous conversion — and position-based ("U-shaped") attribution
splits the credit 40/20/40 across first / middle / last touches.

Credits are INTEGER MILLI-CREDITS (1000 per conversion; middles share
200 via integral division — the pagerank_fixed fixed-point discipline):
summing floats across engines drifts by summation order, while BIGINT
sums are exact, so the per-channel totals oracle bit-identically.  The
integral split leaks ≤ (n-3) milli per many-touch journey, documented
and bounded.

Spark shape: journey assignment is one per-user running count window
(purchases strictly before the row), the converted-journey filter is a
(user, journey)-keyed semi-ish join against the closing purchases, and
positioning is a per-(user, journey) window — every window partitioned,
shuffles keyed on the user.  At 100 TB this is the sessionize shape
with a join in the middle; nothing is corpus-global.

Reference parity: extends the events/window vocabulary (SURVEY.md
§2.5/§2.9) with the attribution report; no equivalent exists in the
reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def position_attribution(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    convert_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
) -> DataFrame:
    """Per-touch rows with ``credit_milli``: 1000 for a lone touch,
    500/500 for two, else 400 / (200 div (n-2)) each / 400 —
    first / middles / last by time within the converted journey.
    Unconverted journeys (touches after the user's final purchase)
    earn nothing and are dropped."""
    order = [ts_col, id_col]
    e = events.where(
        F.col(type_col).isin(convert_type, *touch_types)
    ).select(user_col, id_col, ts_col, type_col)
    seq = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = e.withColumn(
        "__jny",
        F.count(
            F.when(F.col(type_col) == convert_type, F.lit(1))
        ).over(seq),
    )
    purchases = j.where(F.col(type_col) == convert_type).select(
        user_col, "__jny"
    )
    touches = j.where(F.col(type_col) != convert_type).join(
        purchases, [user_col, "__jny"]
    )
    pos = Window.partitionBy(user_col, "__jny").orderBy(*order)
    grp = Window.partitionBy(user_col, "__jny")
    ranked = touches.select(
        user_col,
        id_col,
        ts_col,
        type_col,
        F.row_number().over(pos).alias("__rn"),
        F.count(F.lit(1)).over(grp).alias("__n"),
    )
    credit = (
        F.when(F.col("__n") == 1, F.lit(1000))
        .when(F.col("__n") == 2, F.lit(500))
        .when(F.col("__rn") == 1, F.lit(400))
        .when(F.col("__rn") == F.col("__n"), F.lit(400))
        .otherwise(F.expr("200 div (__n - 2)"))
    )
    return ranked.select(
        user_col,
        id_col,
        ts_col,
        type_col,
        credit.cast("long").alias("credit_milli"),
    )
