"""Poisson bootstrap: distributed confidence intervals without
resampling passes.

The classic n-out-of-n bootstrap needs B full resamples — unusable at
100 TB.  The Poisson bootstrap (each row enters resample b with weight
~ Poisson(1), independently per row) is the standard massive-data
substitute: one streaming pass computes ALL B resample statistics,
because each row's B weights are a pure function of (row id, b).

Determinism contract: each row gets ONE md5 seed, each resample b an
affine universal-hash mix of it, and the weight inverts the Poisson(1)
CDF at the mixed u — with the CDF thresholds written as exact double
literals, the same row gets the same weight in any engine, and every
resample mean is oracle-checkable bit-for-bit (no RNG state, no
Date.now, nothing driver-side).

Scale: the ×B explode is map-only and immediately combines: the
shuffle carries B partial-sum rows per map task, and the result is B
rows total.  B=32-64 gives stable p5/p95 bands for means; widen B, not
the data passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ubw_spark.operators.dedup import portable_hash

__all__ = ["row_seed", "poisson_weight", "bootstrap_means", "POISSON1_CDF"]

#: Cumulative Poisson(1) probabilities for k = 0..6 (k=7 is the tail),
#: as exact double literals mirrored by the SQL oracles: Σ e⁻¹/k!.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
]


def row_seed(id_col: Column) -> Column:
    """One md5 per ROW (not per resample): the 32-bit seed every
    resample's draw derives from.  Hashing once and mixing per-b is the
    same one-hash-k-transforms trick minhash_signature uses
    (operators/dedup.py::_hash_params) — at B=32 it cuts the md5 count
    ×32, which IS the bootstrap's hot loop."""
    return portable_hash(
        F.concat(F.lit("boot:"), id_col.cast("string"))
    )


def poisson_weight(seed_col: Column, b: Column | int) -> Column:
    """The deterministic Poisson(1) weight of a row in resample ``b``:
    u = ((seed·(2b+1) + 104729·b + 17) mod 2³²) / 2³² inverted through
    the CDF table — the closed-form universal-hash family (a = 2b+1
    odd, b-dependent offset; dedup._hash_params) over the row's md5
    seed, so the draw stays a pure integer function of (id, b) that
    any engine reproduces.  ``b`` may be a literal or the exploded
    resample-index column."""
    # b in LONG: the 32-bit default would wrap b*104729 negative past
    # b ≈ 20.5k while the BIGINT oracle doesn't — silent cross-engine
    # divergence exactly where "widen B" is the documented advice.
    b_col = (F.lit(b) if isinstance(b, int) else b).cast("long")
    mixed = F.pmod(
        seed_col * (b_col * 2 + 1) + (b_col * 104_729 + 17),
        F.lit(4294967296),
    )
    u = mixed.cast("double") / F.lit(4294967296.0)
    w: Column = F.lit(7)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_means(
    df: DataFrame,
    id_col: str,
    value_col: str,
    *,
    b_resamples: int = 32,
    group_cols: list[str] | None = None,
    dp: int = 6,
) -> DataFrame:
    """B Poisson-bootstrap resample means of an integer-grain value:
    ``(group_cols…, b, n_eff, mean)`` per resample, where n_eff = Σ
    weights and mean = Σ w·x / Σ w (exact integer sums, one mirrored
    division, rounded ``dp``).  The spread of the B means IS the
    sampling distribution of the mean — read p5/p95 off it for a CI.

    ``group_cols`` stratifies: each segment (experiment arm, tenant)
    gets its own B resample means from the SAME single pass — the
    per-arm CI readout of an A/B test.  A unit's weight in resample b
    depends only on (id, b), so a unit moving between segments keeps
    its draws.

    One pass: explode b = 0..B−1 per row (map-only), weight, and
    aggregate — the shuffle carries groups×B rows of partial sums."""
    if b_resamples < 2:
        raise ValueError(f"need b_resamples >= 2; got {b_resamples}")
    group_cols = list(group_cols or [])
    # NULL ids are excluded, not just NULL values: a NULL id hashes to
    # a NULL seed, every CDF comparison is NULL, and the cascade's
    # otherwise-branch would hand the row the MAXIMUM weight 7 in every
    # resample — a silent upward bias instead of a missing row.
    x = F.col(value_col).cast("long")
    rows = df.where(x.isNotNull() & F.col(id_col).isNotNull()).select(
        *group_cols, row_seed(F.col(id_col)).alias("__h"), x.alias("__x")
    )
    fan = rows.select(
        *group_cols,
        "__h",
        "__x",
        F.explode(
            F.array(*[F.lit(b) for b in range(b_resamples)])
        ).alias("b"),
    )
    weighted = fan.select(
        *group_cols,
        "b",
        poisson_weight(F.col("__h"), F.col("b")).alias("__w"),
        "__x",
    )
    agg = weighted.groupBy(*group_cols, "b").agg(
        F.sum("__w").cast("long").alias("n_eff"),
        F.sum(F.col("__w").cast("long") * F.col("__x")).alias("__wx"),
    )
    mean = F.when(
        F.col("n_eff") > 0,
        F.round(
            F.col("__wx").cast("double") / F.col("n_eff").cast("double"), dp
        ),
    )
    return agg.select(*group_cols, "b", "n_eff", mean.alias("mean"))
