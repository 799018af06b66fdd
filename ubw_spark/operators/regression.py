"""Closed-form statistics over groups: OLS regression, correlation
matrices, and two-proportion hypothesis tests.

Everything here is a SINGLE aggregate pass in exact integer (decimal)
arithmetic, with floating point entering only at the final, literally
mirrored division — the repo's standard fixed-point recipe for
bit-identical cross-engine results (see operators/graph.py::pagerank
for the iterative variant of the same trick).

Scale posture (100 TB):

- :func:`groupwise_ols` and :func:`correlation_matrix` are one
  ``groupBy`` each, carrying 5–6 machine words per group (or
  k(k+3)/2 words for a k-column matrix) through a map-side combine —
  the shuffle volume is O(groups), never O(rows).  This is the textbook
  "sufficient statistics" decomposition: Σx, Σy, Σx², Σy², Σxy fold
  associatively, so partial aggregation does all the work where the
  data lives.
- inputs are scaled to integers (cents, basis points) BEFORE summing,
  so the sums are exact and the engines cannot disagree on addend
  order; Spark sums in DECIMAL(38,0) (≈1e38 headroom) and the oracle
  in HUGEINT (128-bit), both overflow-safe far past 1e12 rows of
  typical magnitudes.
- :func:`two_proportion_z` reduces each unit (user) to one 0/1 row
  first (map-side max), then the test statistic is computed on a
  2-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "groupwise_ols",
    "correlation_matrix",
    "two_proportion_z",
    "cuped_adjust",
    "diff_in_diff",
]

#: Exact-sum carrier: wide enough that n·Σxy stays exact at any
#: plausible group size (1e38 headroom; a 1e12-row group of 1e7-scaled
#: values needs ~1e33).
_DEC = "decimal(38,0)"


def _scaled(col: str | Column, scale: int) -> Column:
    """``round(col * scale)`` as an exact decimal integer.  Scaling to
    the column's native grain (cents, basis points) BEFORE aggregation
    is what makes every later sum exact on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(scale), 0).cast("long").cast(_DEC)


def groupwise_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    *,
    x_scale: int = 1,
    y_scale: int = 1,
    dp: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y`` on ``x`` via the
    raw-sums closed form:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    Returns ``group_cols + (n, slope, intercept, r2)``.  All five sums
    are exact decimal integers; ``slope`` / ``intercept`` / ``r2`` are
    doubles produced by one literally mirrorable division each, rounded
    to ``dp``.  Degenerate groups (constant x → den=0, or constant y →
    r2 undefined) yield NULL rather than ±inf.

    One shuffle, O(groups) rows after map-side combine.

    Rows with a NULL x OR y are EXCLUDED up front (complete-case):
    count() counts every row while sum() skips NULLs, so keeping them
    would mix an n-row count with (n−k)-row sums and silently corrupt
    slope/intercept/r2 — the cuped_adjust rule, applied uniformly."""
    df = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    x = _scaled(x_col, x_scale)
    y = _scaled(y_col, y_scale)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast(_DEC)
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy") * F.col("sy")
    num_d, den_d, deny_d = (e.cast("double") for e in (num, den, deny))
    slope = F.when(den != 0, F.round(num_d / den_d, dp))
    # The intercept uses the UNROUNDED slope ratio: rounding first would
    # multiply the ≤5e-7 rounding error by mean(x) — material once x is
    # scaled to cents — and only the OUTPUT is display-rounded.
    intercept = F.when(
        den != 0,
        F.round(
            (
                F.col("sy").cast("double")
                - (num_d / den_d) * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
            dp,
        ),
    )
    r2 = F.when(
        (den != 0) & (deny != 0),
        F.round((num_d * num_d) / (den_d * deny_d), dp),
    )
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def correlation_matrix(
    df: DataFrame,
    specs: list[tuple[str, str, int]],
    *,
    dp: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations among ``specs`` = [(name, column,
    integer_scale), ...], computed in ONE aggregate pass: k sums, k
    self-products and k(k−1)/2 cross-products, all exact integers.

    Returns one row per unordered pair (col_x < col_y by spec order):
    ``(col_x, col_y, n, corr)`` with
    ``corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx²−(Σx)²)·(n·Σy²−(Σy)²))``
    rounded to ``dp``; NULL when either column is constant.

    The aggregate reduces to a single row regardless of input size
    (map-side combine does the real work); the pair rows are exploded
    from that one row, so no second pass over the data.

    Complete-case: rows with a NULL in ANY spec column are excluded up
    front, so n and every sum agree on the same row set (the same
    count-vs-sum NULL rule as :func:`groupwise_ols`; listwise deletion
    keeps the one-pass shape — per-pair deletion would need a separate
    n per pair and forfeit the shared aggregate)."""
    keep = F.lit(True)
    for _, c, _ in specs:
        keep = keep & F.col(c).isNotNull()
    df = df.where(keep)
    cols = [(name, _scaled(c, s)) for name, c, s in specs]
    sums = [F.sum(x).alias(f"s_{name}") for name, x in cols]
    prods = [
        F.sum(cols[i][1] * cols[j][1]).alias(f"p_{cols[i][0]}_{cols[j][0]}")
        for i in range(len(cols))
        for j in range(i, len(cols))
    ]
    one = df.agg(F.count(F.lit(1)).alias("n"), *sums, *prods)
    nd = F.col("n").cast(_DEC)

    def _den(name: str) -> Column:
        return nd * F.col(f"p_{name}_{name}") - F.col(f"s_{name}") * F.col(
            f"s_{name}"
        )

    pair_structs = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a, b = cols[i][0], cols[j][0]
            num = nd * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            da, db = _den(a), _den(b)
            corr = F.when(
                (da != 0) & (db != 0),
                F.round(
                    num.cast("double")
                    / F.sqrt(da.cast("double") * db.cast("double")),
                    dp,
                ),
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    corr.alias("corr"),
                )
            )
    return one.select(
        "n", F.explode(F.array(*pair_structs)).alias("p")
    ).select("p.col_x", "p.col_y", "n", "p.corr")


def two_proportion_z(
    units: DataFrame,
    variant_col: str,
    success_col: str,
    *,
    dp: int = 6,
) -> DataFrame:
    """Two-proportion z-test between exactly two variants: ``units`` has
    one row per experimental unit with an integer variant id and a 0/1
    success flag.  Returns ONE row
    ``(n_a, x_a, n_b, x_b, rate_a, rate_b, z)`` where a/b are the
    variants in ascending id order and

        z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled.

    Counts are exact; rates and z are mirrored double arithmetic
    rounded to ``dp``.  ``z`` is NULL when the pooled rate is 0 or 1
    (zero pooled variance — ANSI mode would otherwise raise on the
    division).  The per-variant reduction is a 2-row aggregate; pairing
    them is a 1×1 cross of two broadcastable singletons."""
    v = (
        units.groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(success_col).cast("long")).alias("x"),
        )
    )
    # Fail loudly on anything but exactly variants {0, 1}: a third
    # bucket silently ignored (or an empty side silently producing zero
    # rows) is a wrong-experiment readout, not a judgement call.
    # Bounded collect: limit(3) caps it at three rows even if the
    # variant column is corrupt-high-cardinality.
    # key=repr: a NULL variant id must surface in the ValueError below,
    # not crash sorted() with a None-vs-int TypeError.
    ids = sorted(
        (r["variant"] for r in v.select("variant").limit(3).collect()),
        key=repr,
    )
    if ids != [0, 1]:
        raise ValueError(
            f"two_proportion_z: expected exactly variants [0, 1], "
            f"got {ids}"
        )
    a = v.where(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("x").alias("x_a")
    )
    b = v.where(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("x").alias("x_b")
    )
    j = a.crossJoin(F.broadcast(b))
    n_a, x_a = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    n_b, x_b = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    p_a, p_b = x_a / n_a, x_b / n_b
    pool = (x_a + x_b) / (n_a + n_b)
    z = F.when(
        (pool > 0) & (pool < 1),
        (p_a - p_b) / F.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b)),
    )
    return j.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(p_a, dp).alias("rate_a"),
        F.round(p_b, dp).alias("rate_b"),
        F.round(z, dp).alias("z"),
    )


def cuped_adjust(
    units: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
    *,
    dp: int = 6,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013): adjust each
    variant's post-period mean by the pre-period covariate,

        θ = cov(x, y) / var(x)   (pooled, from raw sums)
        adj_mean_v = mean_y_v − θ · (mean_x_v − mean_x_pooled)

    Inputs are one row per unit with integer-grain pre (x) and post
    (y) metrics; output is one row per variant: ``(variant, n, mean_y,
    mean_y_adj, theta, rho2)`` where rho2 = corr(x,y)² is the variance
    reduction fraction the adjustment buys.

    Everything reduces to sufficient statistics — a 1-row pooled
    aggregate broadcast onto the per-variant aggregate — so no
    per-unit adjusted values are ever materialized, and every output
    is a mirrored double over exact decimal sums (rounded ``dp``,
    NULL θ when the pre-period is constant).

    Units with a NULL pre OR post metric are EXCLUDED up front:
    count() counts rows while sum() skips NULLs, so keeping them would
    mix an n-row count with (n−k)-row sums and silently corrupt θ.
    Encode "no activity" as 0 upstream if that is the intended
    semantics (the registered query does)."""
    units = units.where(
        F.col(pre_col).isNotNull() & F.col(post_col).isNotNull()
    )
    x = F.col(pre_col).cast("long").cast(_DEC)
    y = F.col(post_col).cast("long").cast(_DEC)
    pooled = units.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    per_v = units.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("vx"),
        F.sum(y).alias("vy"),
    )
    j = per_v.crossJoin(F.broadcast(pooled))
    nd = F.col("n_all").cast(_DEC)
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy") * F.col("sy")
    theta = F.when(den != 0, num.cast("double") / den.cast("double"))
    mean_x_all = F.col("sx").cast("double") / F.col("n_all").cast("double")
    mean_x_v = F.col("vx").cast("double") / F.col("n").cast("double")
    mean_y_v = F.col("vy").cast("double") / F.col("n").cast("double")
    adj = F.when(
        den != 0, mean_y_v - theta * (mean_x_v - mean_x_all)
    )
    rho2 = F.when(
        (den != 0) & (deny != 0),
        (num.cast("double") * num.cast("double"))
        / (den.cast("double") * deny.cast("double")),
    )
    return j.select(
        "variant",
        "n",
        F.round(mean_y_v, dp).alias("mean_y"),
        F.round(adj, dp).alias("mean_y_adj"),
        F.round(theta, dp).alias("theta"),
        F.round(rho2, dp).alias("rho2"),
    )


def diff_in_diff(
    units: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
    *,
    dp: int = 6,
) -> DataFrame:
    """Difference-in-differences readout: ONE row ``(n_ctl, n_trt,
    pre_ctl, post_ctl, pre_trt, post_trt, did)`` where

        did = (post_trt − pre_trt) − (post_ctl − pre_ctl)

    over per-unit integer-grain pre/post metrics, control = variant 0,
    treated = variant 1 (validated exactly like two_proportion_z).
    The trend-robust companion to :func:`cuped_adjust`: CUPED shrinks
    variance via the covariate, DiD nets out the shared time trend.

    Units with NULL metrics are excluded (the cuped_adjust rule); all
    four means are mirrored doubles over exact decimal sums; the whole
    statistic lives on a 2-row aggregate."""
    units = units.where(
        F.col(pre_col).isNotNull() & F.col(post_col).isNotNull()
    )
    x = F.col(pre_col).cast("long").cast(_DEC)
    y = F.col(post_col).cast("long").cast(_DEC)
    v = units.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
    )
    # key=repr: a NULL variant id must surface in the ValueError below,
    # not crash sorted() with a None-vs-int TypeError.
    ids = sorted(
        (r["variant"] for r in v.select("variant").limit(3).collect()),
        key=repr,
    )
    if ids != [0, 1]:
        raise ValueError(
            f"diff_in_diff: expected exactly variants [0, 1], got {ids}"
        )
    a = v.where(F.col("variant") == 0).select(
        F.col("n").alias("n_ctl"),
        F.col("sx").alias("sx_ctl"),
        F.col("sy").alias("sy_ctl"),
    )
    b = v.where(F.col("variant") == 1).select(
        F.col("n").alias("n_trt"),
        F.col("sx").alias("sx_trt"),
        F.col("sy").alias("sy_trt"),
    )
    j = a.crossJoin(F.broadcast(b))
    pre_ctl = F.col("sx_ctl").cast("double") / F.col("n_ctl").cast("double")
    post_ctl = F.col("sy_ctl").cast("double") / F.col("n_ctl").cast("double")
    pre_trt = F.col("sx_trt").cast("double") / F.col("n_trt").cast("double")
    post_trt = F.col("sy_trt").cast("double") / F.col("n_trt").cast("double")
    did = (post_trt - pre_trt) - (post_ctl - pre_ctl)
    return j.select(
        "n_ctl",
        "n_trt",
        F.round(pre_ctl, dp).alias("pre_ctl"),
        F.round(post_ctl, dp).alias("post_ctl"),
        F.round(pre_trt, dp).alias("pre_trt"),
        F.round(post_trt, dp).alias("post_trt"),
        F.round(did, dp).alias("did"),
    )
