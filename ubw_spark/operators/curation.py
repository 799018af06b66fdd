"""Corpus curation operators: per-group quota caps and token-budget
source mixing — the two knobs a pretraining-data pipeline turns after
dedup/quality filtering (cap any one domain's share; hit a global token
budget with per-source weights).

Both are deterministic (portable md5 hashing, no RNG) and
SQL-reproducible, so membership itself is oracle-checked like the
splits/sampling family in operators/splits.py.

Scale posture: ``quota_cap`` is ONE shuffle on the group key with a
per-group sort bounded by the group's size; ``token_budget_mix`` reduces
the corpus to a per-source aggregate (a few rows), computes fractions
there, broadcasts them back, and filters map-side at the scan — the
corpus itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ubw_spark.operators.dedup import portable_hash
from ubw_spark.operators.splits import _BUCKETS, _salted_bucket


def quantile_gate(
    df: DataFrame,
    score_col: str,
    q: float,
    *,
    keep: str = "above",
) -> DataFrame:
    """Keep rows whose score clears the corpus's own q-quantile —
    auto-tuned quality filtering ("drop the worst 20%") with no
    hand-picked threshold, so the gate adapts as the corpus shifts.

    keep='above' keeps score >= quantile(q); 'below' keeps <=.

    Shape: ONE exact interpolating percentile aggregate (a single
    scalar) broadcast back via crossJoin, then a map-side filter —
    the repo-standard reduced-aggregate-broadcast pattern.  At 100 TB
    swap `percentile` for `approx_percentile` (sketch merge instead of
    per-group sort); the gate semantics don't change."""
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    # F.percentile (not an F.expr SQL string): survives column names
    # that need backticks and keeps q out of interpolated SQL text
    thr = df.agg(
        F.percentile(F.col(score_col), F.lit(q)).alias("__thr")
    )
    j = df.crossJoin(F.broadcast(thr))
    cond = (
        F.col(score_col) >= F.col("__thr")
        if keep == "above"
        else F.col(score_col) <= F.col("__thr")
    )
    return j.where(cond).drop("__thr")


def quota_cap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    priority: list[Column] | None = None,
    salt: str = "quota",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, preferring ``priority``
    order (e.g. quality desc) with a deterministic hash tiebreak so
    equal-priority survivors are a stable pseudo-random choice, not a
    partition-order artifact.

    One shuffle (hash partition by group) + per-group sort.  The sort
    cost is bounded by group size; a corpus where one domain IS the
    corpus should pre-shard that domain (salt the group key) or
    pre-filter with :func:`token_budget_mix` — a row_number window over
    a single giant partition is the known degenerate case."""
    tiebreak = portable_hash(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(
        *(priority or []), tiebreak, F.col(id_col)
    )
    return (
        df.withColumn("__qrank", F.row_number().over(w))
        .where(F.col("__qrank") <= cap)
        .drop("__qrank")
    )


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    token_col: Column,
    id_col: str,
    weights: dict[str, float],
    budget: int,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic corpus mix: sample each source down so the kept
    token count lands ≈ ``budget × weight_s / Σweights`` per source
    (sources below their allocation are kept whole — fraction capped at
    1; their shortfall is NOT redistributed, matching how published data
    recipes state mixes).

    Mechanics: one aggregate pass reduces the corpus to per-source token
    totals, the keep-fraction is derived on that tiny frame, and rows
    are kept iff their salted hash bucket falls under
    ``floor(fraction × 10000)`` — the splits.py membership arithmetic,
    so the whole mix (fractions AND membership) reproduces in SQL.
    Sources not in ``weights`` get weight 0 (dropped).  The token count
    is taken from ``token_col`` so callers choose their tokenizer
    (whitespace, BPE-regex, a real tokenizer column)."""
    total_w = sum(weights.values()) or 1.0
    wexpr: Column | None = None
    for name, wgt in weights.items():
        lit = F.lit(wgt / total_w)
        wexpr = (
            F.when(F.col(source_col) == name, lit)
            if wexpr is None
            else wexpr.when(F.col(source_col) == name, lit)
        )
    wexpr = wexpr.otherwise(F.lit(0.0)) if wexpr is not None else F.lit(0.0)

    totals = (
        df.select(F.col(source_col), token_col.alias("__tok"))
        .groupBy(source_col)
        .agg(F.sum("__tok").alias("__src_tokens"))
        .withColumn("__w", wexpr)
        .withColumn(
            "__frac",
            F.least(
                F.lit(1.0),
                F.lit(float(budget)) * F.col("__w") / F.col("__src_tokens"),
            ),
        )
        .select(source_col, "__frac")
    )
    # THE canonical hash-bucket recipe (splits._salted_bucket — one
    # definition, literally mirrored by the SQL oracles); inlining it
    # here was the drift risk the single definition exists to prevent
    bucket = _salted_bucket(F.col(id_col), salt)
    return (
        df.join(F.broadcast(totals), source_col)
        .where(bucket < F.floor(F.col("__frac") * _BUCKETS))
        .drop("__frac")
    )


def temperature_weights(
    df: DataFrame,
    source_col: str,
    token_col: Column,
    alpha: float,
) -> DataFrame:
    """Temperature-scaled mixture weights: weight_s ∝ tokens_s^alpha
    (alpha=1 → proportional / natural mix, alpha=0 → uniform across
    sources, 0<alpha<1 upweights small sources — the multilingual-
    sampling rule of XLM-R/mT5).  Returns one row per source:
    ``tokens`` and normalized ``weight``.

    The output FEEDS ``token_budget_mix``: derive the recipe from the
    corpus instead of hand-writing it.  Shape: one map-side-combining
    aggregate to per-source totals, then the normalizer is a one-row
    aggregate broadcast back — the reduced-aggregate-broadcast pattern;
    nothing row-level happens after the first pass."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    totals = (
        df.select(F.col(source_col), token_col.alias("__tok"))
        .groupBy(source_col)
        .agg(F.sum("__tok").cast("long").alias("tokens"))
        .withColumn(
            "__pw", F.pow(F.col("tokens").cast("double"), F.lit(alpha))
        )
    )
    z = totals.agg(F.sum("__pw").alias("__z"))
    return (
        totals.crossJoin(F.broadcast(z))
        .withColumn("weight", F.col("__pw") / F.col("__z"))
        .drop("__pw", "__z")
    )
