"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (on by default in ubw_spark.session) handles
most skew at runtime; these operators are the explicit tools for the
cases AQE can't fix:

- ``salted_groupby_agg``: a hot grouping key whose single reducer
  becomes the straggler.  Phase 1 aggregates by (key, salt) — the hot
  key's rows spread over ``salt_buckets`` reducers; phase 2 combines the
  tiny partials.  Only algebraic aggregates (sum/count/min/max) compose
  this way; avg is derived as sum/count.
- ``salted_join``: a hot join key on the probe side.  The build side is
  replicated ``salt_buckets`` times (explode), the probe side salts
  deterministically (hash of the whole row, not rand() — reruns and
  retries must agree), and the join runs on (key, salt).  Build-side
  bytes × salt_buckets is the explicit cost — use for moderate fanout
  with a genuinely hot probe key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # counts combine by summing partials
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then keys.

    ``aggs`` maps output name → (function, column), function ∈
    {sum,count,min,max,avg}.  Example::

        salted_groupby_agg(df, ["k"], {"total": ("sum", "v"),
                                       "n": ("count", "v"),
                                       "mean": ("avg", "v")})
    """
    wants_avg = {
        name: col for name, (fn, col) in aggs.items() if fn == "avg"
    }
    phase1_aggs = []
    phase2_aggs = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            # derive from salted sum + count
            phase1_aggs.append(F.sum(col).alias(f"__s_{name}"))
            phase1_aggs.append(F.count(col).alias(f"__c_{name}"))
            phase2_aggs.append(F.sum(f"__s_{name}").alias(f"__S_{name}"))
            phase2_aggs.append(F.sum(f"__c_{name}").alias(f"__C_{name}"))
            continue
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate '{fn}' cannot be salted")
        partial, combine = _ALGEBRAIC[fn]
        phase1_aggs.append(partial(col).alias(f"__p_{name}"))
        phase2_aggs.append(combine(f"__p_{name}").alias(name))

    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)
    ).alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *phase1_aggs
    )
    out = phase1.groupBy(*keys).agg(*phase2_aggs)
    for name, _col in wants_avg.items():
        out = out.withColumn(
            name, F.col(f"__S_{name}") / F.col(f"__C_{name}")
        ).drop(f"__S_{name}", f"__C_{name}")
    return out


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the probe side's hot keys spread over salt buckets.

    The build side is exploded ×salt_buckets so every (key, salt)
    combination exists; the probe side computes a deterministic salt
    from its full row hash.

    Only join shapes the construction preserves are allowed: with the
    build side replicated, right/full outer joins would emit
    salt_buckets copies of every unmatched build row."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "leftsemi", "leftanti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; '{how}' would "
            "duplicate unmatched build-side rows"
        )
    build_salted = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    probe_salted = probe.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in probe.columns]),
            F.lit(salt_buckets),
        ),
    )
    return probe_salted.join(build_salted, [key, "__salt"], how).drop("__salt")


def key_skew_report(
    df: DataFrame, key_col: str, *, k: int = 10, scale: int = 1000
) -> DataFrame:
    """The decide-whether-to-salt diagnostic: the k heaviest values of
    ``key_col`` with their exact row shares — ``(rnk, key, cnt, n_keys,
    total_rows, share_milli)`` where ``share_milli = cnt·scale div
    total_rows``.

    A share_milli near 1000/executors means one task owns the key's
    whole shuffle partition → reach for salted_groupby_agg /
    salted_join; a flat top-k means the key is safe to shuffle on.

    Scale: one map-side-combining groupBy (O(distinct keys) rows), a
    top-k (TakeOrderedAndProject — the ranking window is grounded by
    the literal limit, never over raw cardinality), and a broadcast of
    the one-row totals aggregate."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    order = [F.col("cnt").desc(), F.col("key").asc()]
    top = counts.orderBy(*order).limit(k)
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(*order))
    )
    return ranked.crossJoin(F.broadcast(totals)).select(
        "rnk",
        "key",
        "cnt",
        "n_keys",
        "total_rows",
        F.expr(f"(cnt * {scale}) div total_rows").alias("share_milli"),
    )
