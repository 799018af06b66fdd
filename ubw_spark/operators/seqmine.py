"""Sequence mining over ordered event streams: Markov transition
matrices, next-state prediction, and frequent k-grams of states.

The common shape: a window partitioned by the sequence key (user,
session) materializes lookahead states as columns, then everything
reduces to a groupBy on state tuples — so the expensive pass is one
per-key sort, and the shuffle after it carries O(states^k) rows, a
constant for real event vocabularies.

Scale posture (100 TB):

- the lead() window is partitioned by the sequence key; no global
  sort, no unpartitioned window (the registry lint enforces this
  repo-wide).  A hot user costs one task's sort, bounded by that
  user's own events — the same bound the sessionizer already accepts;
- transition counts / k-gram supports aggregate with map-side combine:
  the matrix is |states|² rows and the k-gram table |states|^k, both
  tiny next to the input, so the post-window shuffle is negligible;
- probabilities are integer milli-units (cnt·1000 div total), the
  repo's fixed-point recipe for bit-identical cross-engine division
  (see operators/graph.py::pagerank_fixed).

Lookahead columns are materialized as plain columns BEFORE any
downstream generator/filter: window expressions are illegal inside
generators (see operators/linkage.py::sorted_neighborhood_pairs for
the same staging).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "transitions",
    "next_state_topk",
    "event_kgrams",
    "event_skipgrams",
]


def _seq_window(key_cols: list[str], order_cols: list[str]):
    return Window.partitionBy(*key_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )


def transitions(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
    *,
    prob_scale: int = 1000,
) -> DataFrame:
    """First-order Markov transition matrix of ``state_col`` along each
    key's ordered stream: ``(from_state, to_state, cnt, prob_milli)``
    where ``prob_milli = cnt·prob_scale div Σ_to cnt`` (integer, exact).

    The row-frequency estimate of P(to | from).  Sequence boundaries
    are respected: lead() never crosses a key, so the last event of one
    user never chains into the next user.

    One per-key window + one groupBy; the normalizing total is a
    window over the AGGREGATED matrix (|states|² rows), not the raw
    stream."""
    w = _seq_window(key_cols, order_cols)
    nxt = F.lead(state_col, 1).over(w)
    c = (
        df.select(F.col(state_col).alias("from_state"), nxt.alias("to_state"))
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = F.sum("cnt").over(Window.partitionBy("from_state"))
    return c.withColumn("tot", tot).select(
        "from_state",
        "to_state",
        "cnt",
        F.expr(f"(cnt * {prob_scale}) div tot").alias("prob_milli"),
    )


def next_state_topk(trans: DataFrame, k: int = 2) -> DataFrame:
    """Top-k most likely next states per source state from a
    :func:`transitions` matrix, with a deterministic tiebreak
    (count desc, then state asc): ``(from_state, rnk, to_state, cnt,
    prob_milli)``.

    Runs on the already-aggregated matrix — |states|² rows — so the
    ranking window is bounded no matter the corpus size."""
    w = Window.partitionBy("from_state").orderBy(
        F.col("cnt").desc(), F.col("to_state").asc()
    )
    return (
        trans.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("from_state", "rnk", "to_state", "cnt", "prob_milli")
    )


def event_kgrams(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
    *,
    k: int = 3,
    min_support: int = 1,
    sep: str = ">",
) -> DataFrame:
    """Frequent k-grams of consecutive states within each key's ordered
    stream: ``(gram, cnt)`` with ``cnt ≥ min_support``, gram rendered
    ``s0>s1>…>s(k-1)``.

    The k−1 lookaheads are materialized as columns from ONE window
    spec (a single sort per key), the gram is a NULL-propagating
    concat (a NULL state poisons the gram on both engines identically
    — concat_ws would silently skip it), and grams that run off the
    end of a key's stream are dropped by the last-lead NULL filter."""
    if k < 2:
        raise ValueError(f"k must be ≥ 2, got {k}")
    w = _seq_window(key_cols, order_cols)
    leads: list[Column] = [F.col(state_col)] + [
        F.lead(state_col, i).over(w) for i in range(1, k)
    ]
    staged = df.select(
        *[c.alias(f"__s{i}") for i, c in enumerate(leads)]
    ).where(F.col(f"__s{k - 1}").isNotNull())
    parts: list[Column] = []
    for i in range(k):
        if i:
            parts.append(F.lit(sep))
        parts.append(F.col(f"__s{i}"))
    return (
        staged.select(F.concat(*parts).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_support)
    )


def event_skipgrams(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
    *,
    window: int = 4,
) -> DataFrame:
    """Eventually-follows pairs: for every event, the states at gaps
    1..window after it in the same key's stream — ``(from_state,
    to_state, pairs, adjacent, skip_share_milli)`` where ``adjacent``
    counts gap-1 occurrences and ``skip_share_milli`` is the exact
    integer share of non-adjacent pairs (how much of the association
    the plain transition matrix misses).

    The window lookaheads are materialized as COLUMNS first and only
    then stacked through an explode (window expressions are illegal
    inside generators); the stack is map-only ×window on rows that
    already carry their leads — one per-key sort total."""
    if window < 1:
        raise ValueError(f"need window >= 1; got {window}")
    w = _seq_window(key_cols, order_cols)
    staged = df.select(
        F.col(state_col).alias("__s"),
        *[
            F.lead(state_col, g).over(w).alias(f"__l{g}")
            for g in range(1, window + 1)
        ],
    )
    stacked = staged.select(
        "__s",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).alias("gap"),
                        F.col(f"__l{g}").alias("t"),
                    )
                    for g in range(1, window + 1)
                ]
            )
        ).alias("p"),
    ).where(F.col("p.t").isNotNull())
    c = stacked.groupBy(
        F.col("__s").alias("from_state"), F.col("p.t").alias("to_state")
    ).agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(F.when(F.col("p.gap") == 1, 1).otherwise(0)).alias(
            "adjacent"
        ),
    )
    return c.select(
        "from_state",
        "to_state",
        "pairs",
        "adjacent",
        F.expr("((pairs - adjacent) * 1000) div pairs").alias(
            "skip_share_milli"
        ),
    )
