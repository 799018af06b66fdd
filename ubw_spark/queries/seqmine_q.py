"""Sequence-mining queries (operators/seqmine.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ubw_spark.operators.seqmine import (
    event_kgrams,
    next_state_topk,
    transitions,
)
from ubw_spark.queries.registry import register, table

#: The per-user ordering shared by all three queries: ts with event_id
#: as the deterministic tiebreak (events can share a timestamp).
_ORDER = ["ts", "event_id"]

_TRANS_CTE = """
o AS (SELECT user_id, event_type,
             lead(event_type)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events),
c AS (SELECT event_type AS from_state, nxt AS to_state,
             count(*)::BIGINT AS cnt
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT from_state, to_state, cnt,
             sum(cnt) OVER (PARTITION BY from_state) AS tot
      FROM c)
"""


@register(
    "events_transition_matrix",
    oracle=f"""
    WITH {_TRANS_CTE}
    SELECT from_state, to_state, cnt,
           CAST((cnt * 1000) // tot AS BIGINT) AS prob_milli
    FROM t
    """,
    tags=("events", "seqmine", "window"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream:
    which action follows which, per user-ordered sequence, with exact
    integer milli-probabilities.

    Scale: one per-user window (no global sort), then the matrix
    aggregate is |states|² rows with map-side combine — the
    normalization window runs on those ~25 rows, not the stream."""
    e = table(spark, sf_dir, "events")
    return transitions(e, ["user_id"], _ORDER, "event_type")


@register(
    "events_markov_next_topk",
    oracle=f"""
    WITH {_TRANS_CTE},
    p AS (SELECT from_state, to_state, cnt,
                 CAST((cnt * 1000) // tot AS BIGINT) AS prob_milli,
                 row_number() OVER (PARTITION BY from_state
                                    ORDER BY cnt DESC, to_state ASC) AS rnk
          FROM t)
    SELECT from_state, rnk, to_state, cnt, prob_milli
    FROM p WHERE rnk <= 2
    """,
    tags=("events", "seqmine", "window"),
)
def events_markov_next_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 most likely next actions per source action — the
    "predict the next event" readout of the transition matrix, with a
    deterministic (cnt desc, state asc) tiebreak."""
    e = table(spark, sf_dir, "events")
    return next_state_topk(
        transitions(e, ["user_id"], _ORDER, "event_type"), k=2
    )


@register(
    "seq_event_3grams",
    oracle="""
    WITH o AS (SELECT event_type AS e0,
                      lead(event_type, 1) OVER w AS e1,
                      lead(event_type, 2) OVER w AS e2
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (SELECT e0 || '>' || e1 || '>' || e2 AS gram
          FROM o WHERE e2 IS NOT NULL)
    SELECT gram, count(*)::BIGINT AS cnt
    FROM g GROUP BY 1 HAVING count(*) >= 50
    """,
    tags=("events", "seqmine", "window"),
)
def seq_event_3grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-step action patterns within user streams (support ≥
    50 at sf0.01) — the sequential-pattern-mining primitive behind
    funnel discovery.

    Scale: the two lookaheads come from ONE per-user window sort; the
    support aggregate is at most |states|³ rows with map-side
    combine."""
    e = table(spark, sf_dir, "events")
    return event_kgrams(
        e, ["user_id"], _ORDER, "event_type", k=3, min_support=50
    )


@register(
    "seq_event_skipgrams",
    oracle="""
    WITH o AS (SELECT event_type AS s,
                      lead(event_type, 1) OVER w AS l1,
                      lead(event_type, 2) OVER w AS l2,
                      lead(event_type, 3) OVER w AS l3,
                      lead(event_type, 4) OVER w AS l4
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (SELECT s, 1 AS gap, l1 AS t FROM o
          UNION ALL SELECT s, 2, l2 FROM o
          UNION ALL SELECT s, 3, l3 FROM o
          UNION ALL SELECT s, 4, l4 FROM o),
    c AS (SELECT s AS from_state, t AS to_state,
                 count(*)::BIGINT AS pairs,
                 sum(CASE WHEN gap = 1 THEN 1 ELSE 0 END)::BIGINT
                   AS adjacent
          FROM g WHERE t IS NOT NULL GROUP BY 1, 2)
    SELECT from_state, to_state, pairs, adjacent,
           CAST(((pairs - adjacent) * 1000) // pairs AS BIGINT)
             AS skip_share_milli
    FROM c
    """,
    tags=("events", "seqmine", "window"),
)
def seq_event_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eventually-follows association within 4 steps — what share of
    each action pair the adjacent-only transition matrix misses
    (exact integer milli-shares).

    Scale: one per-user window sort produces all four lookaheads as
    columns; the stack is a map-only ×4 explode and the aggregate is
    |states|² rows."""
    from ubw_spark.operators.seqmine import event_skipgrams

    e = table(spark, sf_dir, "events")
    return event_skipgrams(e, ["user_id"], _ORDER, "event_type", window=4)
