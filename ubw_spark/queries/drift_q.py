"""Corpus-drift queries (operators/drift.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.functions.text import tokens
from ubw_spark.operators.drift import term_drift_topk
from ubw_spark.queries.registry import register, table


@register(
    "corpus_term_drift",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents WHERE lang = 'en'),
    a AS (SELECT term, count(*)::BIGINT AS cnt_a
          FROM tok WHERE doc_id % 2 = 0 GROUP BY 1),
    b AS (SELECT term, count(*)::BIGINT AS cnt_b
          FROM tok WHERE doc_id % 2 = 1 GROUP BY 1),
    na AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS n FROM a),
    nb AS (SELECT CAST(sum(cnt_b) AS BIGINT) AS n FROM b),
    j AS (SELECT coalesce(a.term, b.term) AS term,
                 coalesce(cnt_a, 0) AS cnt_a,
                 coalesce(cnt_b, 0) AS cnt_b
          FROM a FULL OUTER JOIN b ON a.term = b.term),
    d AS (SELECT term, cnt_a, cnt_b,
                 CAST((cnt_a * 1000000) // na.n AS BIGINT) AS share_a_micro,
                 CAST((cnt_b * 1000000) // nb.n AS BIGINT) AS share_b_micro
          FROM j, na, nb)
    SELECT term, cnt_a, cnt_b, share_a_micro, share_b_micro,
           abs(share_a_micro - share_b_micro) AS delta_micro
    FROM d
    ORDER BY delta_micro DESC, term ASC
    LIMIT 20
    """,
    tags=("quality", "drift", "llm"),
)
def corpus_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 term-share movers between two corpus snapshots (even vs
    odd doc ids standing in for dump N vs dump N+1): the
    before-you-train drift monitor that catches spam bursts and
    template floods.

    Scale: per-side tokenize + vocab-sized groupBy; the full-outer join
    runs on aggregated vocab tables; shares are exact integer
    micro-units; the cut is a TakeOrderedAndProject with a
    deterministic tiebreak."""
    d = table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    side = lambda parity: d.where(  # noqa: E731
        F.col("doc_id") % 2 == parity
    ).select(F.explode(tokens(F.col("text"))).alias("term"))
    return term_drift_topk(side(0), side(1), k=20)
