"""Distribution-drift monitoring between corpus snapshots: which terms'
frequency shares moved most between dump A and dump B.

The production loop: every new crawl/dump, compare its unigram
distribution against the previous one before training on it — a
spam burst, a scraper bug, or a template flood shows up as a handful
of terms whose share jumped.  Shares are exact integer micro-units
(cnt·10⁶ div total), so the report is bit-reproducible and never
subject to float-summation drift; no logs or divergences are needed to
RANK the movers (KL's per-term terms are monotone in share delta for
small moves, and the exact shares are what an operator actually reads).

Scale: each side is one tokenize-explode + map-side-combining groupBy
(O(vocab) rows out); the full-outer join runs on the two aggregated
vocab tables, never on token streams; totals are one-row broadcasts;
the top-k is a TakeOrderedAndProject with a deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["term_shares", "term_drift_topk"]


def term_shares(
    tokens_df: DataFrame, term_col: str = "term", *, scale: int = 1_000_000
) -> DataFrame:
    """(term, cnt, share_micro) from a one-column token stream: exact
    integer shares of each term in the side's total token count."""
    counts = tokens_df.groupBy(F.col(term_col).alias("term")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__n"))
    return counts.crossJoin(F.broadcast(total)).select(
        "term",
        "cnt",
        F.expr(f"(cnt * {scale}) div __n").alias("share_micro"),
    )


def term_drift_topk(
    a_tokens: DataFrame,
    b_tokens: DataFrame,
    *,
    k: int = 20,
    term_col: str = "term",
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-k terms by absolute share movement between snapshot A and
    snapshot B: ``(term, cnt_a, cnt_b, share_a_micro, share_b_micro,
    delta_micro)``, ordered by delta desc with a term-asc tiebreak so
    the cut is deterministic.

    A term absent from one side counts 0 there (full-outer join on the
    aggregated vocab tables) — appearing and vanishing terms are
    exactly the drift signal."""
    a = term_shares(a_tokens, term_col, scale=scale).select(
        "term",
        F.col("cnt").alias("cnt_a"),
        F.col("share_micro").alias("share_a_micro"),
    )
    b = term_shares(b_tokens, term_col, scale=scale).select(
        "term",
        F.col("cnt").alias("cnt_b"),
        F.col("share_micro").alias("share_b_micro"),
    )
    j = a.join(b, "term", "full_outer").select(
        "term",
        F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        F.coalesce("share_a_micro", F.lit(0)).alias("share_a_micro"),
        F.coalesce("share_b_micro", F.lit(0)).alias("share_b_micro"),
    )
    delta = F.abs(F.col("share_a_micro") - F.col("share_b_micro"))
    return (
        j.withColumn("delta_micro", delta)
        .orderBy(F.col("delta_micro").desc(), F.col("term").asc())
        .limit(k)
    )
