"""IR evaluation metrics — MRR, NDCG@k, precision/recall@k over a
retrieval run against relevance judgments (qrels).

The evaluation half of the search stack (operators/retrieval.py builds
runs; this scores them), and the lexical sibling of the ANN
``sim_recall_report``: both turn "is the retriever any good" into
driver-visible, oracle-checkable numbers.

Cross-engine exactness (the repo's fixed-point recipe): every rank
gain is rounded to an INTEGER milli-unit before summing —
``round(1000 / log2(rank + 1))`` — so DCG/IDCG are exact BIGINT sums
(order-independent), and the only floats are single mirrored divisions
(1/first_rel_rank, dcg/idcg) rounded at the end.  log2 on identical
small-int inputs is a single libm call, the theoretical-only
divergence class the repo accepts everywhere.

Scale: a run is ≤ |queries| × k rows by construction — the join with
qrels shuffles on (qid, doc_id) at run size (qrels are pre-aggregated
to n_rel per query for the recall denominator), the per-query
aggregate is |queries| rows, and IDCG is a JVM-side fold over
``sequence(1, min(n_rel, k))`` — ≤ k terms, no extra scan.  Nothing
here touches corpus text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ranking_metrics", "macro_metrics"]


def _gain_milli(rank: Column) -> Column:
    """round(1000 / log2(rank + 1)) as BIGINT — the integer DCG gain."""
    return F.round(F.lit(1000.0) / F.log2(rank + F.lit(1)), 0).cast("long")


def ranking_metrics(
    run: DataFrame,
    qrels: DataFrame,
    *,
    k: int = 10,
    q_col: str = "qid",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    dp: int = 6,
) -> DataFrame:
    """Per-query metrics for a ranked ``run`` (one row per (qid, doc,
    1-based rank)) against binary ``qrels`` (one row per relevant
    (qid, doc)).  Returns one row per qid:

    ``(qid, n_rel, hits, first_rel_rank, rr, p_at_k_milli,
    recall_milli, dcg_milli, idcg_milli, ndcg)``

    - hits = relevant docs in the top-k; p@k uses the FULL k as the
      denominator (standard convention — a short result list is the
      retriever's problem).
    - rr = 1/rank of the first relevant hit, 0.0 when none (MRR is the
      mean of this over queries — :func:`macro_metrics`).
    - recall_milli = hits·1000 div n_rel; NULL when the query has no
      relevant documents at all (undefined, not zero).
    - ndcg = dcg/idcg over exact integer milli-gains; 0.0 when no hit.

    Queries present in the run but absent from qrels get n_rel = 0;
    queries present in QRELS but absent from the run (the retriever
    returned nothing for a judged topic) still emit a row with hits =
    0, rr = 0.0, recall = 0 — the trec_eval convention: an unanswered
    topic drags the macro averages down, it does not vanish from the
    denominator.
    """
    topk = run.where(F.col(rank_col) <= k).select(
        F.col(q_col).alias("qid"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).cast("long").alias("rnk"),
    )
    rel_pairs = qrels.select(
        F.col(q_col).alias("qid"),
        F.col(id_col).alias("doc_id"),
        F.lit(1).alias("__rel"),
    ).dropDuplicates(["qid", "doc_id"])
    n_rel = rel_pairs.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    lab = topk.join(rel_pairs, ["qid", "doc_id"], "left").select(
        "qid",
        "rnk",
        F.coalesce(F.col("__rel"), F.lit(0)).alias("rel"),
    )
    agg = lab.groupBy("qid").agg(
        F.sum("rel").cast("long").alias("hits"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias(
            "first_rel_rank"
        ),
        F.sum(
            F.when(F.col("rel") == 1, _gain_milli(F.col("rnk"))).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("dcg_milli"),
    )
    # FULL join: run-only qids get n_rel 0, qrels-only qids (judged
    # topic, empty run) get zeroed hits/dcg instead of disappearing
    out = (
        agg.join(n_rel, "qid", "full")
        .withColumn("n_rel", F.coalesce(F.col("n_rel"), F.lit(0).cast("long")))
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0).cast("long")))
        .withColumn(
            "dcg_milli",
            F.coalesce(F.col("dcg_milli"), F.lit(0).cast("long")),
        )
    )
    ideal_n = F.least(F.col("n_rel"), F.lit(k))
    # F.sequence(1, n) DESCENDS for n < 1 (step defaults to -1): guard.
    idcg = F.when(
        ideal_n >= 1,
        F.aggregate(
            F.sequence(F.lit(1).cast("long"), ideal_n.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, i: acc + _gain_milli(i),
        ),
    ).otherwise(F.lit(0).cast("long"))
    rr = F.when(
        F.col("first_rel_rank").isNotNull(),
        F.round(F.lit(1.0) / F.col("first_rel_rank"), dp),
    ).otherwise(F.lit(0.0))
    out = out.select(
        "qid",
        "n_rel",
        "hits",
        F.col("first_rel_rank").cast("long").alias("first_rel_rank"),
        rr.alias("rr"),
        F.expr(f"(hits * 1000) div {k}").alias("p_at_k_milli"),
        F.when(
            F.col("n_rel") > 0, F.expr("(hits * 1000) div n_rel")
        ).alias("recall_milli"),
        "dcg_milli",
        idcg.alias("idcg_milli"),
    )
    ndcg = F.when(
        F.col("idcg_milli") > 0,
        F.round(
            F.col("dcg_milli").cast("double")
            / F.col("idcg_milli").cast("double"),
            dp,
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("ndcg", ndcg)


def macro_metrics(per_query: DataFrame, *, dp: int = 6) -> DataFrame:
    """Macro averages over :func:`ranking_metrics` output: ONE row
    ``(n_queries, mrr, mean_ndcg, mean_p_at_k, mean_recall)``.

    Exactness: rr/ndcg are already dp-rounded doubles; they are lifted
    to exact ints (×10^dp — ``dp`` must match the one passed to
    :func:`ranking_metrics`, both default 6), summed as BIGINTs, and
    divided once — so the mean is a single mirrored division, not an
    order-dependent float sum.  Recall averages over the queries where
    it is DEFINED (n_rel > 0)."""
    lift = float(10**dp)
    mic = per_query.select(
        F.round(F.col("rr") * lift, 0).cast("long").alias("rr_u"),
        F.round(F.col("ndcg") * lift, 0).cast("long").alias("ndcg_u"),
        F.col("p_at_k_milli").alias("p_u"),
        F.col("recall_milli").alias("rec_u"),
    )
    agg = mic.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("rr_u").alias("srr"),
        F.sum("ndcg_u").alias("sndcg"),
        F.sum("p_u").alias("sp"),
        F.sum("rec_u").alias("srec"),
        F.count("rec_u").cast("long").alias("nrec"),
    )
    n = F.col("n_queries").cast("double")
    return agg.select(
        "n_queries",
        F.round(F.col("srr").cast("double") / (n * lift), dp).alias("mrr"),
        F.round(F.col("sndcg").cast("double") / (n * lift), dp).alias(
            "mean_ndcg"
        ),
        F.round(F.col("sp").cast("double") / (n * 1e3), dp).alias(
            "mean_p_at_k"
        ),
        F.when(
            F.col("nrec") > 0,
            F.round(
                F.col("srec").cast("double")
                / (F.col("nrec").cast("double") * 1e3),
                dp,
            ),
        ).alias("mean_recall"),
    )
