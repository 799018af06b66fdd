"""IR evaluation metrics vs hand-computed values (operators/ireval.py)."""

import math

import pytest

from ubw_spark.operators.ireval import macro_metrics, ranking_metrics


@pytest.fixture(scope="module")
def tiny(spark):
    # q0: rel docs {b, d, z}; run top-4 = [a, b, c, d] → hits at ranks 2, 4
    # q1: rel docs {x}; run = [x, y] → perfect first hit
    # q2: no rel docs at all; run = [m]
    run = spark.createDataFrame(
        [
            (0, "a", 1), (0, "b", 2), (0, "c", 3), (0, "d", 4),
            (1, "x", 1), (1, "y", 2),
            (2, "m", 1),
        ],
        "qid int, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, "b"), (0, "d"), (0, "z"), (1, "x")],
        "qid int, doc_id string",
    )
    return run, qrels


def g(rank):  # the integer milli-gain
    return round(1000.0 / math.log2(rank + 1))


def test_ranking_metrics_hand_computed(spark, tiny):
    run, qrels = tiny
    got = {r["qid"]: r.asDict() for r in
           ranking_metrics(run, qrels, k=4).collect()}

    q0 = got[0]
    assert (q0["n_rel"], q0["hits"], q0["first_rel_rank"]) == (3, 2, 2)
    assert q0["rr"] == round(1 / 2, 6)
    assert q0["p_at_k_milli"] == 2 * 1000 // 4
    assert q0["recall_milli"] == 2 * 1000 // 3
    assert q0["dcg_milli"] == g(2) + g(4)
    assert q0["idcg_milli"] == g(1) + g(2) + g(3)  # min(n_rel, k) = 3
    assert q0["ndcg"] == round((g(2) + g(4)) / (g(1) + g(2) + g(3)), 6)

    q1 = got[1]
    assert (q1["n_rel"], q1["hits"], q1["first_rel_rank"]) == (1, 1, 1)
    assert q1["rr"] == 1.0 and q1["ndcg"] == 1.0
    assert q1["recall_milli"] == 1000

    q2 = got[2]
    assert (q2["n_rel"], q2["hits"]) == (0, 0)
    assert q2["first_rel_rank"] is None
    assert q2["rr"] == 0.0 and q2["ndcg"] == 0.0
    assert q2["recall_milli"] is None  # undefined, not zero
    assert q2["idcg_milli"] == 0


def test_ranking_metrics_k_cuts_the_run(spark, tiny):
    run, qrels = tiny
    got = {r["qid"]: r.asDict() for r in
           ranking_metrics(run, qrels, k=2).collect()}
    # q0 at k=2: only the rank-2 hit counts; ideal = min(3, 2) gains
    assert got[0]["hits"] == 1
    assert got[0]["dcg_milli"] == g(2)
    assert got[0]["idcg_milli"] == g(1) + g(2)
    assert got[0]["p_at_k_milli"] == 500


def test_macro_metrics_exact_means(spark, tiny):
    run, qrels = tiny
    per = ranking_metrics(run, qrels, k=4)
    m = macro_metrics(per).collect()[0]
    assert m["n_queries"] == 3
    assert m["mrr"] == round((0.5 + 1.0 + 0.0) / 3, 6)
    # recall averages over the DEFINED queries only (q2 excluded)
    assert m["mean_recall"] == round((666 / 1000 + 1.0) / 2, 6)
    # p@4: q0 = 2/4 → 500 milli, q1 = 1/4 → 250, q2 = 0
    assert m["mean_p_at_k"] == round((500 + 250 + 0) / 3000, 6)


def test_judged_topic_with_empty_run_still_scores_zero(spark, tiny):
    """trec_eval convention: a judged topic the retriever returned
    nothing for must emit a zeroed row, not vanish from the macro
    denominators (code-review r9 finding)."""
    run, qrels = tiny
    qrels5 = qrels.union(
        spark.createDataFrame([(5, "p"), (5, "q")], "qid int, doc_id string")
    )
    got = {r["qid"]: r.asDict() for r in
           ranking_metrics(run, qrels5, k=4).collect()}
    q5 = got[5]
    assert (q5["n_rel"], q5["hits"], q5["dcg_milli"]) == (2, 0, 0)
    assert q5["rr"] == 0.0 and q5["ndcg"] == 0.0
    assert q5["recall_milli"] == 0  # defined (n_rel > 0), and zero
    assert q5["idcg_milli"] == g(1) + g(2)
    m = macro_metrics(ranking_metrics(run, qrels5, k=4)).collect()[0]
    assert m["n_queries"] == 4  # the unanswered topic counts
    assert m["mrr"] == round((0.5 + 1.0 + 0.0 + 0.0) / 4, 6)
