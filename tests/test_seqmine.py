"""Sequence mining (operators/seqmine.py)."""

import pytest

from ubw_spark.operators.seqmine import (
    event_kgrams,
    next_state_topk,
    transitions,
)


@pytest.fixture(scope="module")
def stream(spark):
    # user 1: A B A B A   (A→B ×2, B→A ×2)
    # user 2: A C         (A→C ×1)  — and C must NOT chain into user 3
    # user 3: C C         (C→C ×1)
    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "B"), (1, 5, "A"),
        (2, 1, "A"), (2, 2, "C"),
        (3, 1, "C"), (3, 2, "C"),
    ]
    return spark.createDataFrame(rows, "u int, seq int, s string")


def _matrix(stream):
    return {
        (r["from_state"], r["to_state"]): r
        for r in transitions(stream, ["u"], ["seq"], "s").collect()
    }


def test_transition_counts_and_probs(spark, stream):
    m = _matrix(stream)
    assert {k: v["cnt"] for k, v in m.items()} == {
        ("A", "B"): 2, ("B", "A"): 2, ("A", "C"): 1, ("C", "C"): 1,
    }
    # from A: 3 transitions → milli-probs floor(2000/3)=666, floor(1000/3)=333
    assert m[("A", "B")]["prob_milli"] == 666
    assert m[("A", "C")]["prob_milli"] == 333
    assert m[("B", "A")]["prob_milli"] == 1000
    assert m[("C", "C")]["prob_milli"] == 1000


def test_transitions_never_cross_keys(spark, stream):
    # user 2 ends in C and user 3 starts with C: a cross-key leak would
    # manufacture an extra C→C
    m = _matrix(stream)
    assert m[("C", "C")]["cnt"] == 1


def test_next_state_topk_order_and_tiebreak(spark, stream):
    t = transitions(stream, ["u"], ["seq"], "s")
    top = {
        (r["from_state"], r["rnk"]): r["to_state"]
        for r in next_state_topk(t, k=2).collect()
    }
    assert top[("A", 1)] == "B" and top[("A", 2)] == "C"
    # tie on cnt falls back to state asc
    tie = spark.createDataFrame(
        [(1, 1, "X"), (1, 2, "B"), (1, 3, "X"), (1, 4, "A")],
        "u int, seq int, s string",
    )
    tt = next_state_topk(transitions(tie, ["u"], ["seq"], "s"), k=2)
    got = {
        (r["from_state"], r["rnk"]): r["to_state"] for r in tt.collect()
    }
    assert got[("X", 1)] == "A" and got[("X", 2)] == "B"


def test_kgrams_counts_and_min_support(spark, stream):
    all3 = {
        r["gram"]: r["cnt"]
        for r in event_kgrams(stream, ["u"], ["seq"], "s", k=3).collect()
    }
    # user 1 yields ABA, BAB, ABA — overlapping occurrences both count
    assert all3 == {"A>B>A": 2, "B>A>B": 1}
    sup2 = event_kgrams(
        stream, ["u"], ["seq"], "s", k=3, min_support=2
    ).collect()
    assert [(r["gram"], r["cnt"]) for r in sup2] == [("A>B>A", 2)]


def test_kgrams_k2_equals_transition_counts(spark, stream):
    g2 = {
        r["gram"]: r["cnt"]
        for r in event_kgrams(stream, ["u"], ["seq"], "s", k=2).collect()
    }
    m = _matrix(stream)
    assert g2 == {
        f"{a}>{b}": r["cnt"] for (a, b), r in m.items()
    }


def test_kgrams_rejects_k1(spark, stream):
    with pytest.raises(ValueError):
        event_kgrams(stream, ["u"], ["seq"], "s", k=1)


def test_skipgrams_counts_and_shares(spark, stream):
    from ubw_spark.operators.seqmine import event_skipgrams

    # user 1: A B A B A with window=2:
    #   gap1: AB, BA, AB, BA; gap2: AA, BB, AA
    out = {
        (r["from_state"], r["to_state"]): r
        for r in event_skipgrams(
            stream.where("u = 1"), ["u"], ["seq"], "s", window=2
        ).collect()
    }
    assert out[("A", "B")]["pairs"] == 2
    assert out[("A", "B")]["adjacent"] == 2
    assert out[("A", "B")]["skip_share_milli"] == 0
    assert out[("A", "A")]["pairs"] == 2
    assert out[("A", "A")]["adjacent"] == 0
    assert out[("A", "A")]["skip_share_milli"] == 1000
    assert out[("B", "B")]["pairs"] == 1


def test_skipgrams_never_cross_keys(spark, stream):
    from ubw_spark.operators.seqmine import event_skipgrams

    out = {
        (r["from_state"], r["to_state"]): r["pairs"]
        for r in event_skipgrams(
            stream, ["u"], ["seq"], "s", window=3
        ).collect()
    }
    # user 2 ends A C; user 3 is C C.  A cross-key leak would add A→C
    # pairs beyond user 2's own (gap1 only: A C)
    assert out[("A", "C")] == 1


def test_skipgrams_window1_equals_transitions(spark, stream):
    from ubw_spark.operators.seqmine import event_skipgrams, transitions

    skip = {
        (r["from_state"], r["to_state"]): r["pairs"]
        for r in event_skipgrams(
            stream, ["u"], ["seq"], "s", window=1
        ).collect()
    }
    trans = {
        (r["from_state"], r["to_state"]): r["cnt"]
        for r in transitions(stream, ["u"], ["seq"], "s").collect()
    }
    assert skip == trans
