"""Graph primitives (operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from ubw_spark.operators.graph import (
    co_occurrence_edges,
    degree_histogram,
    degrees,
    triangle_count,
)


@pytest.fixture(scope="module")
def edges(spark):
    # K4 on {1,2,3,4} (4 triangles) + pendant 5-1 + isolated pair 6-7
    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5), (6, 7)]
    return spark.createDataFrame(e, "u int, v int")


def test_cooccurrence_edges_distinct_and_ordered(spark):
    rows = [
        (10, 1), (10, 2), (10, 3),   # basket {1,2,3} -> 3 edges
        (20, 2), (20, 1),            # duplicate pair, reversed order
        (30, 9), (30, None), (40, 5),  # null item, singleton basket
    ]
    df = spark.createDataFrame(rows, "basket int, item int")
    got = {
        (r["u"], r["v"])
        for r in co_occurrence_edges(df, "basket", "item").collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_degrees_and_histogram(edges):
    d = {r["node"]: r["degree"] for r in degrees(edges).collect()}
    assert d == {1: 4, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1, 7: 1}
    h = {
        (r["degree"], r["n_nodes"])
        for r in degree_histogram(edges).collect()
    }
    assert h == {(4, 1), (3, 3), (1, 3)}


def test_triangle_count_both_orientations(edges):
    for orientation in ("degree", "id"):
        row = triangle_count(edges, orientation=orientation).collect()[0]
        assert (
            row["n_triangles"], row["n_edges"], row["n_nodes"]
        ) == (4, 8, 7)
    with pytest.raises(ValueError, match="unknown orientation"):
        triangle_count(edges, orientation="nope")


def test_triangle_free_graph(spark):
    # a 4-cycle has wedges but no triangles
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "u int, v int"
    )
    assert triangle_count(cyc).collect()[0]["n_triangles"] == 0


def test_hub_graph_exact(spark):
    # star + one rim edge: exactly 1 triangle regardless of hub degree
    star = [(0, i) for i in range(1, 30)] + [(1, 2)]
    df = spark.createDataFrame(star, "u int, v int")
    row = triangle_count(df, orientation="degree").collect()[0]
    assert (row["n_triangles"], row["n_edges"], row["n_nodes"]) == (
        1, 30, 30,
    )


def _py_pagerank(edge_list, iterations):
    from collections import defaultdict

    adj = defaultdict(list)
    for u, v in edge_list:
        adj[u].append(v)
        adj[v].append(u)
    r = {n: 1_000_000 for n in adj}
    for _ in range(iterations):
        nxt = defaultdict(lambda: 150_000)
        for u, nbrs in adj.items():
            c = (r[u] * 85) // (100 * len(nbrs))
            for v in nbrs:
                nxt[v] += c
        r = dict(nxt)
    return r


def test_pagerank_matches_python_reference(spark):
    from ubw_spark.operators.graph import pagerank_fixed

    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5), (6, 7)]
    df = spark.createDataFrame(e, "u int, v int")
    # 5 iterations with checkpoint_every=2 exercises the lineage
    # truncation path; values must be bit-identical integers
    got = {
        r["node"]: r["r"]
        for r in pagerank_fixed(
            df, iterations=5, checkpoint_every=2
        ).collect()
    }
    assert got == _py_pagerank(e, 5)
    # the hub out-ranks every other node; the isolated pair is symmetric
    assert got[1] == max(got.values())
    assert got[6] == got[7]


def test_pagerank_validation(spark):
    from ubw_spark.operators.graph import pagerank_fixed

    df = spark.createDataFrame([(1, 2)], "u int, v int")
    with pytest.raises(ValueError, match="iterations >= 1"):
        pagerank_fixed(df, iterations=0)


class TestItemSimilarity:
    @pytest.fixture(scope="class")
    def baskets(self, spark):
        # g1: {A,B,C}, g2: {A,B}, g3: {A, A duplicate, D}, g4: {B}
        rows = [
            (1, "A"), (1, "B"), (1, "C"),
            (2, "A"), (2, "B"),
            (3, "A"), (3, "A"), (3, "D"),
            (4, "B"),
        ]
        return spark.createDataFrame(rows, "g long, item string")

    def test_pairs_and_cosine(self, spark, baskets):
        from ubw_spark.operators.graph import item_similarity

        out = {
            (r["u"], r["v"]): r
            for r in item_similarity(
                baskets, "g", "item", min_support=1
            ).collect()
        }
        # A in 3 groups, B in 3, C in 1, D in 1; A∩B = {g1,g2}
        ab = out[("A", "B")]
        assert ab["sup"] == 2
        assert ab["cos"] == pytest.approx(2 / 3, abs=1e-6)
        # duplicate A in g3 must not inflate: A∩D support is 1
        assert out[("A", "D")]["sup"] == 1
        assert out[("A", "D")]["cos"] == pytest.approx(
            1 / (3**0.5), abs=1e-6
        )

    def test_min_support_filters(self, spark, baskets):
        from ubw_spark.operators.graph import item_similarity

        out = item_similarity(baskets, "g", "item", min_support=2).collect()
        assert {(r["u"], r["v"]) for r in out} == {("A", "B")}

    def test_topk_symmetric_and_deterministic(self, spark, baskets):
        from ubw_spark.operators.graph import (
            item_similarity,
            similar_items_topk,
        )

        sim = item_similarity(baskets, "g", "item", min_support=1)
        top = {
            (r["item"], r["rnk"]): r["other"]
            for r in similar_items_topk(sim, k=2).collect()
        }
        # B's best neighbor is A (cos 2/3 beats C's 1/sqrt(3))
        assert top[("B", 1)] == "A"
        # C appears as an item too (symmetrized), best neighbor A or B
        # with equal cos/sup → tiebreak other asc picks A
        assert top[("C", 1)] == "A" and top[("C", 2)] == "B"


class TestAssociationRules:
    def test_confidence_and_lift_hand_computed(self, spark):
        from ubw_spark.operators.graph import association_rules

        # 4 groups; A in {1,2,3}, B in {1,2,4}; A∩B in {1,2}
        rows = [
            (1, "A"), (1, "B"),
            (2, "A"), (2, "B"),
            (3, "A"),
            (4, "B"),
        ]
        df = spark.createDataFrame(rows, "g long, item string")
        out = {
            (r["antecedent"], r["consequent"]): r
            for r in association_rules(
                df, "g", "item", min_support=1
            ).collect()
        }
        ab = out[("A", "B")]
        # conf(A→B) = 2/3 → 666 milli; lift = 4*2/(3*3) → 888 milli
        assert ab["sup"] == 2
        assert ab["confidence_milli"] == 666
        assert ab["lift_milli"] == 888
        ba = out[("B", "A")]
        assert ba["confidence_milli"] == 666  # symmetric here (both 3)
        assert ba["lift_milli"] == 888

    def test_rules_are_directed_pairs_of_each_surviving_edge(self, spark):
        from ubw_spark.operators.graph import association_rules

        rows = [(1, "X"), (1, "Y"), (2, "X"), (2, "Y"), (3, "Z")]
        df = spark.createDataFrame(rows, "g long, item string")
        out = association_rules(df, "g", "item", min_support=2).collect()
        assert {(r["antecedent"], r["consequent"]) for r in out} == {
            ("X", "Y"), ("Y", "X"),
        }
