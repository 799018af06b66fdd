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
