"""Graph queries (operators/graph.py) over the part co-purchase graph:
parts are linked when some order contains both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ubw_spark.operators.graph import (
    association_rules,
    co_occurrence_edges,
    degree_histogram,
    item_similarity,
    similar_items_topk,
    triangle_count,
)
from pyspark.sql import functions as F

from ubw_spark.queries.registry import register, table

#: Undirected co-purchase edges with support >= 2 (pairs bought
#: together in at least two distinct orders), u < v — shared by both
#: oracles.  The support threshold is what keeps the graph SPARSE:
#: single-coincidence pairs on random-ish baskets are ~340× the
#: repeated pairs at sf0.01 and would densify the graph into noise.
_EDGES_CTE = """
    inst AS (
      SELECT DISTINCT a.l_orderkey AS g, a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey),
    e AS (SELECT u, v FROM inst GROUP BY u, v HAVING count(*) >= 2)
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return co_occurrence_edges(
        li, "l_orderkey", "l_partkey", min_support=2
    )


@register(
    "graph_degree_histogram",
    oracle=f"""
    WITH {_EDGES_CTE},
    deg AS (
      SELECT node, count(*)::BIGINT AS degree
      FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY 1)
    SELECT degree, count(*)::BIGINT AS n_nodes FROM deg GROUP BY 1
    """,
    tags=("graph", "llm"),
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph — the hub-structure
    report.  Scale: edge building is one basket-keyed self-join (pairs
    ∝ Σ baskets², basket size bounded by the order), degrees one
    map-side-combining groupBy; output is |distinct degrees| rows."""
    return degree_histogram(_edges(spark, sf_dir))


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGES_CTE},
    tri AS (
      SELECT 1 AS one
      FROM e e1
      JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
    SELECT (SELECT count(*) FROM tri)::BIGINT AS n_triangles,
           (SELECT count(*) FROM e)::BIGINT AS n_edges,
           (SELECT count(*) FROM (
              SELECT DISTINCT node FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            ))::BIGINT AS n_nodes
    """,
    tags=("graph", "llm"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the co-purchase graph, via the
    DEGREE-ORIENTED node-iterator: wedges enumerate at their
    lowest-degree apex, so hub skew cannot go quadratic (O(m^1.5)
    total work).  The SQL oracle counts with the naive id-orientation
    — the count is orientation-invariant, so the engines agree on the
    NUMBER while the engine runs the skew-safe PLAN."""
    return triangle_count(_edges(spark, sf_dir), orientation="degree")


def _pagerank_oracle(k: int) -> str:
    """Unrolled k-iteration mirror of pagerank_fixed: one CTE per
    round, integer micro-unit arithmetic (`//` == `div` on positives),
    so every rank is a BIGINT both engines compute bit-identically."""
    rounds = []
    for i in range(1, k + 1):
        rounds.append(f"""
    r{i} AS (
      SELECT d.dst AS node,
             (150000 + sum((r.r * 85) // (100 * deg.degree)))::BIGINT AS r
      FROM d
      JOIN r{i - 1} r ON r.node = d.src
      JOIN deg ON deg.node = d.src
      GROUP BY d.dst)""")
    return f"""
    WITH {_EDGES_CTE},
    d AS (SELECT u AS src, v AS dst FROM e
          UNION ALL SELECT v AS src, u AS dst FROM e),
    deg AS (SELECT src AS node, count(*)::BIGINT AS degree
            FROM d GROUP BY 1),
    r0 AS (SELECT node, 1000000::BIGINT AS r FROM deg),
    {",".join(rounds)}
    SELECT node, r AS rank_micros FROM r{k}
    ORDER BY r DESC, node LIMIT 20
    """


@register(
    "graph_pagerank_top20",
    oracle=_pagerank_oracle(3),
    tags=("graph", "iterative", "llm"),
)
def graph_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three fixed-point PageRank rounds over the support-2 co-purchase
    graph, top-20 parts by rank (operators/graph.py::pagerank_fixed).
    Ranks are BIGINT micro-units with integral-division damping, so the
    ITERATIVE computation is bit-identical cross-engine — float
    PageRank would accumulate engine-order drift no rounding recipe
    fully removes.  Scale: each round is one rank-keyed join on the
    directed edges + one map-side-combining groupBy (shuffles ∝ edges);
    lineage truncates via localCheckpoint on deep runs; top-k is
    TakeOrderedAndProject."""
    from ubw_spark.operators.graph import pagerank_fixed

    ranks = pagerank_fixed(_edges(spark, sf_dir), iterations=3)
    return (
        ranks.orderBy(F.col("r").desc(), "node")
        .limit(20)
        .select("node", F.col("r").alias("rank_micros"))
    )


_SIM_CTE = """
inst AS (
  SELECT DISTINCT a.l_orderkey AS g, a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
sup AS (SELECT u, v, count(*)::BIGINT AS sup
        FROM inst GROUP BY 1, 2 HAVING count(*) >= 2),
item AS (SELECT l_partkey AS i, count(DISTINCT l_orderkey)::BIGINT AS gi
         FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
s AS (SELECT sup.u, sup.v, sup.sup,
             round(sup.sup::DOUBLE
                   / sqrt(iu.gi::DOUBLE * iv.gi::DOUBLE), 6) AS cos
      FROM sup JOIN item iu ON sup.u = iu.i
               JOIN item iv ON sup.v = iv.i)
"""


@register(
    "graph_item_similarity",
    oracle=f"WITH {_SIM_CTE} SELECT u, v, sup, cos FROM s",
    tags=("graph", "join", "llm"),
)
def graph_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity from co-purchase baskets (support ≥
    2) — the collaborative-filtering pair table: exact distinct-group
    counts, mirrored cosine division.

    Scale: basket-bounded pair join (Σ|g|²) + a broadcast of the
    dimension-sized per-item group counts."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return item_similarity(li, "l_orderkey", "l_partkey", min_support=2)


@register(
    "graph_similar_items_topk",
    oracle=f"""
    WITH {_SIM_CTE},
    sym AS (SELECT u AS item, v AS other, sup, cos FROM s
            UNION ALL
            SELECT v AS item, u AS other, sup, cos FROM s),
    r AS (SELECT item, other, sup, cos,
                 row_number() OVER (PARTITION BY item
                                    ORDER BY cos DESC, sup DESC,
                                             other ASC) AS rnk
          FROM sym)
    SELECT item, rnk, other, sup, cos FROM r WHERE rnk <= 3
    """,
    tags=("graph", "window", "llm"),
)
def graph_similar_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most similar items per item — the "customers also bought"
    readout, ranked on the rounded cosine with a deterministic
    tiebreak.

    Scale: the ranking window is partitioned per item over the
    aggregated pair list, never over raw baskets."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sim = item_similarity(li, "l_orderkey", "l_partkey", min_support=2)
    return similar_items_topk(sim, k=3)


@register(
    "graph_association_rules",
    oracle="""
    WITH inst AS (
      SELECT DISTINCT a.l_orderkey AS g, a.l_partkey AS u,
                      b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey),
    sup AS (SELECT u, v, count(*)::BIGINT AS sup
            FROM inst GROUP BY 1, 2 HAVING count(*) >= 3),
    item AS (SELECT l_partkey AS i,
                    count(DISTINCT l_orderkey)::BIGINT AS gi
             FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
    n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_groups
          FROM lineitem WHERE l_partkey IS NOT NULL),
    directed AS (SELECT u AS antecedent, v AS consequent, sup FROM sup
                 UNION ALL
                 SELECT v AS antecedent, u AS consequent, sup FROM sup)
    SELECT d.antecedent, d.consequent, d.sup,
           CAST((d.sup * 1000) // ia.gi AS BIGINT) AS confidence_milli,
           CAST((d.sup * n.n_groups * 1000) // (ia.gi * ib.gi) AS BIGINT)
             AS lift_milli
    FROM directed d
    JOIN item ia ON d.antecedent = ia.i
    JOIN item ib ON d.consequent = ib.i, n
    """,
    tags=("graph", "join", "llm"),
)
def graph_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket rules over co-purchase baskets (support ≥ 3):
    directed confidence and lift in exact integer milli-units — the
    "customers who bought X also bought Y" table with its
    independence-relative strength.

    Scale: pair support is the basket-bounded join; item group counts
    and the distinct-group total broadcast onto the surviving pairs."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return association_rules(li, "l_orderkey", "l_partkey", min_support=3)
