"""Graph primitives over edge lists: co-occurrence graphs, degrees,
exact triangle counting.

Curation pipelines meet graphs constantly — co-purchase/co-click
structure, doc-link graphs, the dedup cluster graph (operators/
components.py walks its components) — and the first questions are
degree structure (hubs, power laws) and closure (triangles: community
density, link-spam signatures).  Both are integer-exact and fully
oracle-checkable, unlike sampled estimators.

Scale shapes:
- ``co_occurrence_edges``: an equi-self-join keyed on the group column
  (basket), emitting each unordered pair once (u < v) — pairs ∝
  Σ_groups |g|², the basket bound, with oversized baskets cappable
  upstream via the dedup family's ``cap_buckets``.
- ``triangle_count`` uses the DEGREE-ORIENTED node-iterator (the
  compact-forward algorithm; Schank & Wagner 2005): each undirected
  edge is directed from its (degree, id)-smaller endpoint to the
  larger, so every wedge is enumerated at its lowest-degree apex —
  work is O(Σ out_deg²) = O(m^{3/2}) REGARDLESS of hub skew, where the
  naive id-orientation goes quadratic in the hub degree.  Three keyed
  shuffles (degree join, wedge self-join on the apex, closing-edge
  join); the triangle COUNT is orientation-invariant, so the SQL
  oracle uses the simple id-orientation while the engine runs the
  skew-safe one — same number, different plan, which is exactly the
  point.

Reference parity: no graph surface exists in the reference; this
extends the join vocabulary (SURVEY.md §2.3) the way components.py
extends it for equivalence classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ubw_spark.operators.iterate import TruncateSlot, truncate


def co_occurrence_edges(
    df: DataFrame, group_col: str, item_col: str, *, min_support: int = 1
) -> DataFrame:
    """Distinct undirected edges (u < v) between items sharing a group
    (co-purchase: items in one order; co-click: docs in one session).
    One self-join keyed on the group; items NULL or alone in their
    group produce no edges.

    ``min_support`` keeps only pairs co-occurring in at least that many
    DISTINCT groups (the market-basket support threshold): on large
    random-ish baskets single-coincidence pairs dominate the edge set
    and densify the graph into noise — support 2+ is how a co-purchase
    graph stays sparse at scale."""
    return co_occurrence_support(
        df, group_col, item_col, min_support=min_support
    ).select("u", "v")


def co_occurrence_support(
    df: DataFrame, group_col: str, item_col: str, *, min_support: int = 1
) -> DataFrame:
    """``(u, v, sup)``: the :func:`co_occurrence_edges` pair list WITH
    its distinct-group support count — the single home of the pair
    enumeration invariant (null filtering, u < v orientation,
    per-group dedup BEFORE counting), shared by the edge builder and
    :func:`item_similarity` so the two can't drift."""
    if min_support < 1:
        raise ValueError(f"need min_support >= 1; got {min_support}")
    a = df.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("u")
    ).where(F.col("u").isNotNull())
    b = df.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("v")
    ).where(F.col("v").isNotNull())
    inst = (
        a.join(b, "__g")
        .where(F.col("u") < F.col("v"))
        .select("__g", "u", "v")
        .distinct()
    )
    sup = inst.groupBy("u", "v").agg(F.count(F.lit(1)).alias("sup"))
    if min_support == 1:
        return sup
    return sup.where(F.col("sup") >= min_support)


def degrees(edges: DataFrame) -> DataFrame:
    """(node, degree) from a distinct undirected (u, v) edge list —
    one union + one map-side-combining groupBy."""
    nodes = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(degree, n_nodes) — the hub-structure report, |distinct degrees|
    rows however large the graph."""
    return (
        degrees(edges)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )


def triangle_count(
    edges: DataFrame, *, orientation: str = "degree"
) -> DataFrame:
    """One row (n_triangles, n_edges, n_nodes), exact.

    ``orientation="degree"`` (default): direct each edge toward its
    (degree, id)-larger endpoint and enumerate wedges at the smaller —
    out-degrees are bounded by O(sqrt m), so a hub of degree d costs
    O(m) wedges instead of the id-orientation's O(d²).  The count is
    orientation-invariant; ``orientation="id"`` keeps the naive
    direction for small graphs and for mirroring simple SQL."""
    if orientation not in ("degree", "id"):
        raise ValueError(f"unknown orientation: {orientation!r}")
    if orientation == "degree":
        deg = degrees(edges)
        du = deg.select(
            F.col("node").alias("u"), F.col("degree").alias("__du")
        )
        dv = deg.select(
            F.col("node").alias("v"), F.col("degree").alias("__dv")
        )
        e = edges.join(du, "u").join(dv, "v")
        fwd = F.struct(F.col("__du"), F.col("u")) < F.struct(
            F.col("__dv"), F.col("v")
        )
        oriented = e.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(fwd, F.col("__dv")).otherwise(F.col("__du")).alias(
                "__ddst"
            ),
        )
    else:
        oriented = edges.select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.col("v").alias("__ddst"),  # id order IS the rank
        )
    x = oriented.alias("x")
    y = oriented.alias("y")
    wedge_lt = F.struct(F.col("x.__ddst"), F.col("x.dst")) < F.struct(
        F.col("y.__ddst"), F.col("y.dst")
    )
    wedges = x.join(y, (F.col("x.src") == F.col("y.src")) & wedge_lt).select(
        F.col("x.dst").alias("src"), F.col("y.dst").alias("dst")
    )
    closing = oriented.select("src", "dst")
    tri = wedges.join(closing, ["src", "dst"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    counts = edges.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    ).crossJoin(
        F.broadcast(
            degrees(edges).agg(
                F.count(F.lit(1)).cast("long").alias("n_nodes")
            )
        )
    )
    return tri.crossJoin(F.broadcast(counts)).select(
        "n_triangles", "n_edges", "n_nodes"
    )


def pagerank_fixed(
    edges: DataFrame,
    *,
    iterations: int = 3,
    checkpoint_every: int = 4,
    checkpoint: str = "local",
) -> DataFrame:
    """Fixed-point PageRank over an undirected (u, v) edge list, exact
    in integers: ranks live in BIGINT micro-units (node mass starts at
    1_000_000), damping 0.85 is the integer rule

        r' = 150_000 + Σ_in (r_u * 85) div (100 * deg_u)

    with `div` the integral division BOTH engines define identically on
    positives — so K iterations produce bit-identical BIGINTs in Spark
    and a SQL oracle, where float PageRank accumulates engine-order
    drift.  The flooring leaks ≤ 1 micro-unit per in-edge per round
    (documented fixed-point approximation; ranking order is what
    PageRank is for).

    Scale: each iteration is one rank-keyed join onto the directed edge
    list plus one map-side-combining groupBy on dst — the classic
    message-passing round, shuffles ∝ edges.  Degrees join once up
    front; undirected edges contribute in both directions, so every
    node has in-edges and out-degree ≥ 1 (no dangling-mass terms).
    ``checkpoint_every`` truncates lineage every few rounds (the
    connected-components pattern) so deep iteration counts don't grow
    the plan unboundedly; ``checkpoint="reliable"`` makes each cut
    durable via the context's checkpoint dir — the executor-loss-safe
    cluster posture (operators/iterate.py)."""
    if iterations < 1:
        raise ValueError(f"need iterations >= 1; got {iterations}")
    fwd = edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    rev = edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    directed = fwd.unionAll(rev)
    deg = degrees(edges).select(
        F.col("node").alias("src"), F.col("degree").alias("__deg")
    )
    msgs = directed.join(deg, "src")
    ranks = degrees(edges).select(
        "node", F.lit(1_000_000).cast("long").alias("r")
    )
    _slot = TruncateSlot()  # the ranks chain: each cut frees the previous
    for i in range(iterations):
        contrib = msgs.join(
            ranks.select(F.col("node").alias("src"), "r"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.expr("(r * 85) div (100 * __deg)").alias("__c"),
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit(150_000).cast("long") + F.sum("__c")).alias("r")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = truncate(ranks, checkpoint, slot=_slot)
    return ranks


def item_similarity(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    dp: int = 6,
) -> DataFrame:
    """Item-item cosine similarity from co-occurrence — the
    collaborative-filtering primitive: ``(u, v, sup, cos)`` per
    unordered pair (u < v) where ``sup`` counts distinct groups
    containing both and ``cos = sup / sqrt(g_u · g_v)`` with g_i the
    distinct groups containing item i.

    Counts are exact integers (the co-occurrence join dedups on
    (group, u, v) first, so a basket listing an item twice counts
    once); the cosine is one mirrored double division over them
    (sqrt is IEEE-correctly-rounded), rounded to ``dp``.

    Scale: the pair join is the basket-bounded co-occurrence shape
    (Σ|g|², cappable upstream); per-item group counts are a
    dimension-sized aggregate that broadcasts onto the pairs."""
    sup = co_occurrence_support(
        df, group_col, item_col, min_support=min_support
    )
    items = (
        df.where(F.col(item_col).isNotNull())
        .groupBy(F.col(item_col).alias("i"))
        .agg(F.count_distinct(F.col(group_col)).alias("gi"))
    )
    gu = F.broadcast(items.select(F.col("i").alias("u"), F.col("gi").alias("gu")))
    gv = F.broadcast(items.select(F.col("i").alias("v"), F.col("gi").alias("gv")))
    cos = F.round(
        F.col("sup").cast("double")
        / F.sqrt(F.col("gu").cast("double") * F.col("gv").cast("double")),
        dp,
    )
    return (
        sup.join(gu, "u").join(gv, "v")
        .select("u", "v", "sup", cos.alias("cos"))
    )


def similar_items_topk(sim: DataFrame, k: int = 3) -> DataFrame:
    """Top-k most similar items per item from an :func:`item_similarity`
    pair list: symmetrize the undirected pairs, then rank per item with
    a deterministic (cos desc, sup desc, other asc) tiebreak —
    ``(item, rnk, other, sup, cos)``.

    The ranking window is partitioned by item over the aggregated pair
    list — bounded by that item's surviving pairs, never raw baskets."""
    sym = sim.select(
        F.col("u").alias("item"), F.col("v").alias("other"), "sup", "cos"
    ).unionByName(
        sim.select(
            F.col("v").alias("item"), F.col("u").alias("other"), "sup", "cos"
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("item").orderBy(
        F.col("cos").desc(), F.col("sup").desc(), F.col("other").asc()
    )
    return (
        sym.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("item", "rnk", "other", "sup", "cos")
    )


def association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Market-basket association rules from co-occurrence: one DIRECTED
    rule a→b per ordered pair of a surviving unordered pair —
    ``(antecedent, consequent, sup, confidence_milli, lift_milli)``
    where

        confidence = sup(a,b) / groups(a)
        lift       = N · sup(a,b) / (groups(a) · groups(b))

    in exact integer milli-units (numerators multiplied by ``scale``
    before the integer division, the pagerank_fixed discipline), with
    N = distinct groups.  lift > 1000 milli means the pair co-occurs
    more than independence predicts — the "frequently bought together"
    cutoff.

    Scale: the pair support is the basket-bounded co-occurrence join;
    per-item group counts and the N singleton broadcast onto the
    surviving pairs; symmetrization is a union of two projections."""
    sup = co_occurrence_support(
        df, group_col, item_col, min_support=min_support
    )
    items = (
        df.where(F.col(item_col).isNotNull())
        .groupBy(F.col(item_col).alias("i"))
        .agg(F.count_distinct(F.col(group_col)).alias("gi"))
    )
    n = df.where(F.col(item_col).isNotNull()).agg(
        F.count_distinct(F.col(group_col)).alias("n_groups")
    )
    directed = sup.select(
        F.col("u").alias("antecedent"),
        F.col("v").alias("consequent"),
        "sup",
    ).unionByName(
        sup.select(
            F.col("v").alias("antecedent"),
            F.col("u").alias("consequent"),
            "sup",
        )
    )
    ga = F.broadcast(
        items.select(F.col("i").alias("antecedent"), F.col("gi").alias("ga"))
    )
    gb = F.broadcast(
        items.select(F.col("i").alias("consequent"), F.col("gi").alias("gb"))
    )
    return (
        directed.join(ga, "antecedent")
        .join(gb, "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "sup",
            F.expr(f"(sup * {scale}) div ga").alias("confidence_milli"),
            F.expr(f"(sup * n_groups * {scale}) div (ga * gb)").alias(
                "lift_milli"
            ),
        )
    )
