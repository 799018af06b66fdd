"""Connected-components query over the embedding-similarity graph, with
a recursive-CTE oracle (DuckDB WITH RECURSIVE transitive closure —
viable because near-dup graphs are small; Spark's label propagation is
the scale path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.components import connected_components
from ubw_spark.operators.similarity import cosine_col
from ubw_spark.queries.registry import register, table


def _sim_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 150)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    c = cosine_col(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(c >= 0.25)
        .select("id_a", "id_b")
    )


# One definition of the transitive-closure CTE chain, composed into
# every oracle in this module — a hand-maintained copy per registration
# would let a threshold/bound edit desynchronize twins that must pin
# the same answer.
_CC_PREFIX = """
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 150 AND b.vec_id < 150
        AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      WITH RECURSIVE r(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM r JOIN sym s ON r.b = s.a)
      SELECT * FROM r),
    comp AS (
      SELECT node, least(node, min_reach) AS component FROM (
        SELECT a AS node, min(b) AS min_reach FROM reach GROUP BY a))"""

#: Shared by BOTH connected-components registrations (local + reliable
#: checkpoint): the checkpoint policy is a failure-posture knob, never
#: a results knob — structural sharing keeps the twins on one answer.
_CC_ORACLE = _CC_PREFIX + """
    SELECT node, component FROM comp
    """


@register(
    "dedup_connected_components",
    oracle=_CC_ORACLE,
    tags=("dedup", "graph"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation over cosine-similarity edges (≥0.25 in the
    id<150 block): each node labeled with its component's min id."""
    comp = connected_components(_sim_edges(spark, sf_dir))
    return comp.select("node", "component")


@register(
    "dedup_cc_reliable_ckpt",
    oracle=_CC_ORACLE,
    tags=("dedup", "graph", "checkpoint"),
)
def dedup_cc_reliable_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION failure posture of dedup_connected_components
    under the driver gate (VERDICT r9 #5): every label-propagation
    round truncates lineage through a DURABLE parquet checkpoint
    (operators/iterate.py ``truncate(mode="reliable")`` + TruncateSlot
    reclamation) instead of executor-memory localCheckpoint — on a
    preemptible 1000-executor cluster an executor loss replays from the
    last durable round, not from the raw pair join.  Shares the
    recursive-CTE oracle with the local-mode twin: same answer,
    different crash story."""
    import atexit
    import shutil
    import tempfile

    # a context checkpoint dir is the operator's documented precondition
    # for reliable mode; production points this at HDFS/S3
    if spark.sparkContext.getCheckpointDir() is None:
        ckpt = tempfile.mkdtemp(prefix="ubw_ckpt_")
        spark.sparkContext.setCheckpointDir(ckpt)
        # Spark never deletes checkpoint files (cleanCheckpoints is off
        # by default) — reclaim the dir WE created at interpreter exit
        atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    comp = connected_components(
        _sim_edges(spark, sf_dir), checkpoint="reliable"
    )
    return comp.select("node", "component")


@register(
    "dedup_canonical_selection",
    oracle=_CC_PREFIX + """,
    ranked AS (
      SELECT c.component, c.node, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.node) AS rk,
             count(*) OVER (PARTITION BY c.component) AS n_members
      FROM comp c JOIN documents d ON d.doc_id = c.node)
    SELECT component, node AS canonical_id, n_members,
           n_chars AS canonical_chars
    FROM ranked WHERE rk = 1
    """,
    tags=("dedup", "graph", "curation"),
)
def dedup_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame, quality-aware: near-dup clusters (label
    propagation over the cosine graph) each elect the LONGEST member
    (n_chars desc, id tiebreak) as canonical — not the min id, which is
    what naive keep-lists do and what loses the best copy of a
    boilerplate cluster.  Embeddings and documents share the id space,
    so the cluster graph comes from vectors and the quality signal from
    the text table — the usual split in a real pipeline."""
    from pyspark.sql import Window

    comp = connected_components(_sim_edges(spark, sf_dir))
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = comp.join(docs, F.col("node") == F.col("doc_id"))
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("node")
    )
    wc = Window.partitionBy("component")
    return (
        labeled.withColumn("__rk", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .where(F.col("__rk") == 1)
        .select(
            "component",
            F.col("node").alias("canonical_id"),
            "n_members",
            F.col("n_chars").alias("canonical_chars"),
        )
    )


@register(
    "dedup_cluster_size_histogram",
    oracle=_CC_PREFIX + """,
    sizes AS (SELECT component, count(*) AS cluster_size
              FROM comp GROUP BY component)
    SELECT cluster_size,
           count(*)::BIGINT AS n_clusters,
           (cluster_size * count(*))::BIGINT AS n_docs,
           (cluster_size * count(*) - count(*))::BIGINT AS n_removable
    FROM sizes GROUP BY cluster_size
    """,
    tags=("dedup", "graph", "report"),
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-impact report every fuzzy-dedup run publishes: how many
    duplicate clusters of each size exist, how many docs they hold, and
    how many a keep-one-per-cluster policy removes (size-1 "clusters"
    never appear — singletons have no edges).  Two small aggregates on
    top of the component labels; the histogram is |distinct sizes| rows,
    driver-safe at any corpus scale."""
    comp = connected_components(_sim_edges(spark, sf_dir))
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("long")
        .alias("n_docs"),
        (F.col("cluster_size") * F.count(F.lit(1)) - F.count(F.lit(1)))
        .cast("long")
        .alias("n_removable"),
    )
