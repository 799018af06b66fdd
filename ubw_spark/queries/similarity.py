"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Brute-force cosine is the correctness baseline (exact, O(Q×N) — fine
when Q is small or N fits a broadcast).  The scale path is the
LSH-bucketed variant in ubw_spark.operators.similarity: candidates only
within matching hash buckets, turning O(N²) into O(N·bucket).

Dot products are pure `zip_with` + `aggregate` expressions — JVM-side,
no Python.  Ranking uses the 4-dp-rounded score (+ vec_id tiebreak) so
results are stable across engines and float orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ubw_spark.queries.registry import register, table


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, computed in float64."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return dot / (norm(a) * norm(b))


@register(
    "sim_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT qid, vec_id,
                  round(list_cosine_similarity(qe::DOUBLE[], embedding::DOUBLE[]), 4) AS cos_sim
           FROM q CROSS JOIN embeddings WHERE vec_id <> qid)
    SELECT qid, vec_id, cos_sim FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored) WHERE rn <= 5
    """,
    tags=("similarity",),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: top-5 neighbors for each of 5 query vectors.

    Scale: the QUERY side broadcasts (small), the corpus side streams —
    one map-side pass over N rows per batch of queries, then a per-query
    top-k window on Q×N scored rows (Q small ⇒ no skew)."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        emb.join(broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("qe"), F.col("embedding")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("qid", "vec_id", "cos_sim")
    )


@register(
    "sim_pairs_above_threshold",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 150 AND b.vec_id < 150
      AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25
    """,
    tags=("similarity", "dedup"),
)
def sim_pairs_above_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.25) inside a block.

    The id<150 block stands in for one LSH bucket: at scale the
    operators.similarity LSH assigns bucket ids and this exact kernel
    runs per bucket — same plan shape, bounded pair count."""
    from ubw_spark.functions.hof import fence

    emb = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 150)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    # fence + project-then-filter: an inline where(cos >= t) references
    # both join sides, so PushPredicateThroughJoin would move the fold
    # into the BNLJ condition AND the projection would re-run it — 2×
    # the pair kernel (caught by hof_filter_violations' join scope)
    scored = a.join(broadcast(b), F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", fence(cosine(F.col("ea"), F.col("eb"))).alias("__c")
    )
    return scored.where(F.col("__c") >= 0.25).select(
        "id_a", "id_b", F.round("__c", 4).alias("cos_sim")
    )


@register(
    "embedding_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))), 4) AS avg_norm
    FROM embeddings GROUP BY label
    """,
    tags=("similarity", "agg"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics — array reduce inside the row, then
    an ordinary partial-aggregated groupBy."""
    emb = table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
    )
