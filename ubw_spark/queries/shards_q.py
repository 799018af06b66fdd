"""Training-shard planning queries (operators/shards.py).

The trainer-feed step of the LLM pipeline: deterministic seeded
sharding, epoch reshuffling, curriculum ordering.  Every query is a
literal SQL mirror of the md5 permutation-key recipe, so the shard
PLAN itself is oracle-checked — membership, balance, decorrelation
across seeds, and the exact within-shard head order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ubw_spark.operators.shards import assign_shard, curriculum_bin
from ubw_spark.queries.registry import register, table


@register(
    "shard_plan_balance",
    oracle="""
    WITH s AS (
      SELECT n_chars,
             ('0x' || substr(md5('shard:1:' || doc_id::VARCHAR), 1, 8))
               ::BIGINT AS shard_key
      FROM documents)
    SELECT shard_key % 64 AS shard, count(*) AS n_docs,
           sum(n_chars)::BIGINT AS chars,
           min(shard_key) AS min_key, max(shard_key) AS max_key
    FROM s GROUP BY 1
    """,
    tags=("shards", "llm"),
)
def shard_plan_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard load report for a 64-shard seeded plan — the
    pre-flight check that hash sharding balanced docs AND bytes.

    Scale: map-only key computation, one map-side-combining groupBy on
    shard (64 groups).  At 100 TB this is the same plan: the report
    stays 64 rows no matter the corpus size."""
    d = table(spark, sf_dir, "documents")
    s = assign_shard(d, "doc_id", 64, seed=1)
    return s.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
        F.min("shard_key").alias("min_key"),
        F.max("shard_key").alias("max_key"),
    )


@register(
    "shard_epoch_reshuffle",
    oracle="""
    WITH s AS (
      SELECT ('0x' || substr(md5('shard:0:' || doc_id::VARCHAR), 1, 8))
               ::BIGINT % 16 AS shard_e0,
             ('0x' || substr(md5('shard:1:' || doc_id::VARCHAR), 1, 8))
               ::BIGINT % 16 AS shard_e1
      FROM documents)
    SELECT shard_e0, count(*) AS n_docs,
           sum(CASE WHEN shard_e0 = shard_e1 THEN 1 ELSE 0 END)::BIGINT
             AS n_same,
           count(DISTINCT shard_e1) AS n_e1_shards
    FROM s GROUP BY 1
    """,
    tags=("shards", "llm"),
)
def shard_epoch_reshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch decorrelation report: assign the corpus under seed 0 and
    seed 1 and show, per epoch-0 shard, how its docs scatter in epoch
    1 (~1/16 stay put, and they reach every epoch-1 shard).  Two
    map-only key columns on ONE pass over the corpus — reshuffling an
    epoch never rereads or rewrites the data, it's a new seed."""
    d = table(spark, sf_dir, "documents")
    two = (
        assign_shard(d, "doc_id", 16, seed=0, shard_col="shard_e0")
        .drop("shard_key")
        .transform(
            lambda x: assign_shard(
                x, "doc_id", 16, seed=1, shard_col="shard_e1"
            )
        )
    )
    return two.groupBy("shard_e0").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("shard_e0") == F.col("shard_e1")).cast("long")
        ).alias("n_same"),
        F.countDistinct("shard_e1").alias("n_e1_shards"),
    )


@register(
    "shard_curriculum_head",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             ('0x' || substr(md5('shard:2:' || doc_id::VARCHAR), 1, 8))
               ::BIGINT AS shard_key,
             (n_chars >= 200)::INT + (n_chars >= 300)::INT
               + (n_chars >= 400)::INT AS bin
      FROM documents),
    r AS (
      SELECT shard_key % 8 AS shard, doc_id, n_chars, bin,
             row_number() OVER (PARTITION BY shard_key % 8
                                ORDER BY bin, shard_key, doc_id) AS rn
      FROM s)
    SELECT shard, rn, doc_id, bin, n_chars FROM r WHERE rn <= 3
    """,
    tags=("shards", "llm", "window"),
)
def shard_curriculum_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 3 documents each of 8 shards will feed the trainer
    under a short→long curriculum (bins at 200/300/400 chars, seeded
    permutation inside each bin) — pins the EXACT within-shard order
    ``write_training_shards`` materializes, not just membership.

    Scale: bin and key are map-only; the window is PARTITIONED by
    shard (never global) and row_number+filter plans as a per-group
    top-k, so state per task is 3 rows per shard."""
    d = table(spark, sf_dir, "documents")
    s = assign_shard(d, "doc_id", 8, seed=2).withColumn(
        "bin", curriculum_bin(F.col("n_chars"), [200, 300, 400])
    )
    w = Window.partitionBy("shard").orderBy("bin", "shard_key", "doc_id")
    return (
        s.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("shard", "rn", "doc_id", "bin", "n_chars")
    )
