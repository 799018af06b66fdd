"""Deterministic split assignment + explode/unnest queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.splits import assign_split
from ubw_spark.queries.registry import register, table


@register(
    "dataset_split_assignment",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'valid'
                ELSE 'test' END AS split,
           count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM s GROUP BY 1
    """,
    tags=("splits",),
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucketed 80/10/10 split — deterministic across runs, engines
    and dataset versions (a doc keeps its split as the corpus grows), and
    therefore oracle-checkable, unlike randomSplit."""
    d = table(spark, sf_dir, "documents")
    out = assign_split(
        d, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "explode_word_counts",
    oracle=r"""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
          FROM documents WHERE lang = 'en')
    GROUP BY 1 HAVING count(*) >= 100
    """,
    tags=("scalar", "text"),
)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface: explode (lateral view) → groupBy — word frequencies
    over the English corpus.  Scale: explode fans out rows but each
    carries one small string; the count aggregates map-side first."""
    d = table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    words = d.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 100)
    )
