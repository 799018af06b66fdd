"""Winnowing fingerprint query — rolling char-5-gram hashes, window-4
minima (MOSS).  Fully oracled: the portable md5 hash makes the entire
rolling pipeline reproducible in SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.winnow import gram_hashes, winnow_fingerprints_df
from ubw_spark.queries.registry import register, table


@register(
    "text_winnow_fingerprints",
    oracle="""
    WITH g AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 100),
    h AS (SELECT doc_id,
            list_transform(generate_series(1, greatest(length(t) - 4, 0)),
              i -> ('0x' || substr(md5(substr(t, i, 5)), 1, 8))::BIGINT) AS hs
          FROM g)
    SELECT doc_id,
           len(list_distinct(
             list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
               i -> list_aggregate(hs[i:i+3], 'min')))) AS n_fingerprints,
           list_aggregate(hs, 'min') AS min_gram_hash
    FROM h
    """,
    tags=("text", "dedup"),
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    fps = winnow_fingerprints_df(d, "doc_id", "text", k=5, window=4)
    counts = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints")
    )
    min_hash = d.select(
        "doc_id",
        F.array_min(gram_hashes(F.lower(F.col("text")), 5)).alias(
            "min_gram_hash"
        ),
    )
    return counts.join(min_hash, "doc_id")


@register(
    "winnow_overlap_pairs",
    oracle="""
    WITH g AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 200),
    h AS (SELECT doc_id,
            list_transform(generate_series(1, greatest(length(t) - 4, 0)),
              i -> ('0x' || substr(md5(substr(t, i, 5)), 1, 8))::BIGINT) AS hs
          FROM g),
    fp AS (SELECT doc_id, unnest(list_distinct(
             list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
               i -> list_aggregate(hs[i:i+3], 'min')))) AS f
           FROM h),
    capped AS (SELECT * FROM fp QUALIFY count(*) OVER (PARTITION BY f) <= 64)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS shared_fingerprints
    FROM capped a JOIN capped b ON a.f = b.f AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 20
    """,
    tags=("text", "dedup"),
)
def winnow_overlap_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-detection pairs: docs sharing ≥20 winnowed fingerprints
    (inverted-index self-join, high-df fingerprints capped at 64 —
    boilerplate carries no signal).  Fully oracled end to end including
    the cap, like the MinHash banding."""
    from ubw_spark.operators.winnow import winnow_overlap_pairs

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return winnow_overlap_pairs(
        d, "doc_id", "text", k=5, window=4, min_shared=20, max_doc_freq=64
    )
