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


@register(
    "stratified_sample_counts",
    oracle="""
    WITH s AS (
      SELECT lang, doc_id,
             ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM documents)
    SELECT lang, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM s
    WHERE bucket < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
                             ELSE 1000 END
    GROUP BY 1
    """,
    tags=("splits", "sampling"),
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (en 50%, de 25%, rest 10%) —
    map-only hash filter, reproducible in SQL; the downsample-the-
    boilerplate / keep-the-rare-language primitive of corpus curation."""
    from ubw_spark.operators.splits import stratified_sample

    d = table(spark, sf_dir, "documents")
    kept = stratified_sample(
        d, "lang", "doc_id", {"en": 0.5, "de": 0.25}, default_fraction=0.1
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "leakage_safe_split",
    oracle="""
    WITH s AS (
      SELECT source,
             ('0x' || substr(md5('bysource:' || source), 1, 8))::BIGINT
               % 10000 AS bucket,
             doc_id
      FROM documents)
    SELECT CASE WHEN bucket < 9000 THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs, count(DISTINCT source) AS n_sources
    FROM s GROUP BY 1
    """,
    tags=("splits",),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware split: hash the SOURCE, not the doc id, so every
    document from one source lands in the same split — near-duplicate
    pages from a site can't straddle train/test (the classic
    contamination bug).  Tested invariant: each source maps to exactly
    one split."""
    d = table(spark, sf_dir, "documents")
    out = assign_split(
        d, "source", {"train": 0.9, "test": 0.1}, salt="bysource"
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "curation_weighted_sample",
    oracle=r"""
    WITH s AS (
      SELECT lang, doc_id, n_chars,
             -- u in (0,1) EXCLUSIVE ((b+1)/10001) and key rounded to
             -- 12 dp: mirrors operators/splits.py numerics exactly
             round(pow(
               ((('0x' || substr(md5('wsample:' || doc_id::VARCHAR), 1, 8))
                 ::BIGINT % 10000) + 1) / 10001.0,
               1.0 / n_chars), 12) AS es_key
      FROM documents WHERE n_chars > 0),
    r AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY es_key DESC, doc_id) AS rn
      FROM s)
    SELECT lang, doc_id, n_chars FROM r WHERE rn <= 5
    """,
    tags=("splits", "sampling", "curation"),
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-5 weighted sample per language (Efraimidis-Spirakis
    A-ES over a deterministic hash-uniform, weight = n_chars): the
    quality-weighted reproducible selection primitive -- long docs are
    preferred but the choice stays random and identical across
    runs/engines.  One group-keyed window shuffle."""
    from ubw_spark.operators.splits import weighted_sample_per_group

    d = table(spark, sf_dir, "documents")
    return weighted_sample_per_group(
        d.select("lang", "doc_id", "n_chars"),
        "lang", "doc_id", "n_chars", k=5,
    ).select("lang", "doc_id", "n_chars")
