"""Text-normalization / masking query (the corpus-cleaning pass) with a
SQL oracle mirroring each regexp stage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.functions.text import (
    char_ngrams,
    mask_pii,
    normalize_text,
    strip_punctuation,
)
from ubw_spark.queries.registry import register, table


@register(
    "text_normalize_mask",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS clean
      FROM documents WHERE doc_id < 150)
    SELECT doc_id,
           clean,
           regexp_replace(clean, '[^\w\s]', '', 'g') AS no_punct,
           regexp_replace(
             regexp_replace(
               regexp_replace(clean, 'https?://\S+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\d{4,}', '<NUM>', 'g') AS masked,
           len(list_distinct(list_transform(
             generate_series(1, greatest(length(clean) - 2, 0)),
             i -> substr(clean, i, 3)))) AS n_char_trigrams
    FROM norm
    """,
    tags=("text",),
)
def text_normalize_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalize → strip punctuation → mask urls/emails/long numbers →
    char-trigram count; every stage a JVM regexp, zero Python."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    clean = normalize_text(F.col("text"))
    out = d.select("doc_id", clean.alias("clean"))
    return out.select(
        "doc_id",
        "clean",
        strip_punctuation(F.col("clean")).alias("no_punct"),
        mask_pii(F.col("clean")).alias("masked"),
        F.size(char_ngrams(F.col("clean"), 3)).alias("n_char_trigrams"),
    )
