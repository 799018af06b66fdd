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



@register(
    "text_chunk_overlap",
    oracle=r"""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    m AS (SELECT doc_id, text, n,
                 greatest(1, (n - 64 + 447) // 448) AS n_chunks
          FROM d),
    c AS (SELECT doc_id, u.i AS chunk_idx, u.i * 448 AS chunk_start,
                 substr(text, u.i * 448 + 1, 512) AS chunk_text
          FROM m, unnest(generate_series(0, n_chunks - 1)) AS u(i))
    SELECT doc_id, chunk_idx, chunk_start, chunk_text,
           length(chunk_text) AS chunk_len
    FROM c
    """,
    tags=("text", "chunking"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 512-char chunks with 64-char overlap over every
    document -- the RAG/embedding ingestion primitive.  Map-only
    per-row explode; text never shuffles (operators/chunking.py)."""
    from ubw_spark.operators.chunking import chunk_documents

    d = table(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", chunk_chars=512, overlap=64)
