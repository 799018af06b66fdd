"""Sliding-window document chunking (RAG / long-context ingestion).

Splits each document into fixed-size character chunks with overlap —
the ingestion primitive for embedding pipelines and long-document
processing.  Map-only: chunk starts are a per-row ``sequence`` +
``posexplode``; text never shuffles and fanout is len/stride per doc,
so 100 TB chunks exactly like it scans.

Chunk math (all integer, engine-portable): stride = chunk - overlap;
m = max(1, ceil((len - overlap) / stride)) chunks at starts
0, stride, 2·stride, …; the last chunk may be shorter.  Consecutive
chunks share exactly ``overlap`` characters (except a shorter tail),
and the union of chunks covers the document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, chunk_idx, chunk_start, chunk_text, chunk_len), one row per
    chunk, 0-based idx/start.  Empty or short docs yield exactly one
    chunk (the whole document)."""
    if overlap >= chunk_chars:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_chars ({chunk_chars})"
        )
    stride = chunk_chars - overlap
    n = F.length(F.col(text_col))
    # integer ceil((n - overlap)/stride) via (x + stride - 1) DIV stride;
    # doubles are exact for any realistic doc length, and the SQL twin
    # uses the same formula so floor() agrees bit-for-bit.
    m = F.greatest(
        F.lit(1),
        F.floor((n - overlap + (stride - 1)) / F.lit(stride)).cast("long"),
    )
    starts = F.transform(
        F.sequence(F.lit(0), m - 1), lambda i: i * stride
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_idx",
        "chunk_start",
        # Column.substr accepts Column args (F.substring needs literals)
        F.col(text_col)
        .substr(F.col("chunk_start") + 1, F.lit(chunk_chars))
        .alias("chunk_text"),
    )
    return out.withColumn("chunk_len", F.length("chunk_text"))
