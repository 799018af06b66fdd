"""Sequence packing for LLM training pipelines: assign documents to
fixed-length training windows (concat-then-chunk semantics).

``pack_concat_chunks`` computes, for every document, where its tokens
land when the corpus is concatenated in id order and sliced into
``chunk_len``-token training sequences: the first sequence id, the
offset inside it, and how many sequences the document straddles.
Downstream, a writer groups by ``seq_id`` to emit packed examples.

Scale: the naive formulation is one global cumulative sum — a single
unpartitioned window that funnels 100 TB through one task.  This
implementation uses the standard **two-phase distributed prefix sum**:

1. bucket documents by id range (``bucket_width`` ids per bucket),
   compute per-bucket token totals — an ordinary partial-aggregated
   groupBy;
2. cumulative-sum the bucket totals — a window over ``N /
   bucket_width`` rows (millions of buckets for a 100 TB corpus: tiny);
3. broadcast the bucket offsets back and finish with a window
   partitioned BY BUCKET — each task scans one bucket's rows.

No stage ever sees more than one bucket of rows or the (small) bucket
ledger, and every step is deterministic in doc id order, so the whole
assignment is reproducible in plain SQL (the oracle is the naive
global-window cumsum, which DuckDB can afford at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    chunk_len: int = 2048,
    bucket_width: int = 4096,
) -> DataFrame:
    """Add packing columns to ``df`` (one row per document):

    - ``tok_start``: global token offset of the document's first token
      when the corpus is concatenated in ascending ``id_col`` order;
    - ``seq_id``: the training sequence (chunk of ``chunk_len`` tokens)
      containing that first token;
    - ``seq_offset``: position inside that sequence;
    - ``n_seqs``: how many sequences the document spans (≥1; documents
      longer than ``chunk_len`` straddle several).

    ``id_col`` must be numeric; ids need not be dense — buckets just
    vary in occupancy."""
    bucket = (F.col(id_col) / bucket_width).cast("long").alias("__bucket")
    t = df.select(F.col(id_col), F.col(tokens_col), bucket)

    totals = t.groupBy("__bucket").agg(
        F.sum(tokens_col).cast("long").alias("__bucket_tokens")
    )
    # Running offset over the bucket ledger: N/bucket_width rows, single
    # narrow window — intentionally tiny.
    ledger = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__bucket_tokens").over(ledger), F.lit(0)).alias(
            "__offset"
        ),
    )

    within = Window.partitionBy("__bucket").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    start = (
        F.col("__offset")
        + F.sum(tokens_col).over(within)
        - F.col(tokens_col)
    ).cast("long")
    seq_id = F.floor(start / chunk_len)
    end_seq = F.floor((start + F.col(tokens_col) - 1) / chunk_len)
    return (
        t.join(broadcast(offsets), "__bucket")
        .select(
            id_col,
            tokens_col,
            start.alias("tok_start"),
            seq_id.alias("seq_id"),
            (start % chunk_len).alias("seq_offset"),
            F.when(F.col(tokens_col) > 0, end_seq - seq_id + 1)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_seqs"),
        )
    )
