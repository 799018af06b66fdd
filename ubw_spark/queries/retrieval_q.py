"""BM25 retrieval queries — in-memory scoring and the persisted
inverted-index probe, sharing ONE oracle (the store layout must not
change a single score).

Float contract: all SQL constants use ``e0`` notation so DuckDB plans
DOUBLE arithmetic (a bare ``1.2`` is DECIMAL there, which would diverge
from Spark's doubles); each addend rounds at 6 dp before the per-doc
sum, output+ordering at 4 dp — the repo's cross-engine summation rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.retrieval import bm25_topk, probe_term_index
from ubw_spark.queries.registry import register, table

#: The shared benchmark query — terms chosen from the synthetic corpus
#: vocabulary so tf/df/dl all vary across the hit set.
QUERY = "hash join slow stream"
TOP_K = 10

_BM25_ORACLE = r"""
    WITH dl AS (
      SELECT doc_id,
             length(regexp_split_to_array(trim(lower(text)), '\s+')) AS dl
      FROM documents),
    stats AS (
      SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total FROM dl),
    tf AS (
      SELECT doc_id, w AS term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
            FROM documents)
      WHERE w IN ('hash', 'join', 'slow', 'stream')
      GROUP BY doc_id, w),
    dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             round(
               ln(1e0 + (s.n_docs - dfs.df + 0.5e0) / (dfs.df + 0.5e0))
               * ((tf.tf * (1.2e0 + 1e0)) /
                  (tf.tf + 1.2e0 *
                   ((1e0 - 0.75e0) + 0.75e0 * d.dl
                    / ((s.total * 1.0e0) / s.n_docs)))),
               6) AS addend
      FROM tf
      JOIN dfs USING (term)
      JOIN dl d ON tf.doc_id = d.doc_id
      CROSS JOIN stats s)
    SELECT doc_id,
           count(*)::BIGINT AS n_terms_hit,
           round(sum(addend), 4) AS score
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 10
    """


@register(
    "search_bm25_topk",
    oracle=_BM25_ORACLE,
    tags=("search", "text", "retrieval"),
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed keyword query: the query-term filter
    lands directly on the exploded tokens (only hit rows shuffle), df
    and corpus stats are broadcast-sized aggregates, and the top-k is a
    TakeOrderedAndProject (plan-asserted in tests/test_plans.py)."""
    d = table(spark, sf_dir, "documents")
    return bm25_topk(d, "doc_id", "text", QUERY, k=TOP_K)


@register(
    "search_bm25_store_probe",
    oracle=_BM25_ORACLE,
    tags=("search", "retrieval", "index"),
)
def search_bm25_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED form: write the inverted index (term-hash-bucketed
    parquet through the versioned-manifest store), then answer the same
    query from postings alone — the probe names its buckets driver-side
    (static partition filter) and never rereads corpus text.  Same
    oracle as the in-memory query: the lifecycle must not change a
    score.  Timing includes the index write, which at 100 TB amortizes
    across every query (the dedup_incremental_index_probe contract)."""
    import hashlib

    from ubw_spark.operators.retrieval import write_term_index

    d = table(spark, sf_dir, "documents")
    path = "/tmp/ubw_spark_term_store_" + hashlib.md5(
        sf_dir.encode()
    ).hexdigest()[:10]
    write_term_index(d, "doc_id", "text", path)
    return probe_term_index(spark, path, QUERY, k=TOP_K)
