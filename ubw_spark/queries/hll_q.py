"""HyperLogLog queries (operators/hll.py).

Every REGISTER is the same md5 + comparison-sum arithmetic in Spark and
DuckDB, so the sketch content — not just the estimate — is oracled; the
estimate arithmetic is mirrored by ``hll.estimate_sql`` with e0-typed
double literals and rounded at 6dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.operators.dedup import word_shingles
from ubw_spark.operators.hll import estimate_sql, hll_build, hll_estimate, rho_sql
from ubw_spark.queries.registry import register, table

#: DuckDB CTEs producing one row per DISTINCT (lang, bigram) with the two
#: portable hashes — dedup BEFORE hashing (registers are set-semantics, so
#: this changes nothing downstream and skips re-hashing repeats; the Spark
#: side gets the same effect from word_shingles' per-doc array_distinct).
#: rho is computed in a SEPARATE CTE referencing the hash COLUMN — inlining
#: the md5 expression into rho_sql would embed it 32× (the no-CSE trap,
#: mirrored here for the oracle's own runtime).
_BIGRAM_HASHES = r"""
    d AS (SELECT lang, regexp_split_to_array(trim(lower(text)), '\s+') AS w
          FROM documents),
    bg AS (SELECT DISTINCT lang, w[u.i] || ' ' || w[u.i + 1] AS bigram
           FROM d, unnest(generate_series(1, len(w) - 1)) u(i)),
    h AS (SELECT lang, bigram,
                 ('0x' || substr(md5('hll:b:' || bigram), 1, 8))::BIGINT
                   % {m} AS bucket,
                 ('0x' || substr(md5('hll:r:' || bigram), 1, 8))::BIGINT
                   AS hw
          FROM bg),
    hashed AS (SELECT lang, bigram, bucket, {rho} AS rho FROM h)
"""


def _bigram_oracle(p: int, lang_filter: str, group_by: str) -> str:
    m = 1 << p
    hashes = _BIGRAM_HASHES.format(m=m, rho=rho_sql("hw"))
    where = f"WHERE {lang_filter}" if lang_filter else ""
    sel = f"{group_by}, " if group_by else ""
    using = f"USING ({group_by})" if group_by else "ON 1 = 1"
    return f"""
    WITH {hashes},
    scoped AS (SELECT * FROM hashed {where}),
    regs AS (SELECT {sel}bucket, max(rho) AS r
             FROM scoped GROUP BY {sel}bucket),
    est AS ({estimate_sql(p, "regs", group_by)}),
    tru AS (SELECT {sel}count(DISTINCT bigram)::BIGINT AS true_distinct
             FROM scoped {f"GROUP BY {group_by}" if group_by else ""})
    SELECT {sel}est, true_distinct FROM est JOIN tru {using}
    """


def _bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "lang", F.explode(word_shingles(F.col("text"), 2)).alias("bigram")
    )


@register(
    "sketch_hll_cardinality",
    oracle=_bigram_oracle(8, "", "lang"),
    tags=("sketch", "llm"),
)
def sketch_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-bigram count per language via a p=8 (256-register)
    HyperLogLog, against the exact count.  ~900 distinct per lang >
    2.5m = 640, so this exercises the RAW harmonic-mean branch (the
    store query below exercises linear counting).  Scale: the shuffle
    is bounded at langs × 256 register rows; the exact side exists only
    for the audit — at 100 TB you'd ship registers, not the
    count_distinct shuffle of every value."""
    bg = _bigrams(spark, sf_dir)
    regs = hll_build(bg, "bigram", p=8, group_cols=["lang"])
    est = hll_estimate(regs, group_cols=["lang"])
    tru = bg.groupBy("lang").agg(
        F.count_distinct("bigram").alias("true_distinct")
    )
    return est.join(tru, "lang").select("lang", "est", "true_distinct")


@register(
    "sketch_hll_store_probe",
    oracle=_bigram_oracle(12, "lang = 'en'", ""),
    tags=("sketch", "llm", "index"),
)
def sketch_hll_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED lifecycle, p=12 on English bigrams: sketch HALF
    the corpus (even doc ids), write the versioned store, MAX-merge-
    append the other half, then append the SAME half AGAIN — an
    at-least-once redelivery, folded in as a no-op because max-merge is
    idempotent (the CMS store needs a batch_id high-water mark for
    this; the HLL store needs nothing).  The oracle sketches the full
    corpus in one pass: write → append → replay → load must yield the
    identical registers.  ~900 distinct << 2.5·4096, so the estimate
    comes from the linear-counting branch.

    Scale: every store step moves ≤ 2^p register rows; each half is
    scanned once, never re-read by the append."""
    import hashlib

    from ubw_spark.operators.hll import (
        append_hll_registers,
        estimate_hll_store,
        write_hll_store,
    )
    from ubw_spark.operators.iterate import truncate

    path = "/tmp/ubw_spark_hll_store_" + hashlib.md5(
        sf_dir.encode()
    ).hexdigest()[:10]
    d = table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    parity_col = F.coalesce(F.pmod(F.col("doc_id"), F.lit(2)), F.lit(0))
    # ONE corpus pass (round 13, guide §1.2/§8): the distinct-bigram
    # table with per-parity presence flags serves every lifecycle step
    # AND the exact truth count — previously the corpus was tokenized
    # four times (each half's build, the replayed build, the truth).
    # Registers from distinct items equal registers from occurrences
    # (MAX-aggregation; rho depends only on the item), and the replayed
    # delivery is BY DEFINITION the same batch again, so re-deriving
    # its registers from the materialized vocabulary is exact.  The
    # vocabulary is bounded by |distinct bigrams| — the same
    # vocabulary-sized state the BPE/term-drift operators stage.
    vocab = (
        d.select(
            parity_col.alias("__par"),
            F.explode(word_shingles(F.col("text"), 2)).alias("bigram"),
        )
        .groupBy("bigram")
        .agg(
            F.max(F.col("__par") == 0).alias("__p0"),
            F.max(F.col("__par") == 1).alias("__p1"),
        )
    )
    vocab = truncate(vocab, "local", eager=False)
    write_hll_store(hll_build(vocab.where("__p0"), "bigram", p=12), path)
    regs1 = hll_build(vocab.where("__p1"), "bigram", p=12)
    append_hll_registers(spark, regs1, path)
    append_hll_registers(spark, regs1, path)  # replayed delivery

    est = estimate_hll_store(spark, path)
    tru = vocab.where(F.col("bigram").isNotNull()).agg(
        F.count(F.lit(1)).alias("true_distinct")
    )
    return est.crossJoin(F.broadcast(tru))
