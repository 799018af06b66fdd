"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
— the MOSS algorithm): rolling char-k-gram hashes, keep the minimum hash
in each sliding window of w consecutive k-grams.  The selected
fingerprints are position-robust: any match of length ≥ w+k-1 between
two documents shares at least one fingerprint.

Spark-first: the whole pipeline is array expressions inside the row
(k-grams → portable hashes → per-window minima → distinct), so
fingerprinting is map-only and codegen'd; the only shuffle is the final
(fingerprint → docs) inverted-index groupBy, which carries 8-byte hashes
— never text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from ubw_spark.functions.hof import let
from ubw_spark.operators.dedup import portable_hash


def gram_hashes(text: Column, k: int = 5) -> Column:
    """Rolling char-k-gram portable hashes as array<bigint> — linear.

    The char array is LET-BOUND (functions/hof.py) so the split runs
    once per document — referenced unbound, each of the k element_at
    copies re-ran it per window (no CSE inside HOF lambdas; measured
    ~18× on the analogous word-shingle pipeline).  Texts shorter than
    k chars yield an empty array (guarded: Spark's ``sequence(1, 0)``
    counts DOWN and element_at(_, 0) throws)."""
    n = F.length(text)

    def hashes(chars: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat(
                *[F.element_at(chars, i + j) for j in range(k)]
            ),
        )
        return F.when(n >= k, F.transform(grams, portable_hash)).otherwise(
            F.array().cast("array<bigint>")
        )

    return let(F.split(text, ""), hashes)


def winnow_fingerprints_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Distinct winnowed fingerprints, one row per (id, fingerprint).

    Formulation matters: slicing the hash array inside a transform
    lambda re-evaluates the whole array per window (Catalyst inlines
    single-reference expensive expressions into higher-order lambdas —
    measured 75 s for 10 documents).  posexplode + a rows-frame window
    min is linear and shuffles once on the id."""
    hs = df.select(
        F.col(id_col),
        F.posexplode(gram_hashes(F.lower(F.col(text_col)), k)).alias(
            "__pos", "__h"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("__pos").rowsBetween(0, window - 1)
    n = Window.partitionBy(id_col)
    mins = hs.select(
        F.col(id_col),
        "__pos",
        F.min("__h").over(w).alias("fingerprint"),
        F.count(F.lit(1)).over(n).alias("__n"),
    )
    return (
        mins.where(F.col("__pos") <= F.col("__n") - window)
        .select(id_col, "fingerprint")
        .distinct()
    )


def fingerprint_index(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, window: int = 4
) -> DataFrame:
    """Inverted index (fingerprint → doc ids, df) for copy detection.
    Fingerprints shared by many docs = shared boilerplate/plagiarism."""
    fp = winnow_fingerprints_df(df, id_col, text_col, k, window)
    return fp.groupBy("fingerprint").agg(
        F.collect_set(id_col).alias("doc_ids"),
        F.count(F.lit(1)).alias("df"),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    window: int = 4,
    min_shared: int = 5,
    max_doc_freq: int | None = 64,
) -> DataFrame:
    """Candidate near-dup pairs sharing ≥ min_shared winnowed
    fingerprints — same banded-join scale shape as MinHash (shuffle
    hashes, join on hash, count per pair).

    ``max_doc_freq`` caps the self-join fanout per fingerprint: a
    fingerprint in m docs emits m·(m-1)/2 pairs, and boilerplate
    fingerprints (headers, license blocks) appear in thousands of docs.
    Dropping high-df fingerprints is the standard MOSS move — they carry
    no discriminative signal anyway; route their docs to exact dedup via
    :func:`ubw_spark.operators.dedup.oversized_buckets` on the
    fingerprint column."""
    fp = winnow_fingerprints_df(df, id_col, text_col, k, window).select(
        F.col(id_col), F.col("fingerprint").alias("fp")
    )
    if max_doc_freq is not None:
        from ubw_spark.operators.dedup import cap_buckets

        fp = cap_buckets(fp, ["fp"], max_doc_freq)
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .where(F.col("shared_fingerprints") >= min_shared)
    )
