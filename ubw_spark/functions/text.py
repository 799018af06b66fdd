"""Reusable text-normalization / masking expression builders — the
pre-training-corpus cleaning vocabulary, all JVM-side expressions.

These are the building blocks the text queries compose; exposing them as
functions makes the cleaning pipeline declarative:

    docs.select(clean := normalize_text(F.col("text")),
                masked := mask_pii(clean))
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ubw_spark.functions.hof import let


def tokens(c: Column) -> Column:
    r"""THE whitespace tokenization every gram operator shares:
    ``split(trim(lower(c)), '\s+')`` — DuckDB twin
    ``regexp_split_to_array(trim(lower(text)), '\s+')``.

    One definition on purpose: word_shingles (dedup), the bloom probe's
    short-doc guard, and the query-side helpers must agree EXACTLY on
    what a token is, because guards like "tokens >= n iff grams
    nonempty" and every gram oracle ride on that equivalence — four
    hand-inlined copies of this expression used to drift-risk it."""
    return F.split(F.trim(F.lower(c)), r"\s+")


def normalize_text(c: Column) -> Column:
    """Lowercase, collapse whitespace runs, strip edges — the canonical
    form used by fingerprinting and dedup."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def strip_punctuation(c: Column) -> Column:
    return F.regexp_replace(c, r"[^\w\s]", "")


def mask_emails(c: Column, token: str = "<EMAIL>") -> Column:
    return F.regexp_replace(
        c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", token
    )


def mask_numbers(c: Column, token: str = "<NUM>") -> Column:
    """Mask digit runs of 4+ (ids, phones, cards) — short numbers carry
    linguistic content and stay."""
    return F.regexp_replace(c, r"\d{4,}", token)


def mask_urls(c: Column, token: str = "<URL>") -> Column:
    return F.regexp_replace(c, r"https?://\S+", token)


def mask_pii(c: Column) -> Column:
    """Composed conservative PII pass: urls → emails → long digit runs.
    Order matters (emails inside urls are already gone)."""
    return mask_numbers(mask_emails(mask_urls(c)))


def char_ngrams(c: Column, n: int = 3) -> Column:
    """Distinct character n-grams (for n-gram Jaccard on short strings
    where word shingles are too coarse).  The char array is let-bound
    (functions/hof.py) so the split runs once per string, not once per
    element_at reference — no CSE exists inside HOF lambdas.  Strings
    shorter than n yield an empty array (Spark's sequence(1, 0) counts
    DOWN — guard needed)."""
    length = F.length(c)

    def grams(chars: Column) -> Column:
        g = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), length - (n - 1)),
                lambda i: F.concat(
                    *[F.element_at(chars, i + j) for j in range(n)]
                ),
            )
        )
        return F.when(length >= n, g).otherwise(
            F.array().cast("array<string>")
        )

    return let(F.split(c, ""), grams)
