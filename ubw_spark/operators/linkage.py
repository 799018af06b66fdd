"""Blocked fuzzy entity linkage (record linkage / entity resolution).

Joining two catalogs on "is this the same entity" can't be an equi-join
(names drift: typos, abbreviations, re-listings), and the naive
alternative — all-pairs edit distance — is O(|A|·|B|): dead at any
scale.  The classical fix (Fellegi & Sunter 1969; Newcombe 1959) is
BLOCKING: only rows sharing a cheap deterministic key (name prefix,
brand, sorted-token signature) become candidate pairs, then a weighted
agreement score over the candidate's fields decides match / possible /
non-match.

Spark shape: the block join is a plain equi-join on the block key —
one keyed shuffle each side, candidates ∝ Σ_blocks |A_b|·|B_b|, never
|A|·|B|.  Hot blocks (a generic name fragment) are the skew trap; both
sides reuse the dedup family's ``cap_buckets`` window cap, and the
dropped blocks are countable via ``oversized_buckets`` so a production
run can route them to a tighter key instead of silently exploding.
Similarity is ``levenshtein`` — a JVM builtin on both engines — plus
exact/tolerance field agreements; no UDFs anywhere.

Reference parity: extends the reference's join surface (SURVEY.md
§2.3, equi/cross only) with the approximate-match join every data
curation pipeline needs for catalog merging and near-entity dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ubw_spark.operators.dedup import cap_buckets


def blocked_candidates(
    a: DataFrame,
    b: DataFrame,
    block_cols: list[str],
    *,
    suffixes: tuple[str, str] = ("_a", "_b"),
    max_block: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing the blocking key: non-block columns come
    out suffixed, block columns once, unsuffixed.  With ``max_block``,
    blocks whose occupancy exceeds it are dropped on EACH side before
    the join (the LSH hot-bucket cap — a block of m rows costs m² pairs,
    so one degenerate key otherwise dominates the whole stage; count
    the drops with ``oversized_buckets(df, block_cols, max_block)``)."""
    if max_block is not None:
        a = cap_buckets(a, block_cols, max_block)
        b = cap_buckets(b, block_cols, max_block)
    sa, sb = suffixes
    ra = a.select(
        *block_cols,
        *[
            F.col(c).alias(c + sa)
            for c in a.columns
            if c not in block_cols
        ],
    )
    rb = b.select(
        *block_cols,
        *[
            F.col(c).alias(c + sb)
            for c in b.columns
            if c not in block_cols
        ],
    )
    return ra.join(rb, block_cols)


def edit_similarity(x: Column, y: Column) -> Column:
    """Normalized edit similarity in [0, 1]: 1 - lev/max(len) — the
    double division is associated identically in the SQL oracles.
    Two empty strings are identical (1.0), not 0/0 = NULL, which would
    NULL-poison a weighted linkage_score; NULL inputs still propagate
    NULL (unknown, not similar)."""
    longest = F.greatest(F.length(x), F.length(y))
    return F.when(longest == 0, F.lit(1.0)).otherwise(
        F.lit(1.0)
        - F.levenshtein(x, y).cast("double") / longest.cast("double")
    )


def linkage_score(rules: list[tuple[float, Column]]) -> Column:
    """Weighted agreement score: Σ wᵢ·termᵢ (terms in [0, 1]), rounded
    6dp.  Left-associated in rule order — the oracle mirrors the same
    order, so the float sum is bit-identical."""
    if not rules:
        raise ValueError("linkage_score: need at least one rule")
    out = None
    for w, term in rules:
        piece = F.lit(w) * term.cast("double")
        out = piece if out is None else out + piece
    return F.round(out, 6)
