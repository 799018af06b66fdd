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

from pyspark.sql import Column, DataFrame, Window
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


def sorted_neighborhood_pairs(
    df: DataFrame,
    block_cols: list[str],
    sort_col: str,
    *,
    window: int = 3,
    id_col: str = "id",
    suffixes: tuple[str, str] = ("_a", "_b"),
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Multi-pass sorted-neighborhood candidates (Hernández & Stolfo
    1995): within each block, sort by ``sort_col`` and pair every row
    with its next ``window - 1`` neighbors.  The OTHER classical
    blocking scheme: where :func:`blocked_candidates` pays |block|² and
    needs the hot-block cap, SNM pays |block|·(window-1) — bounded for
    ANY block size — at the price of missing matches that sort far
    apart (run several passes with different sort keys, the standard
    remedy).

    Spark shape: one per-block sort (the window exchange), then a
    map-only ``lead`` fan-out — leads collected into a struct array and
    exploded, no self-join, no global window (the sort is partitioned
    by the block, satisfying the registry lint).  Emits one row per
    (row, following-neighbor) pair with ``sort_col``/``id_col``/
    ``carry_cols`` suffixed."""
    if window < 2:
        raise ValueError(f"need window >= 2; got {window}")
    carry = list(carry_cols or [])
    sa, sb = suffixes
    w = Window.partitionBy(*block_cols).orderBy(sort_col, id_col)
    picked = [id_col, sort_col, *carry]
    # window expressions can't live inside a generator — materialize
    # the leads as columns, THEN array+explode the plain attributes
    staged = df.select(
        *block_cols,
        *picked,
        *[
            F.lead(c, i).over(w).alias(f"__l{i}_{c}")
            for i in range(1, window)
            for c in picked
        ],
    )
    neigh = F.array(
        *[
            F.struct(
                *[F.col(f"__l{i}_{c}").alias(c) for c in picked]
            )
            for i in range(1, window)
        ]
    )
    exploded = staged.select(
        *block_cols,
        *picked,
        F.explode(neigh).alias("__nb"),
    ).where(F.col(f"__nb.{id_col}").isNotNull())
    return exploded.select(
        *block_cols,
        *[F.col(c).alias(c + sa) for c in picked],
        *[F.col(f"__nb.{c}").alias(c + sb) for c in picked],
    )
