"""Deterministic training-shard planning.

The LAST step of a curation pipeline: hand the kept corpus to the
trainer as N shards whose within-shard order is a reproducible
pseudo-random permutation.  Three properties a 100 TB training run
needs and ``df.repartition(n).write`` alone does not give:

- **determinism** — shard membership and order derive from a portable
  md5 hash of (seed, id), not from RNG or partition order, so a retry,
  a different cluster size, or a different engine produces byte-equal
  shards (and the plan itself is oracle-checkable in SQL);
- **epoch reshuffling** — a new seed is a new independent permutation,
  so "shuffle between epochs" is a cheap metadata change, not a new
  random state to persist;
- **curriculum ordering** — an optional easy→hard bin prefix on the
  order key schedules low-loss data first without a global sort
  (bin is map-only; the sort stays within shards).

Scale shape: every key is a map-only column expression; the ONE
shuffle is the final ``repartition(n_shards, shard)`` (explicit
partition count — exempt from AQE coalescing) followed by a
sorted-within-partition write.  No global window, no driver collect.

Reference parity: the reference has no trainer-feeding sink; this
family extends its CRUD/write surface (SURVEY.md §2.2, e.g.
/root/reference/framework/ubw-slick/src/main/scala/net/scalax/ubw
/slick/helpers/SlickCrud.scala) with the LLM-pipeline shard writer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ubw_spark.operators.dedup import portable_hash


def shard_key(id_col: Column, seed: int = 0) -> Column:
    """Non-negative BIGINT permutation key for (seed, id) — THE hash
    recipe of this module (md5-portable, mirrored literally by the SQL
    oracles).  Different seeds give independent permutations."""
    return portable_hash(
        F.concat(F.lit(f"shard:{seed}:"), id_col.cast("string"))
    )


def assign_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    *,
    shard_col: str = "shard",
    key_col: str = "shard_key",
) -> DataFrame:
    """Add ``shard`` (= key % n_shards) and ``shard_key`` columns.

    Map-only.  Sorting a shard's rows by ``shard_key`` yields the
    seeded permutation; balance across shards follows from the hash
    (law of large numbers — see the ``shard_plan_balance`` query)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    k = shard_key(F.col(id_col), seed)
    return df.withColumn(key_col, k).withColumn(
        shard_col, F.col(key_col) % n_shards
    )


def curriculum_bin(score_col: Column, cutpoints: list[float]) -> Column:
    """Easy→hard bin index: the number of ``cutpoints`` at or below the
    score (0 .. len(cutpoints)).  Map-only sum of comparisons — no
    window, no quantile state — so the SQL oracle is a literal mirror.
    Callers wanting corpus-adaptive cutpoints compute them once with a
    percentile aggregate (the ``quantile_gate`` pattern) and pass the
    resulting constants here."""
    if not cutpoints:
        raise ValueError("cutpoints must be non-empty")
    if any(a >= b for a, b in zip(cutpoints, cutpoints[1:])):
        # duplicates would silently skip a bin number AND double-count
        # one threshold — reject, don't renumber
        raise ValueError(
            f"cutpoints must be strictly ascending, got {cutpoints}"
        )
    out = F.lit(0)
    for c in cutpoints:
        out = out + (score_col >= F.lit(c)).cast("int")
    return out


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    *,
    curriculum: tuple[str, list[float]] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``path/shard=K/`` parquet shards, each internally ordered
    by (curriculum bin,) shard_key — the deterministic trainer feed.
    Output columns are the input's plus ``shard``; the bookkeeping
    keys order the rows but are not written.

    ``curriculum=(score_col, cutpoints)`` schedules low bins first
    within every shard.  One explicit-count shuffle on shard, then a
    sorted write; re-running with the same seed rewrites identical
    shard contents (tested)."""
    # The bookkeeping names this function mints would silently REPLACE
    # (withColumn) and then DROP a caller's same-named columns — the
    # written shards would lose caller data with no error.  Reserved
    # names are a loud contract instead.
    reserved = {"shard", "shard_key"}
    if curriculum is not None:
        reserved.add("curriculum_bin")
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"write_training_shards: input already has column(s) "
            f"{sorted(clash)} — these names are minted internally and "
            "would be overwritten then dropped; rename them first"
        )
    d = assign_shard(df, id_col, n_shards, seed)
    bookkeeping = ["shard_key"]
    order = ["shard"]
    if curriculum is not None:
        score_col, cutpoints = curriculum
        d = d.withColumn(
            "curriculum_bin", curriculum_bin(F.col(score_col), cutpoints)
        )
        order.append("curriculum_bin")
        bookkeeping.append("curriculum_bin")
    order += ["shard_key", id_col]
    (
        d.repartition(n_shards, "shard")
        .sortWithinPartitions(*order)
        # drop the bookkeeping AFTER the sort (projection preserves
        # order): the trainer never reads these, and at 100 TB they'd
        # be real storage + scan width in every shard.  Only columns
        # THIS function added are dropped — a caller's own column named
        # curriculum_bin passes through when curriculum is None.
        .drop(*bookkeeping)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
