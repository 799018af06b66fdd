"""Deterministic dataset splitting for training pipelines.

``assign_split`` buckets rows by a portable hash of their id into named
splits with given weights.  Unlike ``df.randomSplit`` this is:

- deterministic across runs, engines, partitionings, and retries
  (no RNG, no partition-order sensitivity);
- stable under corpus growth — a document keeps its split when new data
  arrives (critical to avoid train/test leakage across dataset
  versions);
- reproducible in SQL (same md5 bucket arithmetic), so split membership
  itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ubw_spark.operators.dedup import portable_hash

_BUCKETS = 10_000


def _salted_bucket(id_col: Column, salt: str) -> Column:
    """THE hash-bucket recipe (md5-portable hash of "salt:id" mod
    10000) — single definition for every sampling/splitting operator
    in this module; the SQL oracles mirror it literally."""
    return (
        portable_hash(F.concat(F.lit(salt + ":"), id_col.cast("string")))
        % _BUCKETS
    )


def split_column(
    id_col: Column, splits: dict[str, float], salt: str = "split"
) -> Column:
    """Split-name column from cumulative hash-bucket thresholds.

    Hash input is salt+id so different salts give independent splits."""
    total = sum(splits.values())
    bucket = _salted_bucket(id_col, salt)
    expr = None
    acc = 0.0
    items = list(splits.items())
    for name, w in items[:-1]:
        acc += w / total
        threshold = int(acc * _BUCKETS)
        expr = (
            F.when(bucket < threshold, name)
            if expr is None
            else expr.when(bucket < threshold, name)
        )
    last = items[-1][0]
    return expr.otherwise(last) if expr is not None else F.lit(last)


def assign_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train'/'valid'/'test' by default,
    98/1/1)."""
    splits = splits or {"train": 0.98, "valid": 0.01, "test": 0.01}
    return df.withColumn(
        "split", split_column(F.col(id_col), splits, salt)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Exactly-k weighted random sample per group WITHOUT replacement
    (Efraimidis–Spirakis A-ES, IPL 2006): key = u^(1/w) with u a
    deterministic hash-uniform in (0,1]; the k largest keys per group
    are a weighted sample.  Quality-weighted corpus selection ("keep 5
    docs per language, preferring long/high-quality ones, but keep the
    choice random and REPRODUCIBLE") in one partitioned window — no
    driver-side randomness, re-runs/engines agree, oracle-checkable.

    Rows with weight <= 0 are excluded (A-ES precondition).  Ordering
    ties break on id.  One shuffle keyed by group; same scale shape as
    every top-k-per-group here.

    Numerics, both load-bearing:
    - u = (bucket+1)/(BUCKETS+1) lies in (0, 1) EXCLUSIVE: with
      /BUCKETS the top bucket maps to u = 1.0 exactly, whose key
      pow(1, 1/w) = 1 outranks every other row REGARDLESS of weight —
      ~1/BUCKETS of rows would hijack the sample.
    - the key is rounded to 12 dp before ranking (repo convention:
      ranking doubles are rounded on both engine sides so a 1-ulp
      libm pow divergence can't flip an order); ties break on id."""
    from pyspark.sql import Window

    u = (
        _salted_bucket(F.col(id_col), salt) + 1
    ) / float(_BUCKETS + 1)
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 12)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("__es_key"), F.col(id_col)
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__es_key", key)
        .withColumn("__es_rn", F.row_number().over(w))
        .where(F.col("__es_rn") <= k)
        .drop("__es_key", "__es_rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash
    bucket falls under its stratum's fraction.

    The training-pipeline workhorse (downsample boilerplate languages,
    keep all of the rare ones) with none of ``df.sample``'s drawbacks:
    exactly reproducible across runs/engines/partitionings, stable under
    corpus growth, and membership is plain SQL (oracle-checkable).
    Map-only — no shuffle, filter runs at the scan."""
    bucket = _salted_bucket(F.col(id_col), salt)
    thr: Column | None = None
    for name, frac in fractions.items():
        t = F.lit(int(frac * _BUCKETS))
        thr = (
            F.when(F.col(strata_col) == name, t)
            if thr is None
            else thr.when(F.col(strata_col) == name, t)
        )
    thr = (
        thr.otherwise(F.lit(int(default_fraction * _BUCKETS)))
        if thr is not None
        else F.lit(int(default_fraction * _BUCKETS))
    )
    return df.where(bucket < thr)
