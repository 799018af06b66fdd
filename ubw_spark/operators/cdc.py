"""CDC / SCD2 emulation without a lakehouse table format.

``scd2_merge`` applies a batch of changes to a slowly-changing dimension
kept with (valid_from, valid_to, is_current) columns:

- changed keys: the current version is closed out (valid_to = change ts)
  and a new current version is appended;
- new keys: inserted as current;
- unchanged keys: pass through untouched.

Everything is joins + unions on the key — one shuffle each, no windows —
and returns the full new dimension for an atomic overwrite (or as the
source of a real MERGE INTO when a lakehouse format is available;
see sources/writers.py::upsert for the plain-upsert variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FAR_FUTURE = "9999-12-31 23:59:59"


def scd2_init(snapshot: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Bootstrap a dimension from a first snapshot."""
    return snapshot.select(
        *[c for c in snapshot.columns if c != ts_col],
        F.col(ts_col).alias("valid_from"),
        F.lit(_FAR_FUTURE).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Apply ``changes`` (key cols + attribute cols + ts_col) to an SCD2
    dimension produced by scd2_init/scd2_merge."""
    attr_cols = compare_cols or [
        c for c in changes.columns if c not in set(keys) | {ts_col}
    ]
    if not attr_cols:
        raise ValueError(
            "scd2_merge: changes carry no attribute columns to compare "
            "(only keys + ts) — pass compare_cols or include at least "
            "one non-key attribute"
        )
    # A batch may carry several changes per key; the full-outer join
    # below assumes at most one, so reduce to the LATEST per key first
    # (otherwise each duplicate mints its own is_current=true version).
    # Same-ts ties break on the attribute fingerprint: row_number over
    # ts alone would pick a shuffle-dependent winner, and every ordering
    # in this repo is deterministic by contract.
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(),
        F.md5(F.to_json(F.struct(*[F.col(c) for c in attr_cols]))).desc(),
    )
    changes = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    # Presence on each join side comes from an explicit marker column,
    # NOT from nullness of a data column (valid_from / ts may themselves
    # be NULL — inferring presence from them silently drops such rows
    # from every branch below).  Same pattern as incremental.py's
    # __in_delta.
    cur = dim.where(F.col("is_current")).withColumn(
        "__cur_present", F.lit(True)
    )
    hist = dim.where(~F.col("is_current"))

    # Rename every change column: the aliases mint fresh attribute ids,
    # so merging the output of a previous merge with the SAME changes
    # frame (self-join lineage) stays resolvable; all downstream
    # references are by unambiguous name, no "a.b" qualifiers.
    chg = changes.select(
        *[F.col(c).alias(f"__chg_{c}") for c in changes.columns],
        F.lit(True).alias("__chg_present"),
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__chg_{k}"))
    joined = cur.join(chg, cond, "full_outer")

    cmp = [
        ~F.col(c).eqNullSafe(F.col(f"__chg_{c}")) for c in attr_cols
    ]
    differs = cmp[0]
    for c in cmp[1:]:
        differs = differs | c
    chg_present = F.coalesce(F.col("__chg_present"), F.lit(False))
    cur_present = F.coalesce(F.col("__cur_present"), F.lit(False))

    dim_cols = ["valid_from", "valid_to", "is_current"]
    # 1. untouched current rows (no change arrived, or arrived identical)
    untouched = joined.where(
        cur_present & (~chg_present | ~differs)
    ).select(*keys, *attr_cols, *dim_cols)
    # 2. closed-out versions of genuinely changed keys
    closed = (
        joined.where(cur_present & chg_present & differs)
        .select(
            *keys,
            *attr_cols,
            F.col("valid_from"),
            F.col(f"__chg_{ts_col}").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    # 3. new current versions: changed keys + brand-new keys
    fresh = (
        joined.where(chg_present & (~cur_present | differs))
        .select(
            *[F.col(f"__chg_{k}").alias(k) for k in keys],
            *[F.col(f"__chg_{c}").alias(c) for c in attr_cols],
            F.col(f"__chg_{ts_col}").alias("valid_from"),
            F.lit(_FAR_FUTURE).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    cols = hist.columns
    return (
        hist.select(cols)
        .unionByName(untouched.select(cols))
        .unionByName(closed.select(cols))
        .unionByName(fresh.select(cols))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_col: str,
) -> DataFrame:
    """Corpus snapshot delta: one row per doc present in either
    snapshot, with ``status`` ∈ added / removed / changed / unchanged —
    the "what moved between dump N and N+1" report every recurring
    crawl ingest starts with (and the input to incremental index
    maintenance: added+changed re-embed/re-band, removed compact out).

    Scale shape: each side reduces to (id, 16-byte md5 fingerprint)
    map-side, so the full-outer join shuffles fingerprints, never
    document bodies — the same discipline as exact dedup.

    Presence comes from an explicit per-side marker, not from
    fingerprint nullness: ``md5(NULL)`` is NULL, so a present row with
    NULL content would otherwise read as absent and be misclassified
    (present-both with one NULL side → 'added' instead of 'changed';
    removed-with-NULL-content → 'added')."""
    fp = F.md5(F.lower(F.trim(F.col(content_col))))
    a = old.select(
        F.col(id_col), fp.alias("__fp_old"), F.lit(True).alias("__in_old")
    )
    b = new.select(
        F.col(id_col), fp.alias("__fp_new"), F.lit(True).alias("__in_new")
    )
    j = a.join(b, id_col, "full_outer")
    in_old = F.coalesce(F.col("__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    return j.select(
        id_col,
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(
            ~F.col("__fp_old").eqNullSafe(F.col("__fp_new")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
