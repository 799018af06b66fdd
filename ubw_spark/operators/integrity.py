"""Cross-table integrity audits: foreign-key orphan detection and
primary-key uniqueness — the data-quality sweep a warehouse runs
before trusting a snapshot enough to train on it.

Scale posture: each FK edge is ONE join + ONE aggregate.  The parent
side is reduced to its distinct key column first (so a corrupted
parent with duplicate PKs cannot inflate the child-row counts, and the
join payload is one column).  Dimension parents broadcast; fact-fact
edges (lineitem→orders) take the shuffled join via
``broadcast_parent=False`` — the same two-posture switch as
dedup.minhash_contamination_pairs(large_probe=...).  PK audits are a
single count/count-distinct aggregate per table with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fk_audit", "pk_audit"]


def fk_audit(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    edge: str,
    *,
    broadcast_parent: bool = True,
) -> DataFrame:
    """One-row audit of the FK edge ``child.fk_col → parent.pk_col``:
    ``(edge, child_rows, null_fk, orphans, parents_referenced)``.

    ``orphans`` counts child rows whose non-NULL fk matches no parent
    key; NULL fks are counted separately (a NULL fk is a modeling
    choice, an orphan is corruption).  The parent reduces to DISTINCT
    keys before the left join, so the audit is correct even when the
    parent itself violates PK uniqueness."""
    keys = parent.select(
        F.col(pk_col).alias(fk_col)
    ).distinct().withColumn("__hit", F.lit(1))
    if broadcast_parent:
        keys = F.broadcast(keys)
    fk = F.col(fk_col)
    return (
        child.select(fk_col)
        .join(keys, fk_col, "left")
        .agg(
            F.count(F.lit(1)).alias("child_rows"),
            F.sum(F.when(fk.isNull(), 1).otherwise(0)).alias("null_fk"),
            F.sum(
                F.when(fk.isNotNull() & F.col("__hit").isNull(), 1).otherwise(0)
            ).alias("orphans"),
            F.count_distinct(fk).alias("parents_referenced"),
        )
        .select(
            F.lit(edge).alias("edge"),
            "child_rows",
            "null_fk",
            "orphans",
            "parents_referenced",
        )
    )


def pk_audit(df: DataFrame, pk_col: str, table_name: str) -> DataFrame:
    """One-row primary-key audit: ``(tbl, rows, null_pk, distinct_pk,
    dup_rows)`` where ``dup_rows = rows − null_pk − distinct_pk`` (the
    surplus rows sharing an already-seen non-NULL key).  A single
    aggregate pass."""
    pk = F.col(pk_col)
    return df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(pk.isNull(), 1).otherwise(0)).alias("null_pk"),
        F.count_distinct(pk).alias("distinct_pk"),
    ).select(
        F.lit(table_name).alias("tbl"),
        "rows",
        "null_pk",
        "distinct_pk",
        (F.col("rows") - F.col("null_pk") - F.col("distinct_pk")).alias(
            "dup_rows"
        ),
    )
