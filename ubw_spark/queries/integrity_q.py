"""Integrity-audit queries (operators/integrity.py) over the whole
TPC-H-ish schema."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from ubw_spark.operators.integrity import fk_audit, pk_audit
from ubw_spark.queries.registry import register, table

#: (edge label, child table, fk, parent table, pk, parent broadcasts).
#: orders is fact-sized: the lineitem→orders edge takes the shuffled
#: join; every true dimension broadcasts.
_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey", False),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey", True),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey", True),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey", True),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey", True),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey", True),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey", True),
]

_PKS = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
]


def _fk_edge_sql(edge, child, fk, parent, pk, _bc) -> str:
    return f"""
    SELECT '{edge}' AS edge,
           count(*)::BIGINT AS child_rows,
           sum(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS null_fk,
           sum(CASE WHEN c.{fk} IS NOT NULL AND p.{fk} IS NULL
               THEN 1 ELSE 0 END)::BIGINT AS orphans,
           count(DISTINCT c.{fk})::BIGINT AS parents_referenced
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pk} AS {fk} FROM {parent}) p
           ON c.{fk} = p.{fk}"""


@register(
    "quality_referential_integrity",
    oracle=" UNION ALL ".join(_fk_edge_sql(*e) for e in _EDGES),
    tags=("quality", "join"),
)
def quality_referential_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Orphan / NULL-fk audit of every foreign-key edge in the schema —
    one row per edge, the pre-training trust report for a snapshot.

    Scale: each edge is one join against the parent's DISTINCT key
    column (dims broadcast, the fact-fact edge shuffles) plus one
    aggregate; the union glues seven one-row results."""
    frames = [
        fk_audit(
            table(spark, sf_dir, child), fk,
            table(spark, sf_dir, parent), pk,
            edge, broadcast_parent=bc,
        )
        for edge, child, fk, parent, pk, bc in _EDGES
    ]
    return reduce(DataFrame.unionByName, frames)


@register(
    "quality_pk_uniqueness",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{t}' AS tbl, count(*)::BIGINT AS rows,
               sum(CASE WHEN {pk} IS NULL THEN 1 ELSE 0 END)::BIGINT
                 AS null_pk,
               count(DISTINCT {pk})::BIGINT AS distinct_pk,
               (count(*)
                - sum(CASE WHEN {pk} IS NULL THEN 1 ELSE 0 END)
                - count(DISTINCT {pk}))::BIGINT AS dup_rows
        FROM {t}"""
        for t, pk in _PKS
    ),
    tags=("quality", "agg"),
)
def quality_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across seven tables: row count,
    NULL keys, distinct keys, and surplus duplicate rows per table.

    Scale: one count/count-distinct aggregate per table (map-side
    combine), unioned driver-side — no joins at all."""
    frames = [
        pk_audit(table(spark, sf_dir, t), pk, t) for t, pk in _PKS
    ]
    return reduce(DataFrame.unionByName, frames)
