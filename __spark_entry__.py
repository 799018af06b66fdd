"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` — the full operator inventory from SURVEY.md §2 plus the
scale extensions (dedup / similarity / text / events), one callable per
operator, registered in ubw_spark.queries.
``oracle_sql()`` — the DuckDB-equivalent SQL for every SQL-expressible
query (same aliases, same rounding); non-SQL-expressible ops are omitted
and get the rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from ubw_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None
    }
