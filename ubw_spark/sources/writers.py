"""Sinks (S4 rendered views live in ubw_spark.render; S7 CRUD writes here).

The reference claims insert/update incl. multi-table via
SlickCRUDImplicits (Sample05.scala:15, doc-01.md:156).  V1 exposes the
Spark-native write surface: append/overwrite (dynamic partition
overwrite for partitioned tables), plus an upsert emulation
(anti-join + union) for engines without MERGE.

Scale: writers always repartition-by-partition-columns before a
partitioned write so each task writes few files (avoids the
1000-executors × 1000-partitions small-file explosion), and use
``maxRecordsPerFile`` to bound file sizes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
) -> None:
    w = df
    if partition_by:
        w = w.repartition(*[F.col(c) for c in partition_by])
    writer = w.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
    sort_by: Sequence[str] = (),
) -> None:
    """Bucketed managed table (saveAsTable — bucket metadata needs the
    catalog).  Two tables bucketed identically on their join key join
    WITHOUT any shuffle: the co-located join is the single biggest
    repeated-join win at 100 TB (pay one layout shuffle at write time,
    amortize over every subsequent join).  Demonstrated in
    tests/test_sources.py::test_bucketed_join_has_no_shuffle."""
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(name)


def upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE-INTO emulation: rows in ``target`` not matched by ``updates``
    on ``keys``, unioned with all of ``updates`` (updates win).  Returns
    the merged frame for the caller to write atomically.  With a real
    lakehouse table format this becomes a native MERGE."""
    return target.join(updates, on=list(keys), how="left_anti").unionByName(
        updates
    )
