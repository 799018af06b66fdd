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

from typing import Any, Sequence

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
    zorder_by: Sequence[str] = (),
    zorder_files: int = 8,
) -> None:
    """``zorder_by``: cluster the written files along the Z-curve of
    the given numeric columns (operators/layout.py) so selective
    predicates on ANY of them prune files — the lakehouse
    OPTIMIZE-ZORDER layout applied at write time.  Composable with
    ``partition_by`` (curve applies within each partition directory);
    mutually exclusive with nothing else."""
    w = df
    if zorder_by:
        from ubw_spark.operators.layout import zorder_layout

        w = zorder_layout(
            w, list(zorder_by), num_files=zorder_files,
            extra_partition_cols=list(partition_by),
        )
    elif partition_by:
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


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    driver: str | None = None,
    batch_size: int = 10_000,
    **options: Any,
) -> None:
    """JDBC sink (S6/S7).  ``batchsize`` batches inserts per round trip;
    writes run from every partition in parallel, so repartition small
    frames down first to avoid hammering the database with connections."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    w = w.option("batchsize", str(batch_size))
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


def delta_available() -> bool:
    """True when the delta-spark package is importable (the container
    here has no lakehouse jars, so the default stays parquet)."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def merge_upsert(
    spark,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    fmt: str | None = None,
) -> None:
    """Keyed MERGE against a stored table: transactional ``MERGE INTO``
    when Delta Lake is on the classpath, anti-join+union overwrite
    emulation on plain parquet otherwise.

    The Delta branch is the 100 TB answer (file-level conflict
    detection, no read-modify-write of the whole table); the parquet
    branch exists so the API works in minimal environments — it
    materializes the merge (localCheckpoint) before overwriting, because
    lazily overwriting the files a plan is still reading deletes them
    first."""
    keys = list(keys)
    missing = [k for k in keys if k not in updates.columns]
    if missing:
        raise ValueError(f"merge keys not in updates: {missing}")
    if fmt is None:
        fmt = "delta" if delta_available() else "parquet"
    if fmt == "delta":
        from delta.tables import DeltaTable

        tgt = DeltaTable.forPath(spark, target_path)
        tcols = set(tgt.toDF().columns)
        bad = [k for k in keys if k not in tcols]
        if bad:
            raise ValueError(f"merge keys not in target: {bad}")
        cond = " AND ".join(f"t.`{k}` = u.`{k}`" for k in keys)
        (
            tgt.alias("t")
            .merge(updates.alias("u"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    target = spark.read.parquet(target_path)
    bad = [k for k in keys if k not in target.columns]
    if bad:
        raise ValueError(f"merge keys not in target: {bad}")
    merged = upsert(target, updates, keys).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(target_path)
