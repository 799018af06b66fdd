"""Sources (S1-S3, S6): typed scans, schema-on-read dynamic tables,
literal rows, multi-format readers.

- S1 typed scan (Models.scala:14-24) → ``read_table``: parquet by name.
- S2 dynamic table (Models.scala:26-36, Sample08.scala:25-33,
  doc-03.md:71-84): table known only by name, columns conjured from
  runtime (name, type) pairs → ``dynamic_table``: select+cast from a
  string-driven column list.  Casting to narrower types is explicit and
  visible in the plan; Catalyst still pushes the projection to the scan.
- S3 literal rows (Helper.scala:19-21) → ``literal_rows``.
- S6 CSV/JSON/JDBC (doc-01.md:113-115) → ``read_dir`` format dispatch.

Scale: readers never infer schema on huge trees when an explicit schema
is given (schema inference is a full extra pass at 100 TB); partition
discovery and predicate pushdown stay with the DataSource V2 parquet
reader.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_table(
    spark: SparkSession, sf_dir: str, name: str, *, fmt: str = "parquet"
) -> DataFrame:
    """Scan one named table under a dataset directory."""
    path = os.path.join(sf_dir, f"{name}.{ 'parquet' if fmt == 'parquet' else fmt }")
    return spark.read.format(fmt).load(path)


def read_dir(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: Any,
) -> DataFrame:
    """Generic multi-format reader (parquet/csv/json/orc/jdbc)."""
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


_TYPE_ALIASES: dict[str, T.DataType] = {
    "bigint": T.LongType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def dynamic_table(
    df: DataFrame, columns: Sequence[tuple[str, str]]
) -> DataFrame:
    """S2: schema-on-read projection from runtime (name, type) strings.

    The reference's SimpleTable conjures `column[Long]("id")` at query
    time; here the same request is ``[("id","bigint"),("name","string")]``.
    Unknown type strings fall back to Spark's DDL parser so nested types
    (``array<float>``, ``struct<...>``) work too.
    """
    cols = []
    for name, type_str in columns:
        dt = _TYPE_ALIASES.get(type_str.lower())
        if dt is None:
            dt = T._parse_datatype_string(type_str)
        cols.append(F.col(name).cast(dt).alias(name))
    return df.select(*cols)


def literal_rows(
    spark: SparkSession,
    rows: Sequence[tuple],
    schema: T.StructType | str,
    *,
    trusted: bool = False,
) -> DataFrame:
    """S3: in-memory seed rows with an explicit schema.

    Default path is ``createDataFrame``: this is a PUBLIC source API,
    and functions/literals.py's scope contract reserves SQL-text
    rendering for engine-controlled values (round 14, ADVICE r13 —
    rendering caller data into expression strings widens the SQL-text
    surface and loosens type checking).  ``trusted=True`` opts a
    caller whose rows are engine-controlled literals into the
    JVM-literal plan (functions/literals.py): a pickled local RDD
    launches a Python worker per consuming job — measured ~0.3-0.5 s
    per action at the round-13 bench."""
    if trusted:
        from ubw_spark.functions.literals import literal_frame

        return literal_frame(spark, list(rows), schema)
    return spark.createDataFrame(list(rows), schema)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: Any,
) -> DataFrame:
    """JDBC source (S6, doc-01.md:113-115 'multiple input sources').

    ``table`` may be a table name or a pushdown subquery
    ``"(SELECT ...) t"``.  For large tables pass the four partitioning
    options — without them the whole result streams through ONE task,
    which is the classic JDBC-at-scale mistake; with them Spark issues
    num_partitions range-bounded queries in parallel."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()
