"""Excel source/sink (reference S5: POI-based Excel views/inputs,
doc-01.md:109-115, backup/README.md:147-149,199-203).

Spark has no built-in Excel format; the idiomatic paths are (a) the
spark-excel DataSource package on a real cluster, or (b) a
pandas/openpyxl round-trip through the driver for the small
request/response exports the reference actually does (its Excel views
render paged query results, not bulk data).

Neither openpyxl nor xlsxwriter exists in this environment, so both
functions gate on import and raise a clear error telling the caller
what to install — the Spark-side contract (DataFrame in/out, schema
handling, max_rows guard) is real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _require_pandas_excel():
    try:
        import openpyxl  # noqa: F401
        return
    except ImportError:
        pass
    try:
        import xlsxwriter  # noqa: F401
        return
    except ImportError:
        raise ImportError(
            "Excel support needs 'openpyxl' (read/write) or 'xlsxwriter' "
            "(write) on the driver, or the spark-excel DataSource package "
            "(com.crealytics:spark-excel) on a cluster; none is installed "
            "in this environment"
        )


def write_excel(
    df: DataFrame, path: str, *, sheet: str = "Sheet1", max_rows: int = 100_000
) -> None:
    """Driver-side Excel export of a (small) result set.

    max_rows guards the collect — Excel is a report sink, not a data
    sink; anything bigger belongs in parquet."""
    _require_pandas_excel()
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"refusing to export {n} rows to Excel (max_rows={max_rows}); "
            "use write_table for bulk data"
        )
    df.toPandas().to_excel(path, sheet_name=sheet, index=False)


def read_excel(
    spark: SparkSession, path: str, *, sheet: str | int = 0
) -> DataFrame:
    """Ingest an Excel sheet as a DataFrame (driver-side pandas read)."""
    _require_pandas_excel()
    import pandas as pd

    return spark.createDataFrame(pd.read_excel(path, sheet_name=sheet))
