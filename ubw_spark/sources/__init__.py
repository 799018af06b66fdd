from ubw_spark.sources.readers import (
    read_table,
    read_dir,
    dynamic_table,
    literal_rows,
)
from ubw_spark.sources.writers import write_table

__all__ = [
    "read_table",
    "read_dir",
    "dynamic_table",
    "literal_rows",
    "write_table",
]
