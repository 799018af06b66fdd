from ubw_spark.core.spec import ColumnSpec, QuerySpec
from ubw_spark.core.errors import SpecError, SpecValidationError

__all__ = ["ColumnSpec", "QuerySpec", "SpecError", "SpecValidationError"]
