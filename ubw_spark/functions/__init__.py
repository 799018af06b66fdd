from ubw_spark.functions.derive import derive, when_present, nested_struct

__all__ = ["derive", "when_present", "nested_struct"]
