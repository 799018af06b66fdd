"""ubw_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of scalax/ubw ("fsn").

The reference (/root/reference) is a column-granular, metadata-carrying,
dynamically-parameterizable query layer over an FRM.  This engine
re-expresses that surface Spark-first:

- ``ubw_spark.core``      — ColumnSpec / QuerySpec (the Atomic/Pile analog:
                            a Column expression + a metadata capability bag)
- ``ubw_spark.params``    — QueryParams compiler (dynamic orders / filters /
                            paging / column pruning with silent-ignore
                            semantics, per reference doc-02.md:133,
                            doc-01.md:148-152)
- ``ubw_spark.render``    — JsonView render: {data, properties}
                            (reference doc-02.md:96-115)
- ``ubw_spark.pipeline``  — Channel/DataPileContent analog: composable
                            DataFrame→DataFrame stages (Channel.scala:5-57)
- ``ubw_spark.functions`` — derived-column (poly.transform) compiler and the
                            scalar function vocabulary
- ``ubw_spark.sources``   — parquet/csv/json/jdbc readers, schema-on-read
                            dynamic tables (Models.scala:26-36)
- ``ubw_spark.operators`` — relational surface (joins/aggs/windows/setops)
                            plus the scale extensions: dedup, similarity
                            search, text analysis, multimodal columns
- ``ubw_spark.streaming`` — Structured Streaming over the same stage API

All heavy lifting (pruning, pushdown, join selection, codegen, AQE) is
delegated to Catalyst; this layer only *builds* plans.
"""

from ubw_spark.core.spec import ColumnSpec, QuerySpec
from ubw_spark.params import QueryParams, apply_params
from ubw_spark.render import to_view
from ubw_spark.pipeline import Pipeline
from ubw_spark.session import get_session

__all__ = [
    "ColumnSpec",
    "QuerySpec",
    "QueryParams",
    "apply_params",
    "to_view",
    "Pipeline",
    "get_session",
]

__version__ = "0.1.0"
