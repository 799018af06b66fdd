"""P10: nested struct construction rendered as JSON — golden-output
shape of Sample07.scala:71-126 (struct-of-struct with a message
fallback), oracled via the JSON text form.

Both engines emit compact JSON; Spark needs ignoreNullFields=false to
match SQL null-field semantics.  Field values stay bigint/string so the
textual number formatting is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.functions import derive, nested_struct
from ubw_spark.queries.registry import register, table


@register(
    "nested_struct_json",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal >= 0 THEN
             to_json(struct_pack(
               id := c_custkey,
               accountInfo := struct_pack(
                 name := c_name,
                 segment := c_mktsegment),
               balance_cents := CAST(round(c_acctbal * 100) AS BIGINT)))
           END AS info,
           CASE WHEN c_acctbal < 0 THEN
             concat('customer ', c_custkey, ' is overdrawn')
           END AS message
    FROM customer WHERE c_custkey < 300
    """,
    tags=("engine", "derive"),
)
def nested_struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-of-struct derived column with the null-case message
    fallback (the G6 golden shape on TPC-H data)."""
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    info = derive(
        [
            (
                F.col("c_acctbal") >= 0,
                nested_struct(
                    id=F.col("c_custkey"),
                    accountInfo=nested_struct(
                        name=F.col("c_name"), segment=F.col("c_mktsegment")
                    ),
                    balance_cents=F.round(F.col("c_acctbal") * 100, 0).cast(
                        "bigint"
                    ),
                ),
            )
        ]
    )
    message = derive(
        [
            (
                F.col("c_acctbal") < 0,
                F.concat(
                    F.lit("customer "),
                    F.col("c_custkey"),
                    F.lit(" is overdrawn"),
                ),
            )
        ]
    )
    return c.select(
        "c_custkey",
        F.when(
            F.col("c_acctbal") >= 0,
            F.to_json(info, {"ignoreNullFields": "false"}),
        ).alias("info"),
        message.alias("message"),
    )
