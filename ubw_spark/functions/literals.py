"""JVM-literal construction of small driver-side DataFrames.

``spark.createDataFrame(rows, schema)`` from local Python data plans a
scan over a *pickled Python RDD*: every job that touches the frame —
including every join probing an index with it, and every write of a
one-row sentinel — launches a Python worker just to unpickle those few
rows.  Measured round 13 (sf0.1 bench box): ~0.3-0.5 s per action warm
and 3-7 s cold, vs 0.2 s for the identical rows planned as JVM
literals.  Ten declared queries carry such frames (probe words, query
tables, sentinel rows, one-row summaries), so the pickled path taxed
the bench tens of seconds of pure Python-runner startup.

:func:`literal_frame` renders the rows as ONE generated-SQL
``inline(array(named_struct(...), ...))`` expression — a pure JVM local
relation with exact column types (every value is CAST to the schema's
type), no Python boundary anywhere in the plan (guide §4: the cheapest
JVM↔Python crossing is the one that doesn't happen).

Scope: ENGINE-CONTROLLED rows only (probe constants, sentinels,
collected one-row summaries).  User-supplied data (the JSON-DSL write
path) must keep going through ``createDataFrame`` — its no-SQL-text
safety contract forbids rendering user values into an expression
string, escaping notwithstanding.  Unsupported value types and empty
row sets fall back to ``createDataFrame`` transparently.
"""

from __future__ import annotations

import datetime
import decimal
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class _Unsupported(Exception):
    pass


def _escape(s: str) -> str:
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == "'":
            out.append("\\'")
        elif ord(ch) < 0x20:  # control chars: unicode escape
            out.append("\\u%04X" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)


def _sql_value(v, dt: T.DataType) -> str:
    if v is None:
        return f"CAST(NULL AS {dt.simpleString()})"
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return f"CAST({int(v)} AS {dt.simpleString()})"
    if isinstance(dt, T.BooleanType):
        return "TRUE" if v else "FALSE"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        # cast-from-string: repr round-trips the exact IEEE value, and
        # the string→double parse is exact — no literal-syntax edge
        # cases (1e-05, inf) to special-case
        return f"CAST('{float(v)!r}' AS {dt.simpleString()})"
    if isinstance(dt, T.DecimalType):
        return f"CAST('{decimal.Decimal(v)}' AS {dt.simpleString()})"
    if isinstance(dt, T.StringType):
        return f"'{_escape(str(v))}'"
    if isinstance(dt, T.TimestampType):
        if isinstance(v, str):
            return f"TIMESTAMP '{_escape(v)}'"
        if isinstance(v, datetime.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        raise _Unsupported(f"timestamp from {type(v).__name__}")
    if isinstance(dt, T.DateType):
        if isinstance(v, str):
            return f"DATE '{_escape(v)}'"
        if isinstance(v, datetime.date):
            return f"DATE '{v.isoformat()}'"
        raise _Unsupported(f"date from {type(v).__name__}")
    if isinstance(dt, T.ArrayType):
        elems = ", ".join(_sql_value(x, dt.elementType) for x in v)
        if not elems:
            return f"CAST(array() AS {dt.simpleString()})"
        return f"array({elems})"
    raise _Unsupported(f"no literal rendering for {dt.simpleString()}")


def literal_frame(
    spark: SparkSession,
    rows: Sequence,
    schema: T.StructType | str,
) -> DataFrame:
    """Small DataFrame of engine-controlled ``rows`` with the exact
    ``schema``, planned as a JVM local relation (no Python-RDD scan).
    Rows may be tuples/lists or pyspark Rows (read positionally).
    Falls back to ``createDataFrame`` for empty input or value types
    without a literal rendering."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        structs = []
        for r in rows:
            vals = list(r)
            if len(vals) != len(schema.fields):
                raise _Unsupported(
                    f"row arity {len(vals)} != schema arity "
                    f"{len(schema.fields)}"
                )
            parts = [
                f"'{_escape(f.name)}', {_sql_value(v, f.dataType)}"
                for v, f in zip(vals, schema.fields)
            ]
            structs.append(f"named_struct({', '.join(parts)})")
    except _Unsupported:
        return spark.createDataFrame(rows, schema)
    return spark.range(1).select(
        F.expr(f"inline(array({', '.join(structs)}))")
    )
