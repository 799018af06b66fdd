"""Registry mapping query names to (Spark impl, DuckDB oracle SQL)."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, tags)
        return fn

    return deco


def _is_utc_equivalent(tz: str) -> bool:
    """True iff ``tz`` names a FIXED zero-offset zone (UTC by rules, any
    name).  Offsets are probed in both January and July across years so
    a DST zone that happens to sit at UTC when checked cannot pass."""
    import datetime as _dt

    try:
        from zoneinfo import ZoneInfo

        z = ZoneInfo(tz)
    except Exception:
        return tz in ("UTC", "Z", "+00:00")
    zero = _dt.timedelta(0)
    return all(
        _dt.datetime(y, m, 1, tzinfo=z).utcoffset() == zero
        for y in (2020, 2031)
        for m in (1, 7)
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped with two encodings for `ts`:
        #   - TIMESTAMP(NANOS): Spark rejects it by default; read the nanos
        #     as long and truncate to micros so the values match engines
        #     that read nanos-as-timestamp (DuckDB).
        #   - timestamp[us] without timezone: Spark 4.x reads TIMESTAMP_NTZ,
        #     which `unix_micros` & friends reject; cast to session-local
        #     TIMESTAMP (value-preserving under the UTC session pin).
        # This function is the single choke-point for table reads, so both
        # normalizations live here and nowhere else.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            # The NTZ→TIMESTAMP cast reinterprets the wall-clock value in
            # the SESSION timezone: value-preserving only when that zone
            # is UTC.  A session built outside get_session()/conftest on
            # a non-UTC box would silently shift every event timestamp by
            # the local offset — fail loudly instead.  "UTC" must be
            # judged by OFFSET RULES, not by name: boxes legitimately pin
            # "Etc/UTC"/"GMT"/"Zulu" (a name-equality check here rejected
            # a real Etc/UTC machine), while a DST zone that merely
            # straddles UTC in winter is NOT safe.
            tz = spark.conf.get("spark.sql.session.timeZone")
            if not _is_utc_equivalent(tz):
                raise AssertionError(
                    f"events.ts is TIMESTAMP_NTZ and the session timezone "
                    f"is {tz!r}; the cast to TIMESTAMP is only "
                    "value-preserving under UTC — build the session via "
                    "ubw_spark.session.get_session or set "
                    "spark.sql.session.timeZone=UTC"
                )
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
