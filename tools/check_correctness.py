"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` via DuckDB: row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by string form).  Exit code 1 on any mismatch.

Usage: python tools/check_correctness.py [--vanilla] [query ...]

``--vanilla`` runs the Spark side on a bare SparkSession (no UTC pin,
no AQE/shuffle tuning from ubw_spark.session) — catches hidden config
coupling, since the driver builds its own session too.
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def norm_cell(v, exact_decimal: bool = False) -> str:
    # Both sides arrive through PANDAS (df.toPandas() / con.fetchdf()) so
    # dtype-level drift the driver would see — e.g. DuckDB's windowed-sum
    # HUGEINT becoming float64 ("31.0" vs Spark's "31") — shows up HERE
    # instead of surviving until the round gate (this exact class of bug
    # shipped twice when the mirror fetched Python ints via fetchall()).
    if isinstance(v, (list, dict, set, bytearray, np.ndarray)):
        # The driver's pandas canonicalizer crashes on unhashable cells
        # (TypeError: unhashable type) — surface that as a failure here.
        raise TypeError(f"non-hashable cell type {type(v).__name__}: {v!r:.80}")
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        # NULL, NaN, and NaT are INTENTIONALLY conflated: toPandas() /
        # fetchdf() both surface SQL NULL as NaN/NaT, so the driver's
        # pandas hashing cannot tell them apart either.  Do not "fix"
        # this back to distinct markers — the mirror would then flag
        # divergences the driver gate can't see.
        return "NULL"
    if isinstance(v, decimal.Decimal):
        if exact_decimal:
            # Both sides produced Decimal for this column: compare
            # exactly (float() is lossy above ~15 significant digits, so
            # two genuinely different money sums could normalize equal).
            return format(v.normalize(), "f")
        # Mixed Decimal-vs-float64 column (the usual case — DuckDB's
        # fetchdf gives float64 for DECIMAL): the driver hashes these
        # EQUAL (json_driven_query was driver-green with decimal
        # output), so canonicalize through float the same way.
        v = float(v)
    if isinstance(v, np.floating) or isinstance(v, float):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        # EXACT repr (only -0.0 normalized): the driver hashes exact values,
        # so any float that needs rounding to match here would be a driver
        # hash mismatch.  Queries must emit order-independent numerics
        # (decimal sums / integer cents), not rely on comparator slack.
        return repr(f + 0.0 if f == 0.0 else f)
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def norm_rows(
    cols: list[str], rows: list[tuple], exact_decimal_cols: frozenset = frozenset()
) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [
        tuple(norm_cell(r[i], cols[i] in exact_decimal_cols) for i in order)
        for r in rows
    ]
    out.sort()
    return out


def decimal_columns(pdf: "pd.DataFrame") -> set[str]:
    """Columns whose non-null cells are all Decimal.  A column in the
    intersection of BOTH sides' sets is compared exactly instead of
    through the lossy float() path."""
    out = set()
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype != object:
            continue
        vals = [
            x
            for x in s
            if x is not None
            and x is not pd.NaT
            and not (isinstance(x, float) and math.isnan(x))
        ]
        if vals and all(isinstance(x, decimal.Decimal) for x in vals):
            out.add(c)
    return out


def pdf_rows(pdf: "pd.DataFrame") -> list[tuple]:
    """Rows with pandas/numpy dtypes intact (itertuples preserves them;
    .values would upcast the whole frame to object/float)."""
    return list(pdf.itertuples(index=False, name=None))


def main() -> int:
    from __spark_entry__ import oracle_sql, queries
    from ubw_spark.session import get_session

    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    only = {a for a in args if not a.startswith("--")}
    from __spark_entry__ import queries as _qs

    unknown = only - set(_qs().keys())
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        return 1
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-correctness-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_session(
            "check-correctness", master="local[8]", shuffle_partitions=8
        )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    failures, passed, rows_only = [], 0, 0
    report_lines: list[str] = []

    def report(line: str) -> None:
        print(line)
        report_lines.append(line)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            sp_cols = df.columns
            sp_pdf = df.toPandas()
            sp_rows = pdf_rows(sp_pdf)
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            report(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            # rows-only queries must still produce rows — an empty
            # result is a silent regression, not a pass — and their
            # cells must be hashable or the driver's canonicalizer dies
            if len(sp_rows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
                report(f"FAIL {name}: rows-only query returned 0 rows")
                continue
            try:
                norm_rows(sp_cols, sp_rows)
            except TypeError as e:
                failures.append((name, f"unhashable output: {e}"))
                report(f"FAIL {name}: unhashable output: {e}")
                continue
            rows_only += 1
            report(f"rows {name}: {len(sp_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            du_pdf = con.execute(sql).fetchdf()
            du_cols = list(du_pdf.columns)
            du_rows = pdf_rows(du_pdf)
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            report(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(sp_cols) != sorted(du_cols):
            problems.append(f"schema: spark={sorted(sp_cols)} duckdb={sorted(du_cols)}")
        if len(sp_rows) != len(du_rows):
            problems.append(f"rowcount: spark={len(sp_rows)} duckdb={len(du_rows)}")
        if not problems:
            exact = frozenset(decimal_columns(sp_pdf) & decimal_columns(du_pdf))
            try:
                a = norm_rows(sp_cols, sp_rows, exact)
                b = norm_rows(du_cols, du_rows, exact)
            except TypeError as e:
                problems.append(f"unhashable output: {e}")
                a = b = None
            if a is not None and a != b:
                # symmetric difference, not positional zip: one inserted
                # row shifts the sort and would misreport identical rows
                only_spark = sorted(set(a) - set(b))[:3]
                only_duck = sorted(set(b) - set(a))[:3]
                problems.append(
                    f"values differ; only-in-spark: {only_spark} "
                    f"only-in-duckdb: {only_duck}"
                )
        if problems:
            failures.append((name, "; ".join(problems)))
            report(f"FAIL {name}: {'; '.join(problems)}")
        else:
            passed += 1
            report(f"ok   {name}: {len(sp_rows)} rows [{time.time()-t0:.1f}s]")

    summary = f"{passed} passed, {rows_only} rows-only, {len(failures)} failed"
    print(f"\n{summary}")
    spark.stop()

    if not only:
        # Full-registry run → regenerate the evidence doc from THIS run,
        # so the claimed numbers can never drift from a verified run
        # (rounds 5-6 shipped a stale "as of round 4" claim).
        import datetime

        mode = "--vanilla (bare SparkSession)" if vanilla else "get_session"
        # vanilla runs get their own doc: the canonical evidence file
        # must always describe the driver-equivalent default mode
        doc = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_VANILLA.md" if vanilla else "CORRECTNESS_LOCAL.md",
        )
        with open(doc, "w") as f:
            f.write(
                "# CORRECTNESS_LOCAL — full-registry oracle mirror\n\n"
                "GENERATED by `python tools/check_correctness.py` — do not "
                "edit by hand; re-run the tool to refresh.\n\n"
                f"- run at: {datetime.datetime.now().isoformat(timespec='seconds')}\n"
                f"- sf dir: {SF_DIR}\n"
                f"- session: {mode}\n"
                f"- queries: {passed + rows_only + len(failures)}\n"
                f"- result: **{summary}**\n\n"
                "Every `ok` line is a row-count + column-set + "
                "order-insensitive value match against DuckDB running the "
                "query's `oracle_sql()` on the same parquet; `rows` lines "
                "are the weaker rows-only check for non-SQL-expressible "
                "ops.\n\n```\n"
                + "\n".join(report_lines)
                + f"\n\n{summary}\n```\n"
            )
        print(f"wrote {doc}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
