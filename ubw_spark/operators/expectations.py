"""Declarative data-quality expectations — a deequ-style validation
layer (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018) compiled the Spark-first way: EVERY check
folds into ONE aggregate over ONE scan of the table.

A naive validator runs one query per check; at 100 TB that is N full
scans.  Here each check becomes a conditional-count expression inside a
single ``df.agg(...)`` — map-side partial aggregation, one pass, one
tiny result row — which is then exploded into the per-check report.

Checks are DATA (dicts), mirroring the engine's JSON-DSL safety
contract: a whitelisted ``kind`` vocabulary, column validation, and
accumulated errors (core.errors.ErrorAccumulator) — no expression
strings reachable from the spec.  Reference parity: the validate
channel of the reference's result/validate surface (SURVEY §2 C1)
generalized to table-level contracts.

Vocabulary:

- ``not_null``            — violations = NULL cells
- ``unique``              — violations = rows beyond the first per value
- ``in_range`` (lo/hi)    — violations = non-NULL cells outside [lo, hi]
- ``matches`` (pattern)   — violations = non-NULL cells not rlike pattern
- ``accepted_values``     — violations = non-NULL cells outside the set
- ``min_rows`` (n)        — violations = shortfall below n rows

NULL handling: range/regex/set checks skip NULLs (compose with
``not_null`` to forbid them) — SQL three-valued logic made explicit.

``unique`` uses count_distinct: exact, but each distinct aggregate adds
an Expand branch to the single pass; prefer one uniqueness check per
key contract, not one per column.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ubw_spark.core.errors import ErrorAccumulator

_KINDS = ("not_null", "unique", "in_range", "matches", "accepted_values", "min_rows")


def _cond_count(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0))


def validate_expectations(
    df: DataFrame, checks: list[dict[str, Any]]
) -> DataFrame:
    """Compile ``checks`` into one single-scan aggregate; returns the
    report frame ``(check, column, violations, total, passed)`` with one
    row per check, in declaration order.

    Raises SpecValidationError listing ALL spec problems first."""
    acc = ErrorAccumulator()
    agg_exprs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    # (check label, column label, violations expression over the agg row)
    rows: list[tuple[str, str, Column]] = []

    for i, ck in enumerate(checks):
        kind = ck.get("kind")
        col = ck.get("column")
        path = f"checks[{i}]"
        if kind not in _KINDS:
            acc.add(f"{path}: unknown kind {kind!r} (one of {list(_KINDS)})")
            continue
        if kind != "min_rows":
            if not col:
                acc.add(f"{path}: 'column' required for kind '{kind}'")
                continue
            if col not in df.columns:
                acc.add(f"{path}: column '{col}' not in frame")
                continue
        c = F.col(col) if col else None
        slot = f"__c{i}"
        if kind == "not_null":
            agg_exprs.append(_cond_count(c.isNull()).alias(slot))
            viol = F.col(slot)
        elif kind == "unique":
            agg_exprs.append(
                (_cond_count(c.isNotNull()) - F.count_distinct(c)).alias(slot)
            )
            viol = F.col(slot)
        elif kind == "in_range":
            lo, hi = ck.get("lo"), ck.get("hi")
            if lo is None and hi is None:
                acc.add(f"{path}: in_range needs 'lo' and/or 'hi'")
                continue
            bad = F.lit(False)
            if lo is not None:
                bad = bad | (c < F.lit(lo))
            if hi is not None:
                bad = bad | (c > F.lit(hi))
            agg_exprs.append(_cond_count(c.isNotNull() & bad).alias(slot))
            viol = F.col(slot)
        elif kind == "matches":
            pat = ck.get("pattern")
            if not isinstance(pat, str) or not pat:
                acc.add(f"{path}: matches needs a 'pattern' string")
                continue
            agg_exprs.append(
                _cond_count(c.isNotNull() & ~c.rlike(pat)).alias(slot)
            )
            viol = F.col(slot)
        elif kind == "accepted_values":
            vals = ck.get("values")
            if not isinstance(vals, list) or not vals:
                acc.add(f"{path}: accepted_values needs a non-empty 'values' list")
                continue
            agg_exprs.append(
                _cond_count(c.isNotNull() & ~c.isin(vals)).alias(slot)
            )
            viol = F.col(slot)
        else:  # min_rows
            n = ck.get("n")
            if not isinstance(n, int) or isinstance(n, bool) or n < 0:
                acc.add(f"{path}: min_rows needs a non-negative int 'n'")
                continue
            viol = F.greatest(F.lit(n) - F.col("__total"), F.lit(0))
        rows.append((kind, col or "*", viol))
    acc.raise_if_any()

    agg = df.agg(*agg_exprs)
    report_structs = [
        F.struct(
            F.lit(kind).alias("check"),
            F.lit(col).alias("column"),
            viol.cast("long").alias("violations"),
        )
        for kind, col, viol in rows
    ]
    return agg.select(
        F.explode(F.array(*report_structs)).alias("__r"), F.col("__total")
    ).select(
        F.col("__r.check").alias("check"),
        F.col("__r.column").alias("column"),
        F.col("__r.violations").alias("violations"),
        F.col("__total").cast("long").alias("total"),
        (F.col("__r.violations") == 0).alias("passed"),
    )
