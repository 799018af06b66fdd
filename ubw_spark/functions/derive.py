"""Derived-column compiler — the ``poly(...).transform(pf)`` analog (P9/P10/U1).

The reference expresses N-ary row-wise derivation as a Scala partial
function over sibling cells with explicit null cases
(PileHelper.scala:117-179; Sample07.scala:37-53; doc-03.md:11-38):

    case FSomeValue(name) :: FSomeValue(nick) :: FSomeValue(age) :: HNil
         if age < 200        => s"$name-$nick"
    case FSomeValue(name) :: _                => name
    case _                                    => AtomicValueImpl.empty

Here each case becomes a (condition, value) pair compiled to a native
``F.when`` chain — JVM-side, codegen'd, no Python in the hot path.  The
fsn distinction between "empty cell" and "present None" collapses to SQL
NULL (SURVEY.md §7 hard-point 1; golden outputs never distinguish them).

For genuinely opaque host-language logic the escape hatch is a
``pandas_udf`` (Arrow-vectorized), NOT a row-at-a-time Python UDF.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lit(v: Any) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def derive(
    cases: Sequence[tuple[Column, Any]],
    otherwise: Any = None,
) -> Column:
    """Compile ordered (condition, value) cases to one when-chain.

    First matching case wins (partial-function order semantics);
    ``otherwise=None`` yields SQL NULL — the ``AtomicValueImpl.empty``
    fallback (AtomicValue.scala:26-34)."""
    if not cases:
        return _lit(otherwise)
    head_cond, head_val = cases[0]
    c = F.when(head_cond, _lit(head_val))
    for cond, val in cases[1:]:
        c = c.when(cond, _lit(val))
    return c.otherwise(_lit(otherwise)) if otherwise is not None else c


def when_present(*cols: Column | str) -> Column:
    """The ``FSomeValue(...)`` guard: all the given columns are non-null."""
    conds = [
        (F.col(c) if isinstance(c, str) else c).isNotNull() for c in cols
    ]
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def nested_struct(**fields: Column | Any) -> Column:
    """P10: derived column whose value is a nested object
    (Sample07.scala:71-108 — case class / Map[String,Json] cells).
    Spark structs are columnar and codegen-friendly; JSON rendering is
    ``F.to_json`` at the sink, not in the plan."""
    return F.struct(*[_lit(v).alias(k) for k, v in fields.items()])
