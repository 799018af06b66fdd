r"""`let` — evaluate a column expression ONCE and reuse it many times
inside a single Column tree.

Why this exists: Catalyst expression trees are VALUES, not references.
A helper like ``toks = F.split(text, r"\s+")`` that is then mentioned k
times inside a higher-order-function lambda (``element_at(toks, i)``,
``element_at(toks, i+1)``, …) embeds k COPIES of the split subtree, and
evaluation walks each copy independently — there is no common-
subexpression elimination inside HOF lambdas, Filter predicates, or
Generate generators.  Measured on the 3-word-shingle pipeline: the
window transform re-ran the regex split once per element_at — ~1.3 ms
per 54-token document, 18× slower than single evaluation (same result).

The fix exploits the one place Spark DOES bind a value: lambda
variables.  ``transform`` evaluates its input array once and passes
each element to the lambda as a BOUND value, so

    let(expensive_col, lambda v: <tree using v many times>)
      == element_at(transform(array(expensive_col), f), 1)

evaluates ``expensive_col`` exactly once in ANY context — Project,
Filter, or Generate — at the cost of one single-element array wrapper.

The binder works for any data type (the array wrapper is generic), and
lets can nest.  Use it whenever a non-trivial subexpression feeds a
window/transform lambda more than once.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def fence(value: Column) -> Column:
    """Identity wrapper that PINS ``value`` to the projection computing
    it: predicates on the column can no longer be pushed below it, and
    CollapseProject can no longer inline it into later expressions.

    Mechanism: ``shuffle`` of a single-element array is semantically the
    identity but formally non-deterministic, and Catalyst neither
    substitutes predicates through non-deterministic projections
    (PushDownPredicates) nor collapses them (CollapseProject).  Task
    retries are safe — the value IS deterministic, only the marker says
    otherwise.

    Use on an expensive derived column (a cosine, a norm, a quality
    score) that a later ``where`` filters on: without the fence the
    pushed predicate re-evaluates the whole expression tree per input
    row — interpreted, uncached — and the projection then evaluates it
    AGAIN for the output (2-3× the query's dominant kernel; the lint
    ``plans/inspect.py::hof_filter_violations`` flags exactly this
    shape).  Cost: one single-element array copy per row.

    CAVEAT — fence is an OPERATOR-level barrier, not a per-column one:
    PushPredicateThroughNonJoin requires every field of a projection to
    be deterministic, so NO predicate (even on unrelated cheap columns)
    pushes below a projection containing a fenced column.  Place the
    fenced projection as LATE as possible — selective id/partition
    filters belong below it, next to the scan.  (quantize_int8 fences
    its outputs, so filter the corpus BEFORE quantizing, not after.)"""
    return F.element_at(F.shuffle(F.array(value)), 1)


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """``body(value)`` with ``value`` evaluated exactly once.

    ``body`` receives a lambda-bound variable, so every reference inside
    it is a cheap bound-value read, never a re-evaluation of ``value``'s
    expression tree."""
    return F.element_at(F.transform(F.array(value), body), 1)
