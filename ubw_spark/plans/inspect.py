"""Physical-plan inspection and assertion helpers.

The engine's scale posture is enforced, not hoped for: tests assert that
filters reach the parquet scan (PushedFilters), scans read only needed
columns (ReadSchema), small dims broadcast, order+limit compiles to
TakeOrderedAndProject, and shuffle counts stay at the expected minimum.
A plan regression (e.g. a refactor that breaks pushdown) fails CI, not
the 1000-executor run.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(f.strip() for f in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each scan (pruning check)."""
    cols: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", formatted_plan(df)):
        fields = m.group(1)
        cols.append(
            {f.split(":")[0].strip() for f in fields.split(",") if ":" in f}
        )
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins in the INITIAL plan (pre-AQE).  Use to
    assert a fact-fact join was NOT hinted broadcast: AQE may still
    upgrade it at runtime when the built side truly fits, but a hint in
    the initial plan would force the build at any scale."""
    p = simple_plan(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", p))


def sortmerge_or_shuffledhash_count(df: DataFrame) -> int:
    p = simple_plan(df)
    return len(re.findall(r"SortMergeJoin|ShuffledHashJoin", p))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in simple_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of real shuffle exchanges in the physical plan —
    BroadcastExchange is deliberately excluded (a broadcast moves one
    small table to every executor; it is the thing we use to AVOID a
    shuffle).  Fewer exchanges == less data movement at any scale."""
    return len(re.findall(r"(?<!Broadcast)Exchange", simple_plan(df)))


# Nodes an unpartitioned window may sit above without changing where its
# rows COME from: row-preserving/reducing unary ops and the plumbing
# Spark inserts around a shuffle.  Exact names (or prefixes for the
# numbered/parameterized wrappers) — substring matching would let
# "Sort" swallow "SortMergeJoin".
_WINDOW_PASSTHROUGH_EXACT = frozenset(
    {
        "Sort", "Exchange", "Project", "Filter", "ColumnarToRow",
        "InputAdapter", "AdaptiveSparkPlan", "AQEShuffleRead", "Coalesce",
        "LocalLimit", "Window",
    }
)
#: Nodes that GROUND an unpartitioned window the way an Aggregate does:
#: their output cardinality is statically bounded by a literal limit
#: (the rank-the-top-k pattern — orderBy().limit(k) then row_number over
#: the k survivors, e.g. dsir_select).  LocalLimit stays pass-through:
#: it bounds per partition, not globally.
_WINDOW_GROUNDING_LIMITS = ("GlobalLimit", "TakeOrderedAndProject")
_WINDOW_PASSTHROUGH_PREFIX = (
    "WholeStageCodegen", "ShuffleQueryStage", "ResultQueryStage",
)


def _plan_children(node):
    """Children of a physical-plan node via py4j; AQE/stage wrappers
    report no children, so descend through their held plan explicitly."""
    seq = node.children()
    kids = [seq.apply(i) for i in range(seq.size())]
    if not kids:
        for probe in ("inputPlan", "plan", "child"):
            try:
                return [getattr(node, probe)()]
            except Exception:
                continue
    return kids


def _is_window_passthrough(name: str) -> bool:
    return name in _WINDOW_PASSTHROUGH_EXACT or name.startswith(
        _WINDOW_PASSTHROUGH_PREFIX
    )


def _window_groundings(node) -> list[str] | None:
    """Sorted grounding kinds for an unpartitioned window's input —
    ``aggregate:<NodeName>`` / ``limit:<NodeName>`` — or None when any
    input path reaches a non-grounding node first (a violation, not an
    exemption).  THE single classification both lints derive from."""
    kinds: set[str] = set()
    stack = list(_plan_children(node))
    while stack:
        cur = stack.pop()
        name = cur.nodeName()
        if "Aggregate" in name:
            kinds.add(f"aggregate:{name}")
            continue
        if any(name.startswith(g) for g in _WINDOW_GROUNDING_LIMITS):
            kinds.add(f"limit:{name}")
            continue
        if _is_window_passthrough(name):
            stack.extend(_plan_children(cur))
            continue
        return None
    return sorted(kinds)


def _unpartitioned_window_sweep(df: DataFrame) -> list[tuple[str, list[str] | None]]:
    """One walk of the executed plan: every Window node with an empty
    partition spec, paired with its groundings (None == ungrounded)."""
    plan = df._jdf.queryExecution().executedPlan()
    out: list[tuple[str, list[str] | None]] = []
    stack = [plan]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if "Window" in name:
            try:
                unpartitioned = node.partitionSpec().size() == 0
            except Exception:
                unpartitioned = False  # node type without a partitionSpec
            if unpartitioned:
                out.append((name, _window_groundings(node)))
        stack.extend(_plan_children(node))
    return out


def global_window_violations(df: DataFrame) -> list[str]:
    """Unpartitioned WindowExec nodes whose DIRECT input is not an
    aggregate — the 100 TB scale-killer (all rows through one task).

    Walks the executed physical plan via py4j.  A window with an empty
    partition spec is ALLOWED only when descending from it through
    row-preserving plumbing (sort/exchange/project/filter/codegen/AQE
    wrappers — ``_WINDOW_PASSTHROUGH_*``) reaches an Aggregate first:
    that is the two-phase-prefix-sum ledger pattern (packing.py,
    ranking.py, quality.py's ~20-row report window), where the window's
    input is a per-group aggregate of bounded cardinality — or a
    GlobalLimit/TakeOrderedAndProject (the rank-the-top-k pattern:
    cardinality bounded by the literal k).  Hitting anything else
    first — a Join, Generate, Union, or a scan — means the window
    reads raw-row-derived cardinality → violation.  (This is
    deliberately stricter than "an Aggregate exists anywhere below": a
    join whose OTHER branch aggregates used to slip through.)

    Known gaps (not statically decidable): an unpartitioned window whose
    direct input aggregate groups by a high-cardinality key (billions of
    groups) still passes — group-count is a runtime quantity.  The
    ledger call sites all group by a synthetic ≤num_buckets bucket
    column; new exempted windows must keep that property.  Likewise the
    limit grounding does not inspect the limit's MAGNITUDE: a
    ``.limit(500_000_000)`` under a window passes even though it still
    funnels those rows through one task — call sites keep k small
    (top-k ranking), and a literal that large is a reviewable constant,
    unlike runtime cardinality.
    Returns one descriptive string per offending node (empty == clean).
    """
    return [
        f"{name} with empty partition spec whose direct input "
        "is not an aggregate"
        for name, groundings in _unpartitioned_window_sweep(df)
        if groundings is None
    ]


def global_window_exemptions(df: DataFrame) -> list[str]:
    """The bound behind every unpartitioned window the lint EXEMPTS —
    what makes a clean run's ``WindowExec: No Partition Defined``
    warnings self-certifying (VERDICT r11 #7).

    For each unpartitioned Window node that :func:`global_window_
    violations` waves through, returns the sorted set of grounding
    kinds its input paths hit: ``aggregate:<NodeName>`` (cardinality
    = the group count of a bounded groupBy — the ledger pattern) or
    ``limit:<NodeName>`` (cardinality ≤ a literal k).  The registry
    test pins the full query→groundings map, so ADDING an exempted
    window anywhere fails CI until its bound is reviewed and listed.
    Derived from the SAME ``_unpartitioned_window_sweep`` as the
    violations lint (ADVICE r12) — a window is an exemption here iff it
    is not a violation there, by construction."""
    return sorted(
        f"{name} grounded by {'+'.join(groundings)}"
        for name, groundings in _unpartitioned_window_sweep(df)
        if groundings is not None
    )


#: specifiedwindowframe(<Row|Range>Frame, <lower>, unboundedfollowing$())
#: with a MOVING lower bound — Spark's UnboundedFollowingWindowFunctionFrame
#: re-scans from the current row to the partition end for EVERY row.
_UF_FRAME = re.compile(
    r"specifiedwindowframe\((?:Row|Range)Frame,"
    r"\s*([^,]+),\s*unboundedfollowing\$\(\)\)"
)


def _has_quadratic_frame(line: str) -> bool:
    # lookahead-in-regex is backtracking-fragile here (\s* can hand the
    # leading space to the bound and defeat it) — capture and compare
    return any(
        m.group(1).strip() != "unboundedpreceding$()"
        for m in _UF_FRAME.finditer(line)
    )


def quadratic_window_violations(df: DataFrame) -> list[str]:
    """Window frames that execute O(n²) per partition key — a moving
    lower bound with an UNBOUNDED FOLLOWING upper bound.

    Spark evaluates (CURRENT ROW, UNBOUNDED FOLLOWING) — and any
    (<k>, UNBOUNDED FOLLOWING) — via
    UnboundedFollowingWindowFunctionFrame, which reprocesses from the
    current row to the partition end for EVERY row: O(n²) per key
    (measured: the sf1 gapfill query halved when its forward anchors
    moved to a running frame over the DESC sort).  The whole-partition
    frame (UNBOUNDED PRECEDING, UNBOUNDED FOLLOWING) computes once per
    key and running frames are single-pass accumulators — both pass.

    The fix is mechanical: ``first/last(... ignorenulls) over
    (CURRENT, UNBOUNDED FOLLOWING)`` ≡ the mirrored running frame over
    the REVERSED sort (operators/timeseries.py::gapfill is the
    worked example).  Returns one string per offending Window node
    (empty == clean)."""
    out = []
    for line in simple_plan(df).split("\n"):
        if "Window" in line and _has_quadratic_frame(line):
            out.append(line.strip()[:300])
    return out


def hof_filter_violations(df: DataFrame) -> list[str]:
    """Filter predicates that evaluate a higher-order-function lambda —
    the interpreted re-evaluation hazard.

    Catalyst performs NO common-subexpression elimination inside HOF
    lambdas or Filter predicates, and a predicate over a derived column
    (``where(size(<array pipeline>) > 0)``) is pushed below the
    projection and re-evaluates the WHOLE pipeline per input row in the
    interpreted path — measured 25× on the Bloom probe before the guard
    moved to the raw token count (operators/bloom.py) and documented
    earlier for minhash (operators/dedup.py:216-222).  Cheap scalar
    guards (``size(split(x)) >= 3``) contain no ``lambdafunction`` and
    pass; a condition carrying one is rebuilding an array pipeline per
    row to decide a boolean — or, see the precision caveat below,
    iterating a stored array, which the lint cannot tell apart.

    Scope: Filter nodes AND join conditions of the executed plan — a
    predicate referencing both sides (``where(cosine(a, b) >= t)``) is
    moved into the join condition by PushPredicateThroughJoin, leaving
    NO Filter node, and the fold then re-runs per considered pair in
    BroadcastNestedLoopJoin/CartesianProduct; a Filter-only lint would
    wave that exact shape through.  Generate nodes are NOT linted —
    ``explode(transform(...))`` is the normal gram-explode shape and is
    fine when, as everywhere in this repo, expensive subtrees feeding
    the lambdas are let-bound (functions/hof.py) or materialized
    attributes.

    Precision caveat: a lambda over an already-materialized ARRAY
    ATTRIBUTE (``where(exists(col("tags"), ...))`` on a scanned column)
    is cheap but still flagged — distinguishing an attribute-input
    lambda from a pipeline-rebuilding one is not robustly decidable
    from the condition string.  No registered query needs the shape;
    if one ever does, restructure it as project-the-flag-then-filter
    with `fence` (functions/hof.py), which is also the faster plan when
    the flag feeds the output.  Returns one string per offending node
    (empty == clean)."""

    def _opt_condition(node) -> str:
        """Join/filter condition as a string; '' when absent.  Join
        nodes return scala Option[Expression], Filter returns the bare
        Expression — and py4j proxies claim EVERY attribute exists, so
        the Option unwrap must be call-and-catch, not hasattr."""
        try:
            c = node.condition()
        except Exception:
            return ""
        if c is None:
            return ""
        try:
            if c.isEmpty():  # scala None
                return ""
            c = c.get()  # scala Some(expr)
        except Exception:
            pass  # bare Expression (Filter)
        try:
            return c.toString()
        except Exception:
            return ""

    plan = df._jdf.queryExecution().executedPlan()
    out: list[str] = []
    stack = [plan]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name == "Filter" or "Join" in name or "CartesianProduct" in name:
            cond = _opt_condition(node)
            if "lambdafunction(" in cond:
                kind = "Filter" if name == "Filter" else name
                out.append(
                    f"{kind} evaluates a HOF lambda per row: {cond[:160]}"
                )
        seq = node.children()
        kids = [seq.apply(i) for i in range(seq.size())]
        if not kids:
            for probe in ("inputPlan", "plan", "child"):
                try:
                    kids = [getattr(node, probe)()]
                    break
                except Exception:
                    continue
        stack.extend(kids)
    return out


def assert_plan(
    df: DataFrame,
    *,
    pushed: list[str] | None = None,
    max_shuffles: int | None = None,
    broadcast: bool | None = None,
    take_ordered: bool | None = None,
    scan_cols_at_most: set[str] | None = None,
) -> None:
    """Raise AssertionError listing every violated expectation."""
    problems: list[str] = []
    if pushed is not None:
        have = " ".join(pushed_filters(df))
        for frag in pushed:
            if frag not in have:
                problems.append(f"expected pushed filter fragment '{frag}' in [{have}]")
    if max_shuffles is not None and shuffle_count(df) > max_shuffles:
        problems.append(
            f"plan has {shuffle_count(df)} shuffles, expected <= {max_shuffles}"
        )
    if broadcast is not None and has_broadcast_join(df) != broadcast:
        problems.append(f"broadcast join expected={broadcast}")
    if take_ordered is not None and has_take_ordered(df) != take_ordered:
        problems.append(f"TakeOrderedAndProject expected={take_ordered}")
    if scan_cols_at_most is not None:
        for s in read_schema_columns(df):
            extra = s - scan_cols_at_most
            if extra:
                problems.append(f"scan reads unexpected columns: {sorted(extra)}")
    if problems:
        raise AssertionError("; ".join(problems))
