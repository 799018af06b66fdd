"""Unit tests for bench.py's regression comparator (the full bench run
is the driver's job; here we pin the flagging semantics)."""

from bench import composite_baseline, regressions


def test_flags_real_regression():
    cur = {"q1": 3.0, "q2": 0.5}
    base = {"q1": 1.0, "q2": 0.5}
    regs = regressions(cur, base)
    assert len(regs) == 1 and regs[0].startswith("q1:")


def test_absolute_floor_suppresses_noise():
    # 2x on a 0.2s query is scheduler noise, not a regression
    assert regressions({"q": 0.4}, {"q": 0.2}) == []
    # but 2x on a 1s query is real
    assert regressions({"q": 2.0}, {"q": 1.0}) != []


def test_new_queries_skip_baseline():
    assert regressions({"brand_new": 9.9}, {}) == []


def test_within_factor_passes():
    assert regressions({"q": 1.4}, {"q": 1.0}) == []


# --- composite baseline (contamination guard) ---

CLEAN_R1 = {"q1": 1.0, "minhash": 3.2}
CLEAN_R3 = {"q1": 1.5, "minhash": 3.0}
CONTAMINATED_R2 = {"q1": 2.6, "minhash": 12.7}  # contended-box recording


def test_composite_takes_per_query_min():
    base, skipped = composite_baseline({"r1": CLEAN_R1, "r3": CLEAN_R3})
    assert base == {"q1": 1.0, "minhash": 3.0}
    assert skipped == []


def test_contaminated_file_discarded():
    base, skipped = composite_baseline(
        {"r1": CLEAN_R1, "r2": CONTAMINATED_R2, "r3": CLEAN_R3}
    )
    assert skipped == ["r2"]
    assert base == {"q1": 1.0, "minhash": 3.0}


def test_contaminated_baseline_cannot_mask_regression():
    """The scenario the guard exists for: comparing a genuinely 2x-slowed
    query against ONLY the contended recording would pass; the composite
    baseline keeps the clean floor and flags it."""
    slowed = {"q1": 2.2, "minhash": 3.1}  # q1 really regressed 2.2x
    # naive single-file compare vs the bad recording: silently green
    assert regressions(slowed, CONTAMINATED_R2) == []
    base, _ = composite_baseline({"r1": CLEAN_R1, "r2": CONTAMINATED_R2})
    regs = regressions(slowed, base)
    assert len(regs) == 1 and regs[0].startswith("q1:")


def test_lone_contaminated_file_is_its_own_best_known():
    # with nothing clean to compare against, the single file stands
    base, skipped = composite_baseline({"r2": CONTAMINATED_R2})
    assert base == CONTAMINATED_R2 and skipped == []


def test_empty_docs_yield_empty_baseline():
    assert composite_baseline({}) == ({}, [])
    assert composite_baseline({"r": {}}) == ({}, [])


def test_bigger_query_set_is_not_contamination():
    """A clean recording with MORE queries must not be discarded just
    because its whole-file total exceeds 2x an older smaller set's
    total: contamination is judged on the common-query subset."""
    old = {"a": 1.0, "b": 1.0}
    grown = {"a": 1.1, "b": 1.1, "c": 10.0, "d": 10.0}  # clean, bigger set
    base, skipped = composite_baseline({"old.json": old, "grown.json": grown})
    assert skipped == []
    assert base["a"] == 1.0 and base["c"] == 10.0  # new names contribute


def test_contamination_still_detected_on_common_subset():
    old = {"a": 1.0, "b": 1.0}
    contended = {"a": 3.0, "b": 3.0, "c": 5.0}  # 3x on the common set
    base, skipped = composite_baseline(
        {"old.json": old, "contended.json": contended}
    )
    assert skipped == ["contended.json"]
    assert "c" not in base  # the bad file's exclusive names set no floor


def test_compact_summary_doc_is_not_a_baseline():
    """The worst-5 tail line (bench.py's compact summary, what the
    driver's 2kB capture records as 'parsed') must yield NO baseline
    queries: folding a 5-query subset into the composite would narrow
    the regression gate to those 5 and shrink the contamination
    compare's common set.  Full recordings (BENCH_LOCAL.json) parse."""
    from bench import _extract_queries

    compact = {
        "metric": "headline_queries_total_runtime",
        "value": 70.0,
        "compact": True,
        "queries": {"worst1": 9.0, "worst2": 8.0},
    }
    assert _extract_queries(compact) == {}
    assert _extract_queries({"parsed": compact}) == {}
    full = {"value": 70.0, "queries": {"a": 1.0, "b": 2.0}}
    assert _extract_queries(full) == {"a": 1.0, "b": 2.0}
    assert _extract_queries({"parsed": full}) == {"a": 1.0, "b": 2.0}
    assert _extract_queries({"parsed": None}) == {}


def test_regressed_names_extracts_query_names():
    from bench import regressed_names

    cur = {"fast": 0.1, "slow": 3.0, "new": 9.9}
    base = {"fast": 0.1, "slow": 1.0}
    assert regressed_names(cur, base) == ["slow"]
    assert regressed_names({"q": 1.1}, {"q": 1.0}) == []


# --- dated idle floors (BENCH_IDLE_rNN.json) ---


def test_idle_snapshot_verdict_gates_on_start_load_and_retries():
    from bench import idle_snapshot_verdict

    clean = {"load_avg": {"start": [0.3, 1.0, 1.2]}, "queries": {"q": 1.0}}
    assert idle_snapshot_verdict(clean)[0]
    loaded = {"load_avg": {"start": [1.96, 1.61, 1.9]}}
    ok, why = idle_snapshot_verdict(loaded)
    assert not ok and "1.96" in why
    retried = {
        "load_avg": {"start": [0.2, 0.3, 0.3]},
        "retried": [{"query": "q", "first": 2.0, "retry": 1.0}],
    }
    ok, why = idle_snapshot_verdict(retried)
    assert not ok and "retried" in why
    assert not idle_snapshot_verdict({})[0]  # no load sample → not provable


def test_committed_idle_floors_set_best_known_per_query():
    """The round-12 gate compares against the BEST historical floor per
    query: a dated idle recording keeps its clean floor even after the
    driver overwrites BENCH_LOCAL.json with a contended run."""
    idle_r11 = {"q1": 1.0, "minhash": 3.0}        # committed dated floor
    driver_overwrite = {"q1": 1.4, "minhash": 4.1}  # later, warmer box
    base, skipped = composite_baseline(
        {"BENCH_IDLE_r11.json": idle_r11, "BENCH_LOCAL.json": driver_overwrite}
    )
    assert skipped == []
    assert base == {"q1": 1.0, "minhash": 3.0}


def test_committed_idle_files_parse_and_qualify():
    """Every committed BENCH_IDLE_r*.json must be a FULL recording
    (usable as a baseline) that passes its own idle gate — an inflated
    dated floor defeats the whole mechanism."""
    import glob
    import json
    import os

    from bench import _extract_queries, idle_snapshot_verdict

    root = os.path.dirname(os.path.abspath(__file__)) + "/.."
    files = sorted(glob.glob(os.path.join(root, "BENCH_IDLE_r*.json")))
    for p in files:
        with open(p) as f:
            doc = json.load(f)
        assert _extract_queries(doc), f"{p} has no per-query timings"
        ok, why = idle_snapshot_verdict(doc)
        assert ok, f"{p} does not qualify as an idle floor: {why}"


def test_empty_glob_baseline_is_skipped_not_opened(tmp_path):
    """An unmatched glob (e.g. 'BENCH_IDLE_r*.json' before any idle
    floor exists) must be skipped, not treated as a literal path —
    main() crashed on FileNotFoundError otherwise.  A missing LITERAL
    path must still fail loudly (typo protection)."""
    from bench import expand_baseline_args as expand

    assert expand([str(tmp_path / "BENCH_IDLE_r*.json")]) == []
    missing = str(tmp_path / "BENCH_LOCAL.json")
    assert expand([missing]) == [missing]  # literal passes through to open()
    real = tmp_path / "BENCH_IDLE_r12.json"
    real.write_text("{}")
    assert expand([str(tmp_path / "BENCH_IDLE_r*.json")]) == [str(real)]


def test_drift_canary_block():
    """Minted idle floors carry the host-drift canary (VERDICT r12 #7):
    the canary query's at-mint time next to the best historical floor
    so drift and regression are distinguishable without a replay."""
    from bench import DRIFT_CANARY_QUERY, drift_canary

    c = drift_canary(
        {DRIFT_CANARY_QUERY: 1.73, "other": 2.0},
        {DRIFT_CANARY_QUERY: 0.97},
    )
    assert c["query"] == DRIFT_CANARY_QUERY
    assert c["at_mint_sec"] == 1.73 and c["best_floor_sec"] == 0.97
    assert c["ratio_vs_best_floor"] == round(1.73 / 0.97, 3)
    # degenerate inputs: no baseline yet / canary not timed → no ratio
    assert drift_canary({}, None)["ratio_vs_best_floor"] is None
    assert drift_canary({DRIFT_CANARY_QUERY: 1.0}, {})["best_floor_sec"] is None


def test_committed_idle_floors_from_r13_carry_drift_canary():
    """Every dated idle floor minted from round 13 on must embed the
    canary block — --idle-snapshot adds it at write time."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.abspath(__file__)) + "/.."
    for p in sorted(glob.glob(os.path.join(root, "BENCH_IDLE_r*.json"))):
        m = re.search(r"BENCH_IDLE_r(\d+)", p)
        if m and int(m.group(1)) >= 13:
            with open(p) as f:
                doc = json.load(f)
            assert "drift_canary" in doc, f"{p} missing drift_canary"
            assert doc["drift_canary"]["at_mint_sec"] is not None
