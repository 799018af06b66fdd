"""Benchmark runner — the driver executes this per round.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the full
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} followed by a COMPACT summary line
(same schema, "queries" = worst-5 only) as the LAST stdout line — the
driver records only a ~2kB stdout tail, and the compact line fits it
whole.  The full recording is also written to BENCH_LOCAL.json
($SPARK_GRAFT_BENCH_OUT overrides).

Each query executes fully (noop sink — no driver-side collect cost, no
files written) so the measured time is scan + compute + shuffle.

Regression mode: ``python bench.py --compare 'BENCH_r*.json'`` (or
``SPARK_GRAFT_BASELINE=path`` — both accept globs and multiple paths)
additionally compares per-query times to the composite baseline and
exits non-zero if any query regressed >1.5× (with a 0.25 s absolute
floor so sub-second queries don't flap on scheduler noise).  The
composite baseline is the per-query MIN across all given files, after
discarding any file whose total is >2× the best-known total — a run
recorded on a contended box (BENCH_r02.json: 30.8 s vs 11.0 s clean)
would otherwise inflate every per-query floor and mask a real 2×
regression.  Baseline files are snapshotted BEFORE this run overwrites
BENCH_LOCAL.json, so the committed previous round's full recording can
(and should) be in the compare glob.  The default driver invocation —
no flag, no env — never exits non-zero for a slow query.

Contention hardening: the output JSON records 1/5/15-min load averages
at each measurement point ("load_avg"), and when a query regresses
>1.5× while the 1-min load AT START exceeded LOAD_RETRY_THRESHOLD,
bench backs off once and re-times just the offenders ("retried"
carries the provenance) — a shared box's other tenants inflate
wall-clock uniformly and have flapped the gate with different
offenders each run.  Only the start sample discriminates: mid-run
loadavg is dominated by the bench's own local[32] execution.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "agg_cube",
    "window_topk_per_group",
    "engine_param_query",
    "json_driven_query",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "text_bpe_token_count",
    "sim_cosine_topk",
    "events_sessionize",
    "events_funnel",
    "asof_join_last_click",
    # Round-6 additions (VERDICT r5 item 3): heavier relational shapes +
    # the scale-path LLM-pipeline operators.  New names set their own
    # baseline on first recorded round; the original 15 stay comparable.
    "q9_product_profit",
    "q21_waiting_supplier",
    "dedup_connected_components",
    "sim_quantized_prerank",
    "curation_token_budget_mix",
    # Round-7 additions: the shuffled dump-vs-dump contamination sweep,
    # the persisted-index incremental dedup (timing includes the index
    # write — that IS the operation), and the real WAV decode path.
    "dedup_contamination_large_probe",
    "dedup_incremental_index_probe",
    "multimodal_audio_features",
    "sim_pq_ann_topk",
    "sim_ivfpq_ann_topk",
    # ExactSubstr-style duplicated-span extraction (gram inverted index
    # + per-doc interval merge — O(total tokens), no pair join), and its
    # persisted-index incremental probe (timing includes the bucketed
    # index write — that IS the operation, as with the LSH index).
    "dedup_duplicate_spans",
    "dedup_span_index_probe",
    # Z-order layout math (bucketize + Morton interleave + histogram).
    "layout_zorder_histogram",
    # Round-8 additions: cluster-bounded semantic dedup (SemDeDup),
    # DSIR importance resampling, corpus-unigram-LM quality scoring,
    # the exact-quantile bucketing kernel, and the persisted IVF probe
    # (timing includes the versioned index write — that IS the
    # operation, as with the LSH/gram index entries).
    "dedup_semantic_semdedup",
    "curation_dsir_select",
    "text_unigram_logprob",
    "layout_quantile_bucket_histogram",
    "sim_ivf_store_probe",
    # Bloom-filter decontamination: fixed-size bitset membership instead
    # of a corpus-side join — build ∝ benchmark, probe map-only.  The
    # store variant times the full persisted lifecycle (write + OR-merge
    # append + probe) like the other index-store entries.
    "dedup_bloom_decontaminate",
    "dedup_bloom_store_probe",
    # BM25 lexical retrieval against the persisted inverted index:
    # timing includes the term-bucketed index write (the lifecycle IS
    # the operation); the probe itself reads only the query terms'
    # hash-bucket partitions.
    "search_bm25_store_probe",
    # Round-8 late additions: the trainer-feed shard plan (map-only keys
    # + one bounded groupBy), the count-min sketch error audit (sketch
    # shuffle bounded at depth*width cells), and hard-negative mining
    # (BM25 top-k candidates anti-joined against exact phrase matches).
    "shard_plan_balance",
    "sketch_cms_error_audit",
    "search_hard_negatives",
    # The persisted CMS store lifecycle (write half + ADD-merge append
    # half + probe — the 7th versioned store, timed like its siblings).
    "sketch_cms_store_probe",
    # Round-8 final additions: the HLL store lifecycle (8th versioned
    # store — write + max-merge append + a deliberate REPLAY append +
    # estimate), join-view incremental maintenance (the delta fold vs
    # re-joining the dump), per-key time-series gap-fill, and the
    # coarse-block fuzzy linkage top-k.
    "sketch_hll_store_probe",
    "cdc_incremental_join_agg",
    "ts_gapfill_interpolate",
    "linkage_match_topk",
    # Session-5 additions: sufficient-statistics OLS (exact decimal sums,
    # broadcast dim join), the rolling-distinct engagement curve (map-only
    # ×7 day-grain fan-out, no day-spine join), per-key rolling z-score
    # anomaly scoring, and the 7-edge FK orphan sweep (one join + one
    # aggregate per edge).
    "stats_groupwise_ols",
    "events_dau_wau_stickiness",
    "ts_rolling_anomaly",
    "quality_referential_integrity",
    # The quantile-store lifecycle (10th versioned store, timed like its
    # siblings: write + ADD-merge append + estimate) and the corpus
    # term-share drift monitor (two vocab aggregates + full-outer join).
    "sketch_quantile_store_probe",
    "corpus_term_drift",
    # Poisson bootstrap: all 32 resample means from one map-only
    # explode+combine pass — the B-rows-of-shuffle shape, timed.
    "stats_bootstrap_means",
    # Kaplan-Meier churn curve (per-unit reduction + calendar-bounded
    # aggregate) and the CUPED experiment readout (two aggregates).
    "events_survival_curve",
    "stats_cuped_adjusted",
    # Round-11 additions: the streaming term-index ingest loop (a real
    # foreachBatch Structured Streaming query into the versioned store
    # — the timing IS the micro-batch lifecycle), and the LSH recall
    # audit (exact-Jaccard ground truth on a fixed 250-doc slice vs the
    # production MinHash pipeline — the measure-don't-guess artifact).
    "stream_term_index_ingest",
    "dedup_lsh_recall_audit",
    # Round-12 additions: the watermark/event-time streaming path (real
    # readStream over out-of-order arrival files → 10-day watermark →
    # append-mode tumbling windows, oracled against the batch twin) and
    # the SimHash recall audit (exact-Hamming ground truth on the fixed
    # audit slice — the MinHash audit's bitwise sibling).
    "stream_tumbling_watermark",
    "simhash_recall_audit",
    # Round-13 additions: the STATEFUL streaming path (session_window
    # state merging across out-of-order micro-batches, oracled against
    # the batch sessionize twin — timing IS the micro-batch lifecycle,
    # like the other streaming entries), the salted hot-key join, the
    # stdlib-PNG image decode path, and the four-variant ANN recall
    # matrix (IVF sweep + LSH + PQ + IVFPQ vs exact, one report).
    "stream_session_window_stateful",
    "skew_salted_join",
    "multimodal_image_features",
    "sim_recall_report",
]


REGRESSION_FACTOR = 1.5
REGRESSION_FLOOR_SEC = 0.25
# A baseline file whose total exceeds best-known × this is a contaminated
# recording (contended box), not a real floor — discard it wholesale.
CONTAMINATION_FACTOR = 2.0
# If any query regresses while the 1-min load average exceeds this, the
# box is contended (other tenants) and the timing is suspect: back off
# and re-time just the offenders once before gating.  The load averages
# at each measurement point are recorded in the output JSON either way,
# so a red gate is self-interpreting after the fact.
LOAD_RETRY_THRESHOLD = 1.5
LOAD_RETRY_BACKOFF_SEC = 30.0
# A recording qualifies as a committed dated floor (BENCH_IDLE_rNN.json)
# only when captured on an actually idle box: 1-min load below this AT
# START (bench's own local[N] threads pollute every later sample) and
# zero contention retries.  COVERAGE.md's scale tables cite this gate.
IDLE_LOAD_THRESHOLD = 0.5
# The host-drift canary (VERDICT r12 #7): every minted idle floor
# records this query's time alongside the best historical floor, so a
# reader can tell shared-box speed drift (canary moved with the total)
# from a code regression (total moved, canary didn't) without replaying
# the composite.  q1 is the oldest, most stable headline query.
DRIFT_CANARY_QUERY = "q1_pricing_summary"


def drift_canary(
    timings: dict[str, float], base_queries: dict[str, float] | None
) -> dict:
    """The canary block embedded in idle-floor snapshots."""
    best = (base_queries or {}).get(DRIFT_CANARY_QUERY)
    at_mint = timings.get(DRIFT_CANARY_QUERY)
    return {
        "query": DRIFT_CANARY_QUERY,
        "at_mint_sec": at_mint,
        "best_floor_sec": best,
        "ratio_vs_best_floor": (
            round(at_mint / best, 3) if at_mint and best else None
        ),
    }


def expand_baseline_args(args: list[str]) -> list[str]:
    """Baseline path expansion for --compare / SPARK_GRAFT_BASELINE.
    An empty GLOB is fine (e.g. 'BENCH_IDLE_r*.json' before the first
    idle floor exists) and is skipped with a note; a missing LITERAL
    path is a typo and passes through so open() fails loudly."""
    paths: list[str] = []
    for a in args:
        matches = sorted(_glob.glob(a))
        if matches:
            paths.extend(matches)
        elif _glob.has_magic(a):
            print(f"baseline glob {a} matched nothing", file=sys.stderr)
        else:
            paths.append(a)
    return paths


def idle_snapshot_verdict(doc: dict) -> tuple[bool, str]:
    """Whether a full recording qualifies as a dated idle floor.

    The driver's per-round bench run overwrites BENCH_LOCAL.json, so a
    clean recording survives only if copied to a dated
    ``BENCH_IDLE_rNN.json`` and committed — and only QUALIFYING
    recordings may be: an inflated floor loosens next round's 1.5×
    regression gate by exactly its inflation (the round-11 committed
    sf0.1 leg started at load 1.96 with 4 retries and loosened the gate
    ~1.15-1.8×).  ``--idle-snapshot PATH`` applies this verdict."""
    start = ((doc.get("load_avg") or {}).get("start") or [None])[0]
    if start is None:
        return False, "no load_avg.start sample"
    if start >= IDLE_LOAD_THRESHOLD:
        return (
            False,
            f"1-min load at start {start:.2f} >= {IDLE_LOAD_THRESHOLD}",
        )
    if doc.get("retried"):
        return False, f"{len(doc['retried'])} quer(ies) retried under load"
    return True, f"idle (start load {start:.2f}, no retries)"


def _loadavg() -> list[float] | None:
    """[1, 5, 15]-minute load averages, or None where unsupported."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except (OSError, AttributeError):
        return None


def _extract_queries(doc: dict) -> dict[str, float]:
    """Per-query timings from either the raw bench line or the driver's
    BENCH_rNN.json wrapper ({..., "parsed": {raw line}}).

    COMPACT summary docs (the worst-5 tail line, marked "compact") are
    rejected outright: folding a 5-query subset into the composite
    would silently narrow the regression gate to those 5 queries and
    shrink composite_baseline's common-set contamination compare to a
    near-empty intersection.  The full recording for each round is the
    committed BENCH_LOCAL.json — include it in the compare glob."""
    # "parsed" is null in a crashed round's wrapper (e.g. BENCH_r05.json)
    inner = doc if "queries" in doc else (doc.get("parsed") or {})
    if inner.get("compact"):
        return {}
    return inner.get("queries") or {}


def composite_baseline(
    docs: dict[str, dict[str, float]],
    contamination_factor: float = CONTAMINATION_FACTOR,
) -> tuple[dict[str, float], list[str]]:
    """Fold {path: per-query timings} into one baseline.

    Files whose total runtime is > contamination_factor × the smallest
    total are discarded (returned as the second element) — their numbers
    reflect box contention, and folding them in via min() would be
    harmless for queries present in a clean file but would set a bogus
    high floor for queries that only appear in the bad file.  Surviving
    files contribute the per-query minimum.

    Totals are compared over the queries COMMON to all files: the
    headline set grows across rounds, so a whole-file total is not
    comparable between a 15-query and a 24-query recording (r6's clean
    20-query run was once discarded as "contaminated" against r4's
    15-query total purely for being a bigger set)."""
    docs = {p: q for p, q in docs.items() if q}
    if not docs:
        return {}, []
    common: set[str] = set.intersection(*(set(q) for q in docs.values()))

    def comparable_total(q: dict[str, float]) -> float:
        return sum(q[n] for n in common) if common else sum(q.values())

    best_total = min(comparable_total(q) for q in docs.values())
    skipped = [
        p for p, q in docs.items()
        if comparable_total(q) > best_total * contamination_factor
    ]
    base: dict[str, float] = {}
    for p, q in docs.items():
        if p in skipped:
            continue
        for name, t in q.items():
            if name not in base or t < base[name]:
                base[name] = t
    return base, sorted(skipped)


def regressions(
    current: dict[str, float],
    baseline: dict[str, float],
    factor: float = REGRESSION_FACTOR,
    floor_sec: float = REGRESSION_FLOOR_SEC,
) -> list[str]:
    """Queries slower than ``factor``× their baseline time (and by more
    than ``floor_sec`` absolute — 1.5× of 0.2 s is scheduler noise, not
    a regression).  Queries missing from the baseline are skipped: new
    queries set their own baseline next round."""
    return [
        f"{name}: {cur:.3f}s vs baseline {base:.3f}s ({cur/base:.2f}x)"
        for name, cur, base in _regressed(current, baseline, factor, floor_sec)
    ]


def _regressed(
    current: dict[str, float],
    baseline: dict[str, float],
    factor: float = REGRESSION_FACTOR,
    floor_sec: float = REGRESSION_FLOOR_SEC,
) -> list[tuple[str, float, float]]:
    """(name, current, baseline) triples — the structured core both the
    report formatter and the retry pass consume (parsing names back out
    of display strings would couple retry to the report format)."""
    out = []
    for name, cur in current.items():
        base = baseline.get(name)
        if base is None:
            continue
        if cur > base * factor and cur - base > floor_sec:
            out.append((name, cur, base))
    return out


def regressed_names(
    current: dict[str, float],
    baseline: dict[str, float],
    factor: float = REGRESSION_FACTOR,
    floor_sec: float = REGRESSION_FLOOR_SEC,
) -> list[str]:
    """Just the regressed query names — what the retry pass re-times."""
    return [n for n, _, _ in _regressed(current, baseline, factor, floor_sec)]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if not cpus.isdigit():  # 'local[*]' idiom: '*' → machine core count
        cpus = str(os.cpu_count() or 8)

    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"),
    )
    # Snapshot the baseline files BEFORE the run overwrites out_path:
    # the committed previous-round BENCH_LOCAL.json is the only full
    # recording of recent rounds (driver BENCH_rNN.json wrappers carry
    # just the compact tail line) — loading baselines after writing
    # out_path would freeze the gate's floors at old rounds.
    # --idle-snapshot is extracted FIRST: --compare slurps every
    # remaining argv token as a baseline path
    argv = list(sys.argv[1:])
    idle_out: str | None = None
    if "--idle-snapshot" in argv:
        i = argv.index("--idle-snapshot")
        if i + 1 >= len(argv):
            print("--idle-snapshot requires an output path", file=sys.stderr)
            sys.exit(2)
        idle_out = argv[i + 1]
        del argv[i : i + 2]
    baseline_args: list[str] = []
    env = os.environ.get("SPARK_GRAFT_BASELINE")
    if env:
        baseline_args.extend(env.split(os.pathsep))
    if "--compare" in argv:
        i = argv.index("--compare")
        if i + 1 >= len(argv):
            print("--compare requires baseline path(s)", file=sys.stderr)
            sys.exit(2)
        baseline_args = argv[i + 1 :]
    base_queries: dict[str, float] = {}
    n_baseline_files = 0
    if baseline_args:
        paths = expand_baseline_args(baseline_args)
        docs: dict[str, dict[str, float]] = {}
        for p in paths:
            with open(p) as f:
                docs[p] = _extract_queries(json.load(f))
        base_queries, skipped = composite_baseline(docs)
        # an empty composite baseline would silently pass everything
        if not base_queries:
            print(f"baselines {paths} have no per-query timings",
                  file=sys.stderr)
            sys.exit(2)
        for p in skipped:
            print(
                f"baseline {p} discarded as contaminated "
                f"(total >{CONTAMINATION_FACTOR}x best-known)",
                file=sys.stderr,
            )
        # only files that actually set floors: non-empty query maps
        # (compact/crashed docs parse to {}) minus the contaminated
        n_baseline_files = sum(1 for q in docs.values() if q) - len(skipped)

    from ubw_spark.queries import REGISTRY
    from ubw_spark.session import get_session

    spark = get_session(
        "ubw_spark-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    # The contention discriminator must be sampled BEFORE any of the
    # bench's own work: by the end of the warmup pass the 1-min loadavg
    # reflects this process's local[N] threads (measured ~2-3 on an
    # otherwise idle box), which would trip the LOAD_RETRY_THRESHOLD
    # gate on EVERY run and reduce "contended" to "always".
    load_points: dict[str, list[float] | None] = {"start": _loadavg()}
    # Warmup pass (untimed): JVM JIT + parquet footer/file-index caches.
    # The reported numbers are steady-state throughput, which is what a
    # long-lived cluster session delivers.
    for name in HEADLINE:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Two timed passes, report the per-query MIN: single-pass numbers on
    # a shared box carry ±10-30% scheduler noise, which flaps the
    # regression gate; the minimum is the standard steady-state estimate.
    def timed_pass(target_dir: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for _pass in range(2):
            for name in HEADLINE:
                qd = REGISTRY[name]
                t0 = time.perf_counter()
                qd.fn(spark, target_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.perf_counter() - t0, 3)
                if name not in out or dt < out[name]:
                    out[name] = dt
        return out

    def parse_sf(d: str) -> float | None:
        m = re.search(r"sf([0-9.]+)", d)
        try:
            return float(m.group(1).rstrip(".")) if m else None
        except ValueError:
            return None

    load_points["after_warmup"] = _loadavg()
    timings = timed_pass(sf_dir)
    load_points["after_primary"] = _loadavg()

    # Second scale factor (default sf0.01; SPARK_GRAFT_SF2_DIR overrides,
    # empty disables): round-over-round comparisons need to separate
    # fixed overhead (session, planning, index-write latency floors) from
    # data-scaling cost — a single sf conflates them.  The regression
    # comparator gates ONLY on the primary block; this one is recorded
    # evidence.  Already-warm session: one timed double-pass, no extra
    # warmup loop (plan caches are per-query shapes, not per-path data).
    sf2_dir = os.environ.get("SPARK_GRAFT_SF2_DIR", "/root/testdata/sf0.01")
    sf_extra = None
    # realpath comparison: a trailing slash or symlink alias of the
    # primary dir must not be double-timed and recorded as a second sf
    if (
        sf2_dir
        and os.path.isdir(sf2_dir)
        and os.path.realpath(sf2_dir) != os.path.realpath(sf_dir)
    ):
        t2 = timed_pass(sf2_dir)
        load_points["after_sf_extra"] = _loadavg()
        sf_extra = {
            "sf": parse_sf(sf2_dir),
            "value": round(sum(t2.values()), 3),
            "queries": t2,
        }

    # Retry-under-load: if a query regressed vs the baseline AND the box
    # was contended at measurement time (another tenant's load inflates
    # every wall-clock uniformly — the documented flap signature), back
    # off once and re-time just the offenders.  min(first, retry) is the
    # recorded number; the provenance rides in the output JSON so a gate
    # decision is auditable.
    retried: list[dict] = []
    if base_queries:
        offenders = regressed_names(timings, base_queries)
        # Only the START sample can discriminate tenant contention: by
        # the after_* points the bench's OWN local[32] run has driven
        # the 1-min load far above any threshold, so gating on the max
        # across points would label every run contended.  (Contention
        # that begins mid-run is indistinguishable from self-load in
        # loadavg and is caught by the committed-recording compare next
        # round instead.)
        start_1m = (load_points.get("start") or [0.0])[0]
        contended = start_1m > LOAD_RETRY_THRESHOLD
        if offenders and contended:
            print(
                f"retrying {len(offenders)} regressed quer(ies) after "
                f"{LOAD_RETRY_BACKOFF_SEC:.0f}s backoff (1-min load at "
                f"start was {start_1m:.2f} > {LOAD_RETRY_THRESHOLD})",
                file=sys.stderr,
            )
            time.sleep(LOAD_RETRY_BACKOFF_SEC)
            load_points["at_retry"] = _loadavg()
            for name in offenders:
                qd = REGISTRY[name]
                best = None
                for _pass in range(2):
                    t0 = time.perf_counter()
                    qd.fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = round(time.perf_counter() - t0, 3)
                    if best is None or dt < best:
                        best = dt
                retried.append(
                    {"query": name, "first": timings[name], "retry": best}
                )
                if best < timings[name]:
                    timings[name] = best
            load_points["after_retry"] = _loadavg()

    doc = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": parse_sf(sf_dir),
        "load_avg": load_points,
    }
    if retried:
        doc["retried"] = retried
    if sf_extra is not None:
        doc["sf_extra"] = sf_extra
    # Full recording to a file (the driver keeps only a ~2kB stdout
    # tail, which truncates the 50+-query line into "parsed": null);
    # the LAST stdout line is a compact summary that fits the tail
    # whole, so the driver's BENCH_rN.json carries a parseable block.
    try:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
    except OSError as e:
        print(f"could not write {out_path}: {e}", file=sys.stderr)
    if idle_out:
        ok, why = idle_snapshot_verdict(doc)
        if ok:
            doc["drift_canary"] = drift_canary(timings, base_queries)
            with open(idle_out, "w") as f:
                json.dump(doc, f, indent=1)
            print(f"idle floor written to {idle_out}: {why}", file=sys.stderr)
        else:
            print(
                f"NOT writing idle floor {idle_out}: {why} — rerun on an "
                "idle box; committing this recording would loosen the "
                "regression gate",
                file=sys.stderr,
            )
    print(json.dumps(doc))
    worst = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    )
    compact = {
        "metric": doc["metric"],
        "value": doc["value"],
        "unit": "sec",
        "sf": doc["sf"],
        "n_queries": len(timings),
        "compact": True,  # _extract_queries must NOT baseline this doc
        "queries": worst,  # worst-5; full per-query block in `full`
        "full": os.path.basename(out_path),
        "load_1m": (load_points.get("start") or [None])[0],
        "n_retried": len(retried),
    }
    if sf_extra is not None:
        compact["sf_extra_total"] = sf_extra["value"]
        compact["sf_extra_sf"] = sf_extra["sf"]
    print(json.dumps(compact))
    spark.stop()

    if base_queries:
        regs = regressions(timings, base_queries)
        for r in regs:
            print(f"REGRESSION {r}", file=sys.stderr)
        if regs:
            sys.exit(1)
        print(
            f"no regressions vs {n_baseline_files} baseline file(s) "
            f"(factor {REGRESSION_FACTOR}, floor {REGRESSION_FLOOR_SEC}s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
