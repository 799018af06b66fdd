"""Driver-contract mirror: what the external harness checks, we check
first.  entry() produces rows with a stable schema; every registered
oracle is valid DuckDB SQL against the real views (EXPLAIN only — the
full value comparison lives in tools/check_correctness.py); every
queries() entry is callable with the documented signature."""

import duckdb
import pytest

from __spark_entry__ import entry, oracle_sql, queries

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_entry_runs_with_stable_schema(spark):
    df = entry(spark)
    cols = df.columns
    assert cols[:2] == ["l_returnflag", "l_linestatus"]
    assert df.count() > 0
    # re-invocation returns the same schema (driver calls it cold)
    assert entry(spark).columns == cols


def test_every_query_registered_consistently():
    q, o = queries(), oracle_sql()
    assert set(o) <= set(q), "oracle for an unregistered query"
    assert len(q) >= 90
    for name, fn in q.items():
        assert callable(fn), name


def test_all_oracles_are_valid_duckdb(sf_dir):
    """EXPLAIN every oracle against the real views — a syntax error or
    a misspelled column fails here in seconds, not in the driver."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    bad = []
    for name, sql in oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            bad.append((name, str(e)[:120]))
    assert not bad, bad


# The FROZEN driver-gate window (VERDICT r13 items 1-2): the round-13
# session rotated 4 queries out of driver visibility by reordering
# _GATE_FIRST, which made the round verdict "regressed" regardless of
# speed.  Round 14 restored them (swapping out join_cross /
# setop_union_intersect_except / engine_dynamic_table /
# engine_keyset_paging — all golden-test-pinned and shape-subsumed by
# in-gate siblings, swap declared in OPTIMIZATION_r14.md) and FROZE the
# window: this tuple is the declared driver-visible set.  Changing it
# fails this test on purpose — any future edit must update BOTH copies
# and carry a matching declaration in that round's OPTIMIZATION notes,
# so the driver's dropped/new query lists are always pre-attributed.
FROZEN_GATE_WINDOW = (
    "engine_param_query", "engine_derived_when",
    "engine_default_value", "engine_projection_pruning",
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "agg_groupby_dynamic_dims", "agg_cube", "agg_rollup",
    "agg_distinct_count", "pivot_status_by_priority", "join_left_outer",
    "join_semi", "join_anti", "join_full_outer",
    "window_topk_per_group", "window_lag_delta", "window_running_sum",
    "topk_global", "scalar_string_funcs",
    "scalar_date_funcs", "scalar_math_funcs", "scalar_array_map_json",
    "text_token_count", "text_quality_score", "text_lang_guess",
    "text_fingerprint", "dedup_exact", "text_shingles",
    "dedup_ngram_jaccard", "sim_cosine_topk", "sim_pairs_above_threshold",
    "events_tumbling_hourly", "events_sliding_windows", "events_sessionize",
    "events_retention_cohorts", "events_attribution_position",
    "stream_tumbling_watermark", "stream_session_window_stateful",
    "dedup_minhash_lsh", "dedup_lsh_recall_audit", "simhash_recall_audit",
    "sim_recall_report",
    "skew_salted_join", "multimodal_image_features",
    "embedding_norm_stats", "simhash_pairs", "sim_lsh_ann_topk",
    "sim_ivf_ann_topk",
)


def test_gate_window_ordering():
    """The driver samples the first 50 queries() entries; the explicit
    gate window must (a) be exactly 50 unique registered names, all
    oracled, (b) lead the dict in order, (c) match the FROZEN window
    above name-for-name (the freeze-and-declare policy, VERDICT r13
    item 1), and (d) leave the full registry intact behind it (no
    query lost by the reordering)."""
    import __spark_entry__ as entry
    from ubw_spark.queries import REGISTRY

    gate = entry._GATE_FIRST
    assert len(gate) == 50 and len(set(gate)) == 50
    assert tuple(gate) == FROZEN_GATE_WINDOW, (
        "_GATE_FIRST drifted from the frozen driver-gate window — if "
        "this is deliberate, update FROZEN_GATE_WINDOW and declare the "
        "swap in this round's OPTIMIZATION notes (freeze-and-declare "
        "policy, VERDICT r13)"
    )
    q = entry.queries()
    assert list(q)[:50] == gate
    oracles = entry.oracle_sql()
    assert all(n in oracles for n in gate)
    for name in (
        # the round-13 rotation casualties, restored round 14
        "embedding_norm_stats", "simhash_pairs", "sim_lsh_ann_topk",
        "sim_ivf_ann_topk",
        # the round-13 additions stay visible
        "stream_session_window_stateful", "skew_salted_join",
        "multimodal_image_features", "sim_recall_report",
    ):
        assert name in gate, name
    assert set(q) == set(REGISTRY)
    assert list(oracles)[:50] == gate
