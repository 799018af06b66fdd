"""The examples/curate_corpus.py staged pipeline runs end to end on
real testdata and its funnel is monotone + meaningful."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)


def test_curate_corpus_end_to_end(spark, sf_dir, tmp_path):
    from curate_corpus import curate

    out = str(tmp_path / "curated")
    counts = curate(spark, sf_dir, out, min_chars=120, eval_ids_from=480)

    assert counts["00_read"] == 500
    # monotone funnel: every stage can only drop rows
    order = [
        "00_read", "01_quality", "02_exact_dedup", "03_near_dedup",
        "04_span_cut", "05_decontam", "06_dsir_select", "07_final",
    ]
    for a, b in zip(order, order[1:]):
        assert counts[b] <= counts[a], (a, b, counts)
    # the DSIR resample keeps ~80% of decontam survivors; documents
    # left with <2 tokens after the span cut have no bigram features
    # and are excluded from the pool, so the kept count is AT MOST k
    # (exactly k on this fixture, but that is data-dependent)
    k = max(1, int(counts["05_decontam"] * 0.8))
    assert 0 < counts["06_dsir_select"] <= k
    # each dedup stage actually did something on the synthetic corpus
    # (it contains planted clones); quality gate drops short docs
    assert counts["01_quality"] < counts["00_read"]
    assert counts["03_near_dedup"] < counts["01_quality"]
    assert counts["07_final"] > 0
    # split partition dirs exist and add up
    splits = [
        d for d in os.listdir(os.path.join(out, "07_final"))
        if d.startswith("split=")
    ]
    assert "split=train" in splits
    total = sum(
        counts[f"07_final_{s.removeprefix('split=')}"] for s in splits
    )
    assert total == counts["07_final"]
    # trainer feed: shard dirs cover the train split exactly
    shard_dirs = [
        d for d in os.listdir(os.path.join(out, "08_shards"))
        if d.startswith("shard=")
    ]
    assert len(shard_dirs) == 4
    assert counts["08_shards"] == counts["07_final_train"]


def test_curate_health_monitors(spark, sf_dir, tmp_path):
    """Stage 09: the drift report has rows and the token-length
    percentile estimates from the persisted store are ordered and
    inside the pinned range."""
    from examples.curate_corpus import curate

    counts = curate(
        spark, sf_dir, str(tmp_path / "out"), eval_ids_from=-1
    )
    assert counts["09_drift_report"] == 25
    p50, p90 = counts["09_token_p50_est"], counts["09_token_p90_est"]
    assert 0 < p50 <= p90 < 512
