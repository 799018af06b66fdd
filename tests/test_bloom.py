"""Bloom-filter decontamination: membership semantics, the
no-false-negative guarantee, and the zero-shuffle probe plan."""

import pytest
from pyspark.sql import functions as F

from ubw_spark.operators.bloom import (
    bloom_audit,
    bloom_positions,
    bloom_probe,
    build_bloom,
)
from ubw_spark.plans import simple_plan


@pytest.fixture(scope="module")
def corpora(spark):
    bench = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        "id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # doc 10 contains a verbatim benchmark span -> real hits
            (10, "prefix words the quick brown fox jumps here"),
            # doc 11 shares no 3-gram with the benchmark
            (11, "completely unrelated material about spark plans"),
            # doc 12 too short for a 3-gram -> dropped from output
            (12, "two words"),
            (13, "pack my box with five dozen liquor jugs exactly"),
        ],
        "id bigint, text string",
    )
    return bench, corpus


def test_probe_counts_and_short_doc_drop(spark, corpora):
    bench, corpus = corpora
    bloom = build_bloom(bench, "text")
    out = {
        r["id"]: (r["total_grams"], r["hit_grams"])
        for r in bloom_probe(corpus, "id", "text", bloom).collect()
    }
    # doc 12 has 2 tokens -> no grams -> absent
    assert set(out) == {10, 11, 13}
    # doc 10: grams 3..6 of 6 are benchmark grams ("the quick brown",
    # "quick brown fox", "brown fox jumps")
    assert out[10][0] == 6
    assert out[10][1] >= 3
    # doc 13: all 7 benchmark grams of the sentence + "liquor jugs exactly"
    assert out[13][0] == 7
    assert out[13][1] >= 6


def test_no_false_negatives(spark, corpora):
    """Every gram exactly present in the benchmark MUST be bloom-hit —
    the audit's exact_hits are a subset of bloom_hits, and
    false_positives is exactly bloom_hits - true-positive count."""
    bench, corpus = corpora
    row = bloom_audit(corpus, bench, "text").collect()[0]
    assert row["bloom_hits"] >= row["exact_hits"]
    assert row["false_positives"] == row["bloom_hits"] - row["exact_hits"]
    # and on this tiny vocabulary the filter is exact
    assert row["exact_hits"] > 0


def test_positions_deterministic_and_in_range(spark):
    df = spark.createDataFrame([("alpha beta gamma",)], "g string")
    rows = df.select(
        bloom_positions(F.col("g"), m=1 << 10, k=4).alias("p")
    ).collect()
    p = rows[0]["p"]
    assert len(p) == 4
    assert all(0 <= x < (1 << 10) for x in p)
    # same input -> same positions (pure function of the md5)
    assert p == df.select(
        bloom_positions(F.col("g"), m=1 << 10, k=4).alias("p")
    ).collect()[0]["p"]


def test_build_rejects_unaligned_m(spark, corpora):
    bench, _ = corpora
    with pytest.raises(ValueError):
        build_bloom(bench, "text", m=100)


def test_probe_plan_is_shuffle_free(spark, corpora):
    """The at-scale posture: with parallelism=None the probe side has NO
    Exchange — the corpus streams map-only through the broadcast
    nested-loop join against the one-row packed filter.  (The build side
    below the broadcast keeps its own bounded exchanges.)"""
    bench, corpus = corpora
    bloom = build_bloom(bench, "text")
    plan = simple_plan(bloom_probe(corpus, "id", "text", bloom))
    above, _, below = plan.partition("BroadcastExchange")
    assert "Exchange" not in above
    assert "BroadcastNestedLoopJoin" in above
