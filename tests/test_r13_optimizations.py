"""Focused tests for the round-13 optimization internals.

Each test pins an equivalence the optimization relies on: the fast
path must produce exactly what the slow path produced, or the change
is a rewrite, not an optimization.
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# literal_frame: JVM-literal construction == createDataFrame, no Python scan


def test_literal_frame_matches_createdataframe_values(spark):
    from ubw_spark.functions.literals import literal_frame

    schema = (
        "a bigint, b int, c double, d string, e boolean, "
        "f timestamp, g date, h array<double>, i float"
    )
    rows = [
        (
            1, 2, 0.1, "plain", True,
            datetime.datetime(2024, 5, 5, 6, 7, 8),
            datetime.date(2024, 5, 5), [1.5, -2.25], 0.5,
        ),
        (
            -9, None, 1e-05, "quo'te\\back\nline", False,
            datetime.datetime(2031, 1, 2, 3, 4, 5),
            datetime.date(2031, 1, 2), [], None,
        ),
        (None, 0, None, None, None, None, None, None, 3.25),
    ]
    fast = literal_frame(spark, rows, schema)
    slow = spark.createDataFrame(rows, schema)
    assert fast.schema == slow.schema
    assert sorted(map(repr, fast.collect())) == sorted(
        map(repr, slow.collect())
    )


def test_literal_frame_plans_without_python_scan(spark):
    from ubw_spark.functions.literals import literal_frame
    from ubw_spark.plans import formatted_plan

    df = literal_frame(spark, [(1, "x")], "k bigint, v string")
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan
    assert "Scan ExistingRDD" not in plan


def test_literal_frame_falls_back_for_unsupported(spark):
    from ubw_spark.functions.literals import literal_frame

    # map type has no literal rendering → createDataFrame fallback
    df = literal_frame(
        spark, [({"a": 1},)], "m map<string,int>"
    )
    assert df.collect()[0]["m"] == {"a": 1}
    # empty rows keep the schema
    empty = literal_frame(spark, [], "k bigint")
    assert empty.count() == 0 and empty.columns == ["k"]


# ---------------------------------------------------------------------------
# hll_rho: generated-SQL rank == the definition (1 + #{j: w < 2^(32-j)})


def test_hll_rho_expr_matches_definition(spark):
    import hashlib

    from ubw_spark.operators.hll import hll_rho

    items = ["a", "b", "hello world", "", "7", "zzz"]
    df = spark.createDataFrame([(s,) for s in items], "item string")
    got = {
        r["item"]: r["rho"]
        for r in df.select(
            "item", hll_rho(F.col("item")).alias("rho")
        ).collect()
    }
    for s in items:
        w = int(hashlib.md5(f"hll:r:{s}".encode()).hexdigest()[:8], 16)
        expected = 1 + sum(1 for j in range(1, 33) if w < (1 << (32 - j)))
        assert got[s] == expected, (s, w)


# ---------------------------------------------------------------------------
# minhash generated-SQL builders: equal to the Column-composed forms


def test_minhash_signature_expr_matches_python(spark):
    import hashlib

    from ubw_spark.operators.dedup import (
        MERSENNE_P,
        _hash_params,
        minhash_signature,
        portable_hash,
    )

    df = spark.createDataFrame(
        [(["x y z", "y z w"],), (["solo gram here"],)], "sh array<string>"
    )
    hashed = df.select(
        F.transform("sh", portable_hash).alias("__hv"), "sh"
    )
    rows = hashed.select(
        minhash_signature("__hv", 8).alias("sig"), "sh"
    ).collect()
    for r in rows:
        hvs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            for g in r["sh"]
        ]
        for i in range(8):
            a, b = _hash_params(i)
            assert r["sig"][i] == min((a * h + b) % MERSENNE_P for h in hvs)


def test_minhash_agreement_expr_counts(spark):
    from ubw_spark.operators.dedup import minhash_agreement

    df = spark.createDataFrame(
        [([1, 2, 3, 4], [1, 9, 3, 7])], "a array<bigint>, b array<bigint>"
    )
    n = df.select(
        minhash_agreement(F.col("a"), F.col("b"), 4).alias("n")
    ).collect()[0]["n"]
    assert n == 2


# ---------------------------------------------------------------------------
# minhash_frames: materialized and full-lineage paths agree exactly


def test_minhash_pairs_materialized_equals_unmaterialized(spark, sf_dir):
    from ubw_spark.operators.dedup import minhash_dedup_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kw = dict(k=3, num_hashes=64, bands=32, rows_per_band=2, threshold=0.4)
    mat = sorted(
        map(tuple, minhash_dedup_pairs(d, "doc_id", "text", **kw).collect())
    )
    unmat = sorted(
        map(
            tuple,
            minhash_dedup_pairs(
                d, "doc_id", "text", checkpoint=None, **kw
            ).collect(),
        )
    )
    assert mat == unmat and len(mat) > 0


# ---------------------------------------------------------------------------
# Observation-based term-index stats == the two-pass _corpus_stats


def test_doc_postings_observation_matches_corpus_stats(spark):
    from pyspark.sql import Observation

    from ubw_spark.operators.retrieval import _corpus_stats, doc_postings

    # includes a whitespace-only doc (trims to "" which the shared
    # tokenizer splits to [""] — ONE empty token, counted in stats)
    # and a NULL-text doc (excluded everywhere)
    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "   "), (3, None), (4, "gamma")],
        "doc_id bigint, text string",
    )
    obs = Observation()
    postings = doc_postings(df, "doc_id", "text", stats_observation=obs)
    postings.write.format("noop").mode("overwrite").save()
    got = obs.get
    want = _corpus_stats(df, "text").collect()[0]
    assert got["n_docs"] == want["n_docs"] == 3
    assert got["total_tokens"] == want["total_tokens"] == 5


# ---------------------------------------------------------------------------
# stream_shuffle_partitions: env override wins, default is bounded


def test_stream_shuffle_partitions(spark, monkeypatch):
    from ubw_spark.streaming.stages import (
        shuffle_partitions_override,
        stream_shuffle_partitions,
    )

    monkeypatch.delenv("SPARK_GRAFT_STREAM_PARTITIONS", raising=False)
    n = stream_shuffle_partitions(spark)
    assert 1 <= n <= 4
    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", "13")
    assert stream_shuffle_partitions(spark) == 13
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with shuffle_partitions_override(spark, 3):
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == before


# ---------------------------------------------------------------------------
# table() memo: same lazy plan per (session, dir, name); UTC guard
# re-fires on memo HITS for NTZ-normalized events


def test_table_memo_returns_same_plan_per_key(spark, tmp_path):
    from ubw_spark.queries.registry import table

    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (p1, p2):
        spark.range(3).toDF("k").write.parquet(f"{p}/t.parquet")
    d1 = table(spark, p1, "t")
    assert table(spark, p1, "t") is d1  # memo hit: identical object
    assert table(spark, p2, "t") is not d1  # different dir, own plan
    # the memo holds a PLAN, not results: actions still read the files
    assert d1.count() == 3


def test_table_memo_utc_guard_fires_on_hits(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ubw_spark.queries.registry import table

    # an NTZ-encoded events table (timestamp[us], no timezone)
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, 12, 0, 0)],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = table(spark, str(tmp_path), "events")
        assert table(spark, str(tmp_path), "events") is df  # memoized
        # a later zone change must fail the HIT, not serve the plan
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(AssertionError, match="UTC"):
            table(spark, str(tmp_path), "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


# ---------------------------------------------------------------------------
# rolling_zscore: one Window node (single pass), pinned key exchange


def test_rolling_zscore_single_window_pinned_exchange(spark):
    from ubw_spark.operators.anomaly import rolling_zscore

    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.col("id").alias("t"),
        (F.col("id") % 17).alias("v"),
    )
    out = rolling_zscore(
        df, ["k"], ["t"], "v", window=4, min_periods=2, parallelism=8
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # all three sufficient statistics ride ONE Window operator
    assert plan.count("Window (") == 1, plan
    # the key exchange is user-pinned (AQE must not coalesce it away)
    assert "REPARTITION_BY_NUM" in plan, plan


# ---------------------------------------------------------------------------
# doc_postings_local: shuffle-free postings == exploded postings


def test_doc_postings_local_matches_exploded_form(spark):
    from ubw_spark.operators.retrieval import doc_postings, doc_postings_local

    rows = [
        (1, "the quick brown fox the the"),
        (2, ""),            # "" tokenizes to one empty token
        (3, None),          # NULL text: dropped by both forms
        (4, "a a a a a"),   # single repeated term
        (5, "  spaced   out   words "),
        (6, "dup dup nodup"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = doc_postings(df, "doc_id", "text")
    b = doc_postings_local(df, "doc_id", "text")
    assert a.columns == b.columns
    assert [f.dataType.simpleString() for f in a.schema.fields] == [
        f.dataType.simpleString() for f in b.schema.fields
    ]
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bucketed_postings_single_exchange_and_fenced_kernel(spark):
    """The store-write frame has ONE exchange (the bucket repartition)
    and the sort+run-length kernel is fenced: the explode's inferred
    size() predicate must not re-run it at the scan."""
    from pyspark.sql import functions as F

    from ubw_spark.operators.retrieval import _bucketed_postings

    df = spark.createDataFrame(
        [(1, "x y x"), (2, "z")], "doc_id int, text string"
    )
    frame = _bucketed_postings(df, "doc_id", "text", 32).repartition("tb")
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("array_sort") == 1, plan
