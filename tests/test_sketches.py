"""Count-min sketch (operators/sketches.py)."""

import os

import pytest
from pyspark.sql import functions as F

from ubw_spark.functions.text import tokens
from ubw_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_pairs,
)


@pytest.fixture(scope="module")
def words(spark, sf_dir):
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return d.where(F.col("lang") == "en").select(
        F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("word")
    )


def test_sketch_size_bounded(words):
    sk = cms_build(words, "word", width=32, depth=3)
    assert sk.count() <= 32 * 3
    # every row of depth i exists for dense-enough streams
    assert sk.select("i").distinct().count() == 3


def test_never_undercounts_and_min_beats_single_row(words):
    tru = words.groupBy("word").agg(F.count(F.lit(1)).alias("t"))
    sk = cms_build(words, "word", width=64, depth=4)
    est = cms_estimate(sk, tru, "word", width=64, depth=4)
    assert est.where(F.col("est") < F.col("t")).count() == 0
    # depth=4 min must be no worse than any single row's estimate:
    # compare against a depth-1 sketch sharing row 0's hash
    sk1 = cms_build(words, "word", width=64, depth=1)
    est1 = cms_estimate(
        sk1, tru.select("word"), "word", width=64, depth=1
    ).withColumnRenamed("est", "est1")
    assert (
        est.join(est1, "word").where(F.col("est") > F.col("est1")).count()
        == 0
    )


def test_shape_mismatch_raises(words):
    import re

    a = cms_build(words, "word", width=32, depth=3)
    b = cms_build(words, "word", width=64, depth=3)
    with pytest.raises(ValueError, match="shape mismatch"):
        cms_merge(a, b)
    with pytest.raises(ValueError, match=re.escape("32x3")):
        cms_estimate(a, words, "word", width=64, depth=3)
    with pytest.raises(ValueError, match="not a cms_build sketch"):
        cms_merge(words.withColumnRenamed("word", "cnt"), a)


def test_merge_equals_whole(words):
    a = words.where(F.col("doc_id") % 2 == 0)
    b = words.where(F.col("doc_id") % 2 == 1)
    merged = cms_merge(
        cms_build(a, "word", width=32, depth=3),
        cms_build(b, "word", width=32, depth=3),
    )
    whole = cms_build(words, "word", width=32, depth=3)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_weight_col_matches_preaggregation(words):
    """Sketching per-doc (word, n) rows with weight_col == sketching
    the raw token stream."""
    per_doc = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("n")
    )
    weighted = cms_build(per_doc, "word", width=32, depth=2, weight_col="n")
    raw = cms_build(words, "word", width=32, depth=2)
    assert weighted.exceptAll(raw).count() == 0
    assert raw.exceptAll(weighted).count() == 0


def test_estimate_probe_side_is_map_only(words, tmp_path, spark):
    """With the sketch materialized (the cross-dump shape), estimation
    plans ZERO exchanges — broadcast lookups only — so it composes into
    map-side pipelines.  Also pins that the (width, depth) metadata
    survives the parquet round-trip."""
    from ubw_spark.plans.inspect import shuffle_count

    cms_build(words, "word", width=32, depth=2).write.parquet(
        str(tmp_path / "sk")
    )
    sk = spark.read.parquet(str(tmp_path / "sk"))
    est = cms_estimate(sk, words, "word", width=32, depth=2)
    assert shuffle_count(est) == 0
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_validation():
    with pytest.raises(ValueError, match="width"):
        cms_pairs(F.lit("x"), 1, 4)
    with pytest.raises(ValueError, match="width"):
        cms_pairs(F.lit("x"), 32, 0)


def test_sketch_queries_green(spark, sf_dir):
    from ubw_spark.queries import REGISTRY

    wf = REGISTRY["sketch_cms_wordfreq"].fn(spark, sf_dir)
    rows = {r["word"]: r for r in wf.collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r["est"] >= r["true_cnt"]
    assert rows["zz_absent_zz"]["true_cnt"] == 0
    audit = REGISTRY["sketch_cms_error_audit"].fn(spark, sf_dir).first()
    assert audit["n_words"] > 0
    assert audit["max_overcount"] >= 0
    assert audit["n_exact"] <= audit["n_words"]


def test_store_lifecycle_append_equals_whole(words, spark, tmp_path):
    """write half → append half == build on everything, cell for cell;
    probing the store matches in-memory estimation."""
    from ubw_spark.operators.sketches import (
        append_cms_batch,
        load_cms,
        probe_cms_store,
        write_cms_store,
    )

    path = str(tmp_path / "cms_store")
    a = words.where(F.col("doc_id") % 2 == 0)
    b = words.where(F.col("doc_id") % 2 == 1)
    write_cms_store(cms_build(a, "word", width=32, depth=3), path)
    append_cms_batch(spark, b, "word", path)
    stored, p = load_cms(spark, path)
    assert (p["width"], p["depth"]) == (32, 3)
    whole = cms_build(words, "word", width=32, depth=3)
    assert stored.exceptAll(whole).count() == 0
    assert whole.exceptAll(stored).count() == 0
    probes = spark.createDataFrame([("table",), ("zzz",)], "word string")
    got = {
        r["word"]: r["est"]
        for r in probe_cms_store(spark, probes, "word", path).collect()
    }
    want = {
        r["word"]: r["est"]
        for r in cms_estimate(
            whole, probes, "word", width=32, depth=3
        ).collect()
    }
    assert got == want
    # two versions live under the manifest (write + append)
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("v")
    ) == ["v00000", "v00001"]


def test_store_missing_sidecar_raises(words, spark, tmp_path):
    from ubw_spark.operators.sketches import probe_cms_store

    bare = str(tmp_path / "not_a_store")
    cms_build(words, "word", width=32, depth=2).write.parquet(bare)
    with pytest.raises(ValueError, match="sidecar"):
        probe_cms_store(spark, words, "word", bare)


def test_heavy_hitters_exact_despite_screen(spark, sf_dir):
    """The two-phase result equals the direct exact computation — the
    screen admits false positives but the re-check removes them, and
    one-sided error means no hot word is ever screened out."""
    from ubw_spark.queries import REGISTRY

    got = {
        (r["word"], r["n"])
        for r in REGISTRY["sketch_heavy_hitters"].fn(spark, sf_dir).collect()
    }
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    direct = {
        (r["word"], r["n"])
        for r in d.where(F.col("lang") == "en")
        .select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 60)
        .collect()
    }
    assert got == direct and len(got) > 0


class TestInnerProduct:
    def test_never_undercounts_and_tight_when_wide(self, spark):
        from ubw_spark.operators.sketches import cms_build, cms_inner_product

        a_items = ["x"] * 3 + ["y"] * 2 + ["z"]
        b_items = ["x"] * 5 + ["z"] * 4 + ["w"] * 7
        a = cms_build(
            spark.createDataFrame([(i,) for i in a_items], "item string"),
            "item", width=1024, depth=4,
        )
        b = cms_build(
            spark.createDataFrame([(i,) for i in b_items], "item string"),
            "item", width=1024, depth=4,
        )
        # exact |A ⋈ B| = 3*5 (x) + 1*4 (z) = 19; 4 items in 1024
        # buckets → no collisions, estimate is exact
        est = cms_inner_product(a, b).collect()[0]["est"]
        assert est == 19

    def test_collisions_only_overcount(self, spark):
        from ubw_spark.operators.sketches import cms_build, cms_inner_product

        items = [(f"k{i}",) for i in range(200) for _ in (0, 1)]
        df = spark.createDataFrame(items, "item string")
        sk = cms_build(df, "item", width=8, depth=2)  # heavy collisions
        est = cms_inner_product(sk, sk).collect()[0]["est"]
        exact = 200 * 4  # each key appears twice → c² = 4
        assert est >= exact

    def test_shape_mismatch_raises(self, spark):
        import pytest as _pytest

        from ubw_spark.operators.sketches import cms_build, cms_inner_product

        df = spark.createDataFrame([("a",)], "item string")
        with _pytest.raises(ValueError, match="shape mismatch"):
            cms_inner_product(
                cms_build(df, "item", width=64, depth=2),
                cms_build(df, "item", width=128, depth=2),
            )

    def test_disjoint_key_sets_give_zero_not_null(self, spark):
        from ubw_spark.operators.sketches import cms_build, cms_inner_product

        a = cms_build(
            spark.createDataFrame([("x",)], "item string"),
            "item", width=1024, depth=4,
        )
        b = cms_build(
            spark.createDataFrame([("y",)], "item string"),
            "item", width=1024, depth=4,
        )
        rows = cms_inner_product(a, b).collect()
        assert len(rows) == 1 and rows[0]["est"] == 0
