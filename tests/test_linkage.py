"""Blocked fuzzy entity linkage (operators/linkage.py)."""

import pytest
from pyspark.sql import functions as F

from ubw_spark.operators.dedup import oversized_buckets
from ubw_spark.operators.linkage import (
    blocked_candidates,
    edit_similarity,
    linkage_score,
)


@pytest.fixture(scope="module")
def catalogs(spark):
    a = spark.createDataFrame(
        [(1, "acme anvil", "B1"), (2, "acme hammer", "B2"),
         (3, "zeta drill", "B1")],
        "id int, name string, brand string",
    ).withColumn("tok0", F.split("name", " ")[0])
    b = spark.createDataFrame(
        [(11, "acme anvill", "B1"), (12, "zeta drll", "B1"),
         (13, "omega saw", "B3")],
        "id int, name string, brand string",
    ).withColumn("tok0", F.split("name", " ")[0])
    return a, b


def test_candidates_only_within_blocks(catalogs):
    a, b = catalogs
    cands = blocked_candidates(a, b, ["tok0"])
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    # acme block: {1,2} x {11}; zeta block: {3} x {12}; omega: no a side
    assert got == {(1, 11), (2, 11), (3, 12)}
    # block col once unsuffixed, the rest suffixed
    assert set(cands.columns) == {
        "tok0", "id_a", "name_a", "brand_a", "id_b", "name_b", "brand_b"
    }


def test_hot_block_cap_drops_and_is_reported(spark):
    hot = spark.createDataFrame(
        [(i, "common widget") for i in range(50)], "id int, name string"
    ).withColumn("tok0", F.split("name", " ")[0])
    cold = spark.createDataFrame(
        [(100, "rare widget")], "id int, name string"
    ).withColumn("tok0", F.lit("rare"))
    side = hot.unionByName(cold)
    capped = blocked_candidates(side, side, ["tok0"], max_block=10)
    # the 50-row block exceeds the cap on both sides -> only the cold
    # block survives (1x1 self pair)
    assert capped.count() == 1
    dropped = oversized_buckets(side, ["tok0"], 10).collect()
    assert [(r["tok0"], r["occupancy"]) for r in dropped] == [
        ("common", 50)
    ]
    # without the cap the hot block pays 50*50 pairs
    assert blocked_candidates(side, side, ["tok0"]).count() == 2501


def test_edit_similarity_bounds(spark):
    df = spark.createDataFrame(
        [("kitten", "kitten"), ("kitten", "sitting"), ("ab", "xy")],
        "x string, y string",
    )
    got = [
        r["s"]
        for r in df.select(
            F.round(edit_similarity(F.col("x"), F.col("y")), 6).alias("s")
        ).collect()
    ]
    assert got[0] == 1.0
    assert got[2] == 0.0
    assert 0.0 < got[1] < 1.0  # lev=3, max len 7 -> 4/7


def test_linkage_score_weights_and_order(spark):
    df = spark.createDataFrame([(1,)], "one int")
    s = linkage_score(
        [(0.6, F.lit(1)), (0.25, F.lit(0)), (0.15, F.lit(1))]
    )
    assert df.select(s.alias("s")).collect()[0]["s"] == 0.75
    with pytest.raises(ValueError, match="at least one rule"):
        linkage_score([])


def test_match_topk_plan_is_take_ordered(spark, sf_dir):
    from ubw_spark.plans import has_take_ordered
    from ubw_spark.plans.inspect import simple_plan
    from ubw_spark.queries import REGISTRY

    df = REGISTRY["linkage_match_topk"].fn(spark, sf_dir)
    assert has_take_ordered(df)
    # r11 scale pin: candidates come from the sorted-neighborhood
    # window, NOT a block self-join — the 3-point sweep caught the
    # block join going 4.6 s -> 43.7 s for a 3x data step (pairs ∝
    # corpus² on a vocab-bounded key); any Join node here is that
    # regression coming back
    assert "Join" not in simple_plan(df)


def test_sorted_neighborhood_window_pairs(spark):
    from ubw_spark.operators.linkage import sorted_neighborhood_pairs

    rows = [
        (1, "blk", "aaa"), (2, "blk", "bbb"), (3, "blk", "ccc"),
        (4, "blk", "ddd"), (5, "other", "zzz"),
    ]
    df = spark.createDataFrame(rows, "id int, blk string, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, ["blk"], "name", window=3
        ).collect()
    }
    # each row pairs with its next <=2 neighbors IN ITS BLOCK only;
    # the singleton block yields nothing
    assert got == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}


def test_sorted_neighborhood_pairs_linear_in_block(spark):
    from ubw_spark.operators.linkage import sorted_neighborhood_pairs

    hot = spark.createDataFrame(
        [(i, "blk", f"n{i:04d}") for i in range(100)],
        "id int, blk string, name string",
    )
    pairs = sorted_neighborhood_pairs(hot, ["blk"], "name", window=4)
    # |block| * (window-1) minus the trimmed tail — never |block|^2
    assert pairs.count() == 100 * 3 - (1 + 2 + 3)
    with pytest.raises(ValueError, match="window >= 2"):
        sorted_neighborhood_pairs(hot, ["blk"], "name", window=1)
