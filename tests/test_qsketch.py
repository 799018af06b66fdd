"""Fixed-bin quantile histogram (operators/qsketch.py)."""

import pytest

from ubw_spark.operators.qsketch import (
    append_hist_batch,
    hist_build,
    hist_merge,
    hist_quantiles,
    load_hist,
    probe_hist_quantiles,
    read_hist_params,
    write_hist_store,
)


@pytest.fixture(scope="module")
def vals(spark):
    # 100 values 0..99 over range [0,100) x 10 bins → 10 per bin
    return spark.createDataFrame([(i,) for i in range(100)], "v long")


def _cells(df, **kw):
    kw.setdefault("lo", 0)
    kw.setdefault("hi", 100)
    kw.setdefault("nbins", 10)
    return hist_build(df, "v", **kw)


def test_build_uniform_cells(spark, vals):
    out = {r["bin"]: r["cnt"] for r in _cells(vals).collect()}
    assert out == {b: 10 for b in range(10)}


def test_out_of_range_clamps_into_edge_bins(spark):
    df = spark.createDataFrame([(-5,), (0,), (99,), (100,), (1000,)], "v long")
    out = {r["bin"]: r["cnt"] for r in _cells(df).collect()}
    assert out == {0: 2, 9: 3}  # -5 clamps low; 100 and 1000 clamp high


def test_nulls_filtered(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "v long")
    assert sum(r["cnt"] for r in _cells(df).collect()) == 2


def test_merge_equals_build_on_union(spark, vals):
    a = vals.where("v % 2 = 0")
    b = vals.where("v % 2 = 1")
    merged = {
        r["bin"]: r["cnt"]
        for r in hist_merge(_cells(a), _cells(b)).collect()
    }
    full = {r["bin"]: r["cnt"] for r in _cells(vals).collect()}
    assert merged == full


def test_merge_shape_mismatch_raises(spark, vals):
    with pytest.raises(ValueError, match="shape mismatch"):
        hist_merge(_cells(vals), _cells(vals, nbins=20))


def test_quantiles_exact_on_uniform(spark, vals):
    # uniform 0..99: cum through bin b is 10(b+1); target q·100
    # → p50: bin 4, frac (50-40)/10 = 1.0 → est = (4+1)*10 = 50
    est = {
        r["q_milli"]: r["est"]
        for r in hist_quantiles(_cells(vals), [500, 900, 100]).collect()
    }
    assert est[500] == pytest.approx(50.0)
    assert est[900] == pytest.approx(90.0)
    assert est[100] == pytest.approx(10.0)


def test_quantile_error_under_one_bin_width(spark):
    import random

    rnd = random.Random(7)
    data = [rnd.randrange(0, 10_000) for _ in range(5_000)]
    df = spark.createDataFrame([(v,) for v in data], "v long")
    cells = hist_build(df, "v", lo=0, hi=10_000, nbins=100)
    est = {
        r["q_milli"]: r["est"]
        for r in hist_quantiles(cells, [500, 990]).collect()
    }
    width = 10_000 / 100
    s = sorted(data)
    for q_milli in (500, 990):
        exact = s[int(q_milli / 1000 * len(s)) - 1]
        assert abs(est[q_milli] - exact) < 2 * width


def test_quantiles_rejects_bad_q(spark, vals):
    with pytest.raises(ValueError):
        hist_quantiles(_cells(vals), [0])
    with pytest.raises(ValueError):
        hist_quantiles(_cells(vals), [1001])


def test_store_lifecycle_matches_in_memory(spark, tmp_path, vals):
    path = str(tmp_path / "qh")
    a = vals.where("v < 50")
    b = vals.where("v >= 50")
    write_hist_store(_cells(a), path)
    append_hist_batch(spark, b, "v", path)
    got = {
        r["q_milli"]: r["est"]
        for r in probe_hist_quantiles(spark, path, [500, 900]).collect()
    }
    want = {
        r["q_milli"]: r["est"]
        for r in hist_quantiles(_cells(vals), [500, 900]).collect()
    }
    assert got == want
    cells, p = load_hist(spark, path)
    assert (p["lo"], p["hi"], p["nbins"]) == (0, 100, 10)
    assert sum(r["cnt"] for r in cells.collect()) == 100


def test_store_replayed_batch_is_noop(spark, tmp_path, vals):
    path = str(tmp_path / "qh")
    write_hist_store(_cells(vals.where("v < 50")), path)
    batch = vals.where("v >= 50")
    append_hist_batch(spark, batch, "v", path, batch_id=1)
    append_hist_batch(spark, batch, "v", path, batch_id=1)  # replay
    cells, p = load_hist(spark, path)
    assert sum(r["cnt"] for r in cells.collect()) == 100  # not 150
    assert p["last_batch_id"] == 1


def test_grouped_quantiles_match_per_group_global(spark):
    """Each group's estimate from the grouped path equals running the
    global path on that group's rows alone."""
    from ubw_spark.operators.qsketch import (
        grouped_hist_build,
        grouped_hist_quantiles,
    )

    rows = [("a", v) for v in range(100)] + [("b", v) for v in range(0, 1000, 10)]
    df = spark.createDataFrame(rows, "g string, v long")
    cells = grouped_hist_build(df, ["g"], "v", lo=0, hi=1000, nbins=50)
    grouped = {
        (r["g"], r["q_milli"]): r["est"]
        for r in grouped_hist_quantiles(cells, ["g"], [500, 900]).collect()
    }
    for g in ("a", "b"):
        solo = hist_build(
            df.where(f"g = '{g}'"), "v", lo=0, hi=1000, nbins=50
        )
        want = {
            r["q_milli"]: r["est"]
            for r in hist_quantiles(solo, [500, 900]).collect()
        }
        assert grouped[(g, 500)] == want[500]
        assert grouped[(g, 900)] == want[900]


def test_grouped_cells_bounded_per_group(spark):
    from ubw_spark.operators.qsketch import grouped_hist_build

    rows = [("a", v) for v in range(1000)]
    df = spark.createDataFrame(rows, "g string, v long")
    cells = grouped_hist_build(df, ["g"], "v", lo=0, hi=1000, nbins=10)
    assert cells.count() == 10


def test_grouped_quantiles_keep_null_group_segment(spark):
    from ubw_spark.operators.qsketch import (
        grouped_hist_build,
        grouped_hist_quantiles,
    )

    rows = [("a", v) for v in range(20)] + [(None, v) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v long")
    cells = grouped_hist_build(df, ["g"], "v", lo=0, hi=20, nbins=10)
    out = {
        (r["g"], r["q_milli"]): r
        for r in grouped_hist_quantiles(cells, ["g"], [500]).collect()
    }
    assert ("a", 500) in out and (None, 500) in out
    assert out[(None, 500)]["n"] == 10


def test_store_rejects_grouped_cells(spark, tmp_path):
    from ubw_spark.operators.qsketch import (
        grouped_hist_build,
        write_hist_store,
    )

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    cells = grouped_hist_build(df, ["g"], "v", lo=0, hi=10, nbins=5)
    with pytest.raises(ValueError, match="grouped"):
        write_hist_store(cells, str(tmp_path / "qh"))


def test_ungrouped_error_names_public_api(spark):
    from ubw_spark.operators.qsketch import hist_quantiles

    df = spark.createDataFrame([(1, 2)], "bin int, cnt long")  # no metadata
    with pytest.raises(ValueError, match="hist_quantiles:"):
        hist_quantiles(df, [500])


def test_winsorized_mean_clamps_tail(spark):
    from ubw_spark.operators.qsketch import hist_build, winsorized_mean

    # 99 values of 10 and one huge outlier
    vals = [10] * 99 + [10_000]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    cells = hist_build(df, "v", lo=0, hi=100, nbins=10)
    r = winsorized_mean(df, "v", cells, q_milli=990).collect()[0]
    assert r["n"] == 100 and r["clipped"] == 1
    # outlier clamps to the p99 cut (inside [0,100)); the winsorized
    # mean collapses toward 10 while the raw mean is ~109.9
    assert r["mean_raw"] == pytest.approx(109.9)
    assert r["mean_winsorized"] < 12


def test_hist_merge_rejects_grouped_cells(spark):
    """ADVICE r8: hist_merge's groupBy('bin') would silently collapse a
    grouped_hist_build result's segments into one histogram — inputs
    that are not exactly (bin, cnt) must raise."""
    from ubw_spark.operators.qsketch import grouped_hist_build

    rows = [("a", 1), ("a", 5), ("b", 9)]
    df = spark.createDataFrame(rows, "seg string, v int")
    g = grouped_hist_build(df, ["seg"], "v", lo=0, hi=10, nbins=4)
    flat = _cells(spark.createDataFrame(rows, "seg string, v int")
                  .selectExpr("v as v"))
    with pytest.raises(ValueError, match="exactly columns"):
        hist_merge(g, g)
    with pytest.raises(ValueError, match="exactly columns"):
        hist_merge(flat, g)
