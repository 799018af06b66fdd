"""PCA: sql-vs-numpy covariance parity, eigendecomposition pinned
against a full-data numpy reference, and the map-only projection."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ubw_spark.operators.pca import (
    covariance_matrix,
    pca_fit,
    pca_project,
)

D = 8
N = 200


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(42)
    # anisotropic: a few dominant directions so top-r is well-separated
    scales = np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.3, 0.2, 0.1])
    x = rng.normal(size=(N, D)) * scales + rng.normal(size=D)
    rows = [(i, [float(v) for v in x[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    # float32 round-trip so the reference sees EXACTLY what Spark sees
    return df, np.asarray(x, dtype="float32").astype("float64")


def ref_cov(x):
    n = len(x)
    return (x.T @ x) / n - np.outer(x.sum(0) / n, x.sum(0) / n)


@pytest.mark.parametrize("method", ["sql", "numpy"])
def test_covariance_matches_numpy(spark, emb_df, method):
    df, x = emb_df
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df, "embedding", method=method).collect()
    }
    want = ref_cov(x)
    assert len(got) == D * (D + 1) // 2
    for (i, j), c in got.items():
        assert c == pytest.approx(round(want[i, j], 6), abs=2e-6)


def test_sql_and_numpy_paths_agree(spark, emb_df):
    df, _ = emb_df
    a = sorted(
        tuple(r) for r in
        covariance_matrix(df.repartition(5), "embedding", method="numpy")
        .collect()
    )
    b = sorted(
        tuple(r) for r in
        covariance_matrix(df, "embedding", method="sql").collect()
    )
    # same 6dp rounding on both paths; partition count must not matter
    assert [(i, j) for i, j, _ in a] == [(i, j) for i, j, _ in b]
    for (_, _, ca), (_, _, cb) in zip(a, b):
        assert ca == pytest.approx(cb, abs=2e-6)


def test_fit_matches_full_data_eigh(spark, emb_df):
    df, x = emb_df
    model = pca_fit(df, "embedding", r=3)
    w, v = np.linalg.eigh(ref_cov(x))
    order = np.argsort(w)[::-1][:3]
    want_vals = w[order]
    assert np.allclose(model["eigvals"], want_vals, rtol=1e-3, atol=1e-4)
    # eigenvectors match up to sign; canonicalize the reference the
    # same way (largest-|component| positive) and compare directly
    for k, comp in enumerate(np.array(model["components"])):
        refv = v[:, order[k]]
        refv = refv * np.sign(refv[np.abs(refv).argmax()])
        assert np.allclose(comp, refv, atol=1e-3)
    assert np.allclose(model["mean"], x.mean(0), atol=1e-5)


def test_projection_matches_numpy_and_is_map_only(spark, emb_df):
    df, x = emb_df
    model = pca_fit(df, "embedding", r=3)
    out = pca_project(df, "embedding", model)
    got = {
        r["vec_id"]: np.array(r["pc"])
        for r in out.collect()
    }
    wmat = np.array(model["components"])
    want = (x - np.array(model["mean"])) @ wmat.T
    for i in range(N):
        assert np.allclose(got[i], want[i], atol=1e-4)
    # map-only: no Exchange anywhere in the projection plan
    from ubw_spark.plans import shuffle_count

    assert shuffle_count(out) == 0


def test_projected_variance_equals_eigvals(spark, emb_df):
    df, x = emb_df
    model = pca_fit(df, "embedding", r=2)
    out = pca_project(df, "embedding", model)
    pcs = np.array(
        [r["pc"] for r in out.select("pc").collect()]
    )
    # the fitted eigenvalues ARE the variances along the components
    assert np.allclose(
        pcs.var(axis=0), model["eigvals"], rtol=5e-3, atol=1e-3
    )
    # top-1 dominates: the planted scale hierarchy survives the fit
    assert model["eigvals"][0] > model["eigvals"][1] > 0


def test_pca_reduction_preserves_neighbors(spark, emb_df):
    """Composition with the ANN family: brute-force top-k in the
    PCA-reduced space (r=4 of 8 dims on data whose energy is planted
    in the top directions) must recover most full-space neighbors —
    the dim-reduction-before-ANN pipeline (FAISS PCAR) end to end."""
    from ubw_spark.operators.similarity import brute_force_topk

    df, _ = emb_df
    model = pca_fit(df, "embedding", r=4)
    reduced = pca_project(df, "embedding", model).select(
        "vec_id", F.col("pc").cast("array<float>").alias("embedding")
    )
    queries = df.where(F.col("vec_id") < 5)
    red_queries = reduced.where(F.col("vec_id") < 5)
    full = brute_force_topk(df, queries, k=10)
    red = brute_force_topk(reduced, red_queries, k=10)
    fullnb = {}
    for r in full.collect():
        fullnb.setdefault(r[0], set()).add(r[1])
    hits = total = 0
    for r in red.collect():
        total += 1
        hits += r[1] in fullnb[r[0]]
    assert total == 50
    assert hits / total >= 0.6, hits / total


def test_moments_store_incremental_fit(spark, emb_df, tmp_path):
    """The moments store: raw moments are sums, so append-then-fit must
    equal fit-from-scratch (the exact-merge property no covariance or
    eigenvector store could offer).  Fit happens from the store alone —
    no corpus access."""
    from ubw_spark.operators.pca import (
        append_moments_batch,
        pca_fit_from_store,
        write_moments_store,
    )
    from ubw_spark.operators.versioned import current_version

    df, _ = emb_df
    path = str(tmp_path / "moments")
    first = df.where(F.col("vec_id") < 100)
    rest = df.where(F.col("vec_id") >= 100)
    write_moments_store(first, "embedding", path)
    assert current_version(path) == 0
    append_moments_batch(rest, "embedding", path)
    got = pca_fit_from_store(spark, path, r=3)
    want = pca_fit(df, "embedding", r=3)
    assert np.allclose(got["eigvals"], want["eigvals"], rtol=1e-9)
    assert np.allclose(got["mean"], want["mean"], atol=1e-10)
    assert np.allclose(
        got["components"], want["components"], atol=1e-7
    )


def test_moments_append_replay_idempotent(spark, emb_df, tmp_path):
    """ADVICE r8: append_moments_batch runs the rewrite cycle and a
    replayed batch_id is a no-op — ADD-merged moments would otherwise
    double-count under at-least-once delivery."""
    from ubw_spark.operators.pca import (
        append_moments_batch,
        pca_fit_from_store,
        write_moments_store,
    )
    from ubw_spark.operators.versioned import current_version

    df, _ = emb_df
    path = str(tmp_path / "moments_r")
    first = df.where(F.col("vec_id") < 100)
    rest = df.where(F.col("vec_id") >= 100)
    write_moments_store(first, "embedding", path)
    append_moments_batch(rest, "embedding", path, batch_id=1)
    assert current_version(path) == 1
    want = pca_fit_from_store(spark, path, r=3)
    append_moments_batch(rest, "embedding", path, batch_id=1)  # replay
    assert current_version(path) == 1  # no-op
    got = pca_fit_from_store(spark, path, r=3)
    assert np.allclose(got["eigvals"], want["eigvals"], rtol=0)
    assert np.allclose(got["mean"], want["mean"], atol=0)


def test_pca_fit_rejects_r_above_dimension(spark, emb_df):
    """ADVICE r8: r > d must raise a clear ValueError, not an opaque
    IndexError from the sign-canonicalization."""
    df, _ = emb_df
    with pytest.raises(ValueError, match="r must be <= d"):
        pca_fit(df.limit(20), "embedding", r=D + 1)
