"""Property-based determinism tests for the curation/splits family.

The operators' core promise is that membership depends ONLY on the
data, never on partitioning, row order, or prior runs — the property
that makes splits leak-proof across dataset versions and samples
reproducible across engines.  Hypothesis drives the parameter space;
every case is checked against a differently-partitioned copy of the
same rows.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _docs(spark, n, parts):
    rows = [(i, "g%d" % (i % 4), (i * 37) % 100 + 1) for i in range(n)]
    return spark.createDataFrame(
        rows, "id bigint, grp string, ntok int"
    ).repartition(parts)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cap=st.integers(1, 30),
    parts=st.sampled_from([1, 3, 7]),
    salt=st.sampled_from(["a", "quota", "x9"]),
)
def test_quota_cap_invariants(spark, cap, parts, salt):
    """(1) no group ever exceeds cap; (2) the surviving id set is
    identical under different partitionings (determinism — a window
    tiebreak on partition order would break this)."""
    from ubw_spark.operators.curation import quota_cap

    base = _docs(spark, 60, parts)
    kept = quota_cap(base, "grp", "id", cap, salt=salt)
    per_group = kept.groupBy("grp").count().collect()
    assert all(r["count"] <= cap for r in per_group)
    again = quota_cap(_docs(spark, 60, 5), "grp", "id", cap, salt=salt)
    assert {r["id"] for r in kept.collect()} == {
        r["id"] for r in again.collect()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    budget=st.integers(0, 5000),
    parts=st.sampled_from([1, 4]),
    w=st.floats(0.1, 10.0),
)
def test_token_budget_mix_deterministic_and_bounded(spark, budget, parts, w):
    """Membership is partition-independent; zero budget keeps nothing;
    kept tokens for an over-allocated source never exceed its own total."""
    from ubw_spark.operators.curation import token_budget_mix

    base = _docs(spark, 60, parts)
    kept = token_budget_mix(
        base, "grp", F.col("ntok"), "id", {"g0": w, "g1": w}, budget
    )
    ids = {r["id"] for r in kept.collect()}
    if budget == 0:
        assert ids == set()
    again = token_budget_mix(
        _docs(spark, 60, 2), "grp", F.col("ntok"), "id", {"g0": w, "g1": w}, budget
    )
    assert ids == {r["id"] for r in again.collect()}
    assert all(r["grp"] in ("g0", "g1") for r in kept.collect())


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    frac=st.floats(0.0, 1.0),
    salt=st.sampled_from(["s1", "sample"]),
)
def test_stratified_sample_stable_under_growth(spark, frac, salt):
    """A row's membership never changes when MORE data arrives — the
    anti-leak property versioned datasets rely on."""
    from ubw_spark.operators.splits import stratified_sample

    small = _docs(spark, 40, 2)
    big = _docs(spark, 80, 3)  # superset: ids 0..79 ⊃ 0..39
    kept_small = {
        r["id"]
        for r in stratified_sample(
            small, "grp", "id", {"g0": frac, "g1": frac}, salt=salt
        ).collect()
    }
    kept_big = {
        r["id"]
        for r in stratified_sample(
            big, "grp", "id", {"g0": frac, "g1": frac}, salt=salt
        ).collect()
    }
    assert kept_small == {i for i in kept_big if i < 40}


def test_temperature_weights_limits(spark, sf_dir):
    """alpha=1 reproduces the natural mix, alpha=0 the uniform mix;
    weights always sum to 1."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from ubw_spark.functions.text import tokens
    from ubw_spark.operators.curation import temperature_weights

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tok = F.size(tokens(F.col("text")))
    for alpha in (0.0, 0.5, 1.0):
        w = temperature_weights(d, "source", tok, alpha)
        rows = {r["source"]: r for r in w.collect()}
        assert abs(sum(r["weight"] for r in rows.values()) - 1.0) < 1e-9
        if alpha == 0.0:
            vals = [r["weight"] for r in rows.values()]
            assert max(vals) - min(vals) < 1e-9
        if alpha == 1.0:
            total = sum(r["tokens"] for r in rows.values())
            for r in rows.values():
                assert abs(r["weight"] - r["tokens"] / total) < 1e-9
        # 0 < alpha < 1 sits between: small sources get >= natural share
        if alpha == 0.5:
            total = sum(r["tokens"] for r in rows.values())
            smallest = min(rows.values(), key=lambda r: r["tokens"])
            assert smallest["weight"] >= smallest["tokens"] / total - 1e-9
    with _pytest.raises(ValueError, match="alpha"):
        temperature_weights(d, "source", tok, -0.1)
