"""Source/sink contract tests: JDBC round trip (S6) against the
embedded Derby that ships in pyspark's jars — a real JDBC driver, real
SQL database, no network.  At scale the same helpers point at a server
DB with the 4 partitioning options (see read_jdbc docstring)."""

import pytest
from pyspark.sql import functions as F

from ubw_spark.sources.readers import read_jdbc
from ubw_spark.sources.writers import write_jdbc

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark):
    if not _derby_available(spark):
        pytest.skip(f"no Derby JDBC driver on the Spark classpath ({DERBY_DRIVER})")
    return "jdbc:derby:memory:ubwtest;create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "alpha", 10.5), (2, "beta", None), (3, "gamma", -1.0)],
        "id bigint, name string, score double",
    )
    write_jdbc(df, derby_url, "roundtrip", mode="overwrite", driver=DERBY_DRIVER)
    back = read_jdbc(spark, derby_url, "roundtrip", driver=DERBY_DRIVER)
    got = sorted((r["id"], r["name"], r["score"]) for r in back.collect())
    assert got == [(1, "alpha", 10.5), (2, "beta", None), (3, "gamma", -1.0)]


def test_jdbc_pushdown_subquery(spark, derby_url):
    """dbtable can be a pushdown subquery — the filter runs IN the
    database, which at scale is the difference between shipping a table
    and shipping a result."""
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id bigint, bucket bigint"
    )
    write_jdbc(df, derby_url, "pushq", mode="overwrite", driver=DERBY_DRIVER)
    # Spark created the table with quoted (lowercase) identifiers, and
    # Derby upcases unquoted ones — so the subquery must quote them too
    sub = '(SELECT "id" FROM pushq WHERE "bucket" = 0) t'
    back = read_jdbc(spark, derby_url, sub, driver=DERBY_DRIVER)
    assert back.count() == 10
    assert all(r["id"] % 3 == 0 for r in back.collect())


def test_jdbc_partitioned_read(spark, derby_url):
    """The 4 partitioning options split the scan into parallel
    range-bounded queries — verify the partition count and that no rows
    are lost or duplicated at the range boundaries."""
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    write_jdbc(df, derby_url, "parts", mode="overwrite", driver=DERBY_DRIVER)
    back = read_jdbc(
        spark, derby_url, "parts", driver=DERBY_DRIVER,
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(100))


# --- lakehouse-gated MERGE (S7) ------------------------------------------


def test_merge_upsert_parquet_emulation(spark, tmp_path):
    """Without a lakehouse format the MERGE falls back to anti-join +
    union + overwrite — and must materialize before overwriting the
    files it reads (the read-own-input pitfall)."""
    from ubw_spark.sources.writers import merge_upsert

    path = str(tmp_path / "tgt")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id bigint, v string"
    ).write.parquet(path)
    updates = spark.createDataFrame([(2, "B!"), (9, "new")], "id bigint, v string")
    merge_upsert(spark, path, updates, ["id"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B!", 3: "c", 9: "new"}
    # idempotent: applying the same updates again changes nothing
    merge_upsert(spark, path, updates, ["id"])
    assert {r["id"]: r["v"] for r in spark.read.parquet(path).collect()} == got


def test_merge_upsert_validates_keys(spark, tmp_path):
    from ubw_spark.sources.writers import merge_upsert

    path = str(tmp_path / "tgt2")
    spark.createDataFrame([(1, "a")], "id bigint, v string").write.parquet(path)
    updates = spark.createDataFrame([(1, "x")], "id bigint, v string")
    with pytest.raises(ValueError, match="not in updates"):
        merge_upsert(spark, path, updates, ["nope"])


def test_merge_upsert_delta_branch(spark, tmp_path):
    """Runs only where delta-spark is installed (skipped in this
    container): native transactional MERGE INTO."""
    pytest.importorskip("delta")
    from ubw_spark.sources.writers import merge_upsert

    path = str(tmp_path / "dtgt")
    spark.createDataFrame([(1, "a")], "id bigint, v string").write.format(
        "delta"
    ).save(path)
    updates = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, v string")
    merge_upsert(spark, path, updates, ["id"], fmt="delta")
    got = {r["id"]: r["v"] for r in spark.read.format("delta").load(path).collect()}
    assert got == {1: "x", 2: "y"}


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """read_dir's orc path, executed: round-trip preserves values and a
    filter reaches the ORC scan as a pushed filter (ORC supports
    predicate pushdown like parquet)."""
    from ubw_spark.sources.readers import read_dir

    src = spark.read.parquet(f"{sf_dir}/customer.parquet")
    path = str(tmp_path / "cust_orc")
    src.write.mode("overwrite").orc(path)
    back = read_dir(spark, path, fmt="orc")
    assert back.count() == src.count()
    assert sorted(map(str, back.collect())) == sorted(map(str, src.collect()))
    plan = (
        back.where(F.col("c_acctbal") > 1000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "c_acctbal" in plan


def test_orc_partitioned_write_prunes_directories(spark, sf_dir):
    """source_orc_roundtrip's scale property: the o_orderstatus filter
    is a PARTITION filter on the partitioned ORC layout — pruned at
    file-listing time, so non-matching directories are never opened
    (at 100 TB that is metadata work, not a scan)."""
    from ubw_spark.queries import REGISTRY

    import re

    df = REGISTRY["source_orc_roundtrip"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the status predicate must appear among PARTITION filters, and the
    # data/pushed-filter lists must NOT carry it (that would mean a
    # post-listing row-level evaluation of a directory-level predicate).
    # Each filter list renders as its own bracketed group, so match
    # inside the brackets specifically — the whole FileScan line also
    # contains the other lists.
    def bracket(kind: str) -> str:
        m = re.search(kind + r":\s*\[([^\]]*)\]", plan)
        return m.group(1) if m else ""

    assert "o_orderstatus" in bracket("PartitionFilters")
    assert "o_orderstatus" not in bracket("DataFilters")
    assert "o_orderstatus" not in bracket("PushedFilters")


def test_json_roundtrip_schema_and_nesting(spark, sf_dir):
    """source_json_roundtrip reads back under the writer's schema (no
    inference pass) and the nested attrs struct survives the text
    boundary with its field types."""
    from ubw_spark.queries import REGISTRY

    df = REGISTRY["source_json_roundtrip"].fn(spark, sf_dir)
    assert df.schema.simpleString() == (
        "struct<p_partkey:bigint,p_name:string,brand:string,"
        "size:int,price:double>"
    )
    src = spark.read.parquet(f"{sf_dir}/part.parquet")
    assert df.count() == src.count()


def test_tmp_artifact_cleanup_removes_dirs_and_files(tmp_path):
    """The app-id-salted /tmp artifacts are reclaimed at interpreter
    exit — cleanup_artifacts must handle both dirs (CSV) and files
    (xlsx) and ignore already-gone paths.  The registry is the SHARED
    helper (ubw_spark.artifacts) all staging query modules use —
    sources_q/events/retrieval_q must register there, not in private
    module globals."""
    from ubw_spark.artifacts import (
        ARTIFACTS,
        cleanup_artifacts,
        register_artifact,
    )

    d = tmp_path / "csvdir"
    d.mkdir()
    (d / "part-000.csv").write_text("a,b\n1,2\n")
    f = tmp_path / "report.xlsx"
    f.write_bytes(b"PK\x03\x04")
    gone = tmp_path / "never-created"
    before = set(ARTIFACTS)
    for p in (d, f, gone):
        assert register_artifact(str(p)) == str(p)
    try:
        cleanup_artifacts()
        assert not d.exists() and not f.exists()
    finally:
        ARTIFACTS.clear()
        ARTIFACTS.update(before)


def test_no_private_artifact_reach_in():
    """VERDICT r12 #6: no query module may import another module's
    private artifact global — the shared registry is ubw_spark.artifacts."""
    import pathlib

    qdir = pathlib.Path(__file__).resolve().parents[1] / "ubw_spark"
    offenders = [
        str(p)
        for p in qdir.rglob("*.py")
        if "queries.sources_q import _ARTIFACTS" in p.read_text()
    ]
    assert offenders == []


def test_schema_evolution_merge_nulls_and_pruning(spark, sf_dir):
    """source_schema_evolution's scale properties: (1) old-epoch rows
    surface the new column as NULL and new-epoch rows never do;
    (2) a filter on the epoch partition column prunes at listing time
    (PartitionFilters), and a data filter still pushes down through the
    MERGED-schema scan (PushedFilters) — schema merge must not cost
    pushdown."""
    import re

    from pyspark.sql import functions as F

    from ubw_spark.queries import REGISTRY

    df = REGISTRY["source_schema_evolution"].fn(spark, sf_dir)
    agg = df.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("quality").alias("n_quality"),
    )
    by_epoch = {r["epoch"]: r for r in agg.collect()}
    assert by_epoch[0]["n"] > 0 and by_epoch[0]["n_quality"] == 0
    assert by_epoch[1]["n"] > 0 and by_epoch[1]["n_quality"] == by_epoch[1]["n"]

    def bracket(plan: str, kind: str) -> str:
        m = re.search(kind + r":\s*\[([^\]]*)\]", plan)
        return m.group(1) if m else ""

    pruned = df.where((F.col("epoch") == 1) & (F.col("doc_id") > 10))
    pruned.collect()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "epoch" in bracket(plan, "PartitionFilters"), plan[:1500]
    assert "doc_id" in bracket(plan, "PushedFilters"), plan[:1500]
