"""Driver-checkable queries for the CDC (SCD2) and skew operators —
both are deterministic given deterministic inputs, so their semantics
get full value-level oracles (they were previously test-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.queries.registry import register, table
from ubw_spark.functions.literals import literal_frame


@register(
    "scd2_dimension_merge",
    oracle="""
    WITH merged AS (
      -- untouched current rows: segments other than BUILDING
      SELECT c_mktsegment, c_acctbal,
             TIMESTAMP '2024-01-01' AS valid_from,
             TIMESTAMP '9999-12-31 23:59:59' AS valid_to,
             true AS is_current
      FROM customer WHERE c_mktsegment <> 'BUILDING'
      UNION ALL
      -- closed-out versions of the changed keys
      SELECT c_mktsegment, c_acctbal,
             TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01', false
      FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      -- fresh current versions carrying the changed attribute
      SELECT c_mktsegment, c_acctbal + 100,
             TIMESTAMP '2024-02-01',
             TIMESTAMP '9999-12-31 23:59:59', true
      FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT c_mktsegment, is_current,
           count(*) AS n,
           CAST(round(sum(c_acctbal) * 100) AS BIGINT) AS bal_cents,
           strftime(min(valid_from), '%Y-%m-%d') AS first_from,
           strftime(max(valid_to), '%Y-%m-%d') AS last_to
    FROM merged GROUP BY 1, 2
    """,
    tags=("cdc", "write"),
)
def scd2_dimension_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 close-out/insert/no-op, end to end: bootstrap the customer
    dimension at 2024-01-01, apply a change batch (+100 balance for the
    BUILDING segment) at 2024-02-01, and summarize version history.
    The oracle constructs the expected dimension directly — every
    branch of the merge (untouched/closed/fresh) is value-checked."""
    from ubw_spark.operators.cdc import scd2_init, scd2_merge

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    snap = cust.withColumn("ts", F.lit("2024-01-01").cast("timestamp"))
    dim = scd2_init(snap)
    changes = (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .withColumn("c_acctbal", F.col("c_acctbal") + 100)
        .withColumn("ts", F.lit("2024-02-01").cast("timestamp"))
    )
    merged = scd2_merge(dim, changes, keys=["c_custkey"])
    return merged.groupBy("c_mktsegment", "is_current").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
        F.date_format(F.min("valid_from"), "yyyy-MM-dd").alias("first_from"),
        F.date_format(F.max("valid_to"), "yyyy-MM-dd").alias("last_to"),
    )


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(round(sum(value) * 100) AS BIGINT) AS total_cents,
           count(*) AS n,
           CAST(round(min(value) * 100) AS BIGINT) AS min_cents,
           CAST(round(max(value) * 100) AS BIGINT) AS max_cents
    FROM events GROUP BY 1
    """,
    tags=("skew", "agg"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation must equal the plain GROUP BY — the
    oracle IS the plain form.  Summing exact integer cents keeps the
    two-phase recombination order-independent (a salted double sum
    would drift).  event_type is the hot-key archetype: few distinct
    values, millions of rows each at scale."""
    from ubw_spark.operators.skew import salted_groupby_agg

    ev = table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    out = salted_groupby_agg(
        ev.select("event_type", "cents"),
        ["event_type"],
        {
            "total_cents": ("sum", "cents"),
            "n": ("count", "cents"),
            "min_cents": ("min", "cents"),
            "max_cents": ("max", "cents"),
        },
        salt_buckets=16,
    )
    return out.select("event_type", "total_cents", "n", "min_cents", "max_cents")


@register(
    "skew_salted_join",
    oracle="""
    WITH probe AS (
      SELECT CASE WHEN user_id % 10 < 7 THEN 0
                  ELSE CAST(user_id % 25 AS INTEGER) END AS n_nationkey,
             value
      FROM events),
    j AS (SELECT n.n_name, p.value
          FROM probe p JOIN nation n ON n.n_nationkey = p.n_nationkey)
    SELECT n_name,
           count(*) AS n_rows,
           CAST(round(sum(value) * 100) AS BIGINT) AS total_cents
    FROM j GROUP BY 1
    """,
    tags=("skew", "join"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under the driver gate (VERDICT r12 #2): the probe
    side is events with a PLANTED Zipf-hot dimension key — ~70% of all
    rows map to n_nationkey 0 (user_id%10<7), the rest spread over the
    other nation keys — the shape where a plain shuffled join puts 70%
    of the probe in ONE reducer task.  operators/skew.py::salted_join
    replicates the build side ×8 (explode over the salt sequence),
    salts each probe row deterministically (xxhash64 of the full row —
    reruns and retries agree), and joins on (key, __salt): the hot
    key's rows spread over 8 tasks, at the explicit cost of 8× the
    (tiny) build side.  Oracle = the PLAIN join + GROUP BY: salting
    must be invisible in the result.  Plan-asserted in
    tests/test_plans.py: the join condition carries __salt and the
    build side is explode-replicated.  (At THIS dim size a broadcast
    join would win outright — the query pins the construction for the
    fact-fact case where the build side is too big to broadcast but
    has a hot probe key AQE's skew split can't touch, e.g. bucketed
    non-shuffle joins.)"""
    from ubw_spark.operators.skew import salted_join

    probe = table(spark, sf_dir, "events").select(
        F.when(F.pmod(F.col("user_id"), F.lit(10)) < 7, F.lit(0))
        .otherwise(F.pmod(F.col("user_id"), F.lit(25)))
        .cast("int")
        .alias("n_nationkey"),
        "value",
    )
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(probe, nat, "n_nationkey", salt_buckets=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value") * 100, 0).cast("long").alias("total_cents"),
    )


@register(
    "engine_properties_catalog",
    oracle="""
    SELECT * FROM (VALUES
      ('key',     'bigint', true, true,  true,  'customer key'),
      ('name',    'string', true, false, true,  NULL),
      ('bal',     'double', true, true,  true,  'account balance'),
      ('segment', 'string', true, false, true,  NULL))
      AS t(property, typeName, inRetrieve, canOrder, isDefaultDesc, "describe")
    """,
    tags=("engine", "render"),
)
def engine_properties_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/P12 as a driver-checkable query: the properties catalog the
    JsonView sink emits (doc-02.md:107-115), returned as rows.  Checks
    the frozen typeName mapping (Spark simpleStrings, FIXTURES.md G2),
    the orderTarget→canOrder=false rule, and describe passthrough."""
    from pyspark.sql import types as T

    from ubw_spark.core.spec import ColumnSpec, QuerySpec
    from ubw_spark.render import properties_catalog

    spec = QuerySpec(
        [
            ColumnSpec("key", expr="c_custkey", orderable=True,
                       describe="customer key"),
            # name sorts via key → canOrder must come back false
            ColumnSpec("name", expr="c_name", orderable=True,
                       order_target="key"),
            ColumnSpec("bal", expr="c_acctbal", orderable=True,
                       describe="account balance"),
            ColumnSpec("segment", expr="c_mktsegment"),
        ]
    )
    df = spec.frame(table(spark, sf_dir, "customer"))
    schema = T.StructType(
        [
            T.StructField("property", T.StringType(), False),
            T.StructField("typeName", T.StringType(), False),
            T.StructField("inRetrieve", T.BooleanType(), False),
            T.StructField("canOrder", T.BooleanType(), False),
            T.StructField("isDefaultDesc", T.BooleanType(), False),
            T.StructField("describe", T.StringType(), True),
        ]
    )
    rows = [
        (
            p["property"], p["typeName"], p["inRetrieve"],
            p["canOrder"], p["isDefaultDesc"], p["describe"],
        )
        for p in properties_catalog(spec, df)
    ]
    return literal_frame(spark, rows, schema)


@register(
    "engine_literal_rows_join",
    oracle="""
    WITH seeds(grade, label) AS (
      VALUES (CAST(3 AS BIGINT), 'bronze'), (CAST(4 AS BIGINT), 'silver'),
             (CAST(5 AS BIGINT), 'gold'))
    SELECT label, count(*) AS n,
           CAST(round(sum(c_acctbal) * 100) AS BIGINT) AS bal_cents
    FROM customer
    JOIN seeds ON c_nationkey % 3 + 3 = grade
    GROUP BY label
    """,
    tags=("engine", "source"),
)
def engine_literal_rows_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 literal rows as a driver-checkable query: an in-memory seed
    table (the reference's Helper.scala:19-21 pattern) broadcast-joined
    against a real scan — the lookup-table idiom."""
    from pyspark.sql.functions import broadcast

    from ubw_spark.sources.readers import literal_rows

    # trusted=True: these three rows are engine-written literals in
    # this file, exactly the scope functions/literals.py reserves for
    # the JVM-literal rendering (no Python-RDD scan per consuming job).
    seeds = literal_rows(
        spark,
        [(3, "bronze"), (4, "silver"), (5, "gold")],
        "grade bigint, label string",
        trusted=True,
    )
    cust = table(spark, sf_dir, "customer")
    return (
        cust.join(
            broadcast(seeds),
            (F.col("c_nationkey") % 3 + 3) == F.col("grade"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
        )
    )


@register(
    "corpus_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(lower(trim(text))) AS fp
      FROM documents WHERE doc_id % 7 != 0),
    new AS (
      SELECT doc_id,
             md5(lower(trim(CASE WHEN doc_id % 11 = 0
                                 THEN text || ' v2' ELSE text END))) AS fp
      FROM documents WHERE doc_id % 5 != 0)
    SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.doc_id IS NULL THEN 'added'
                WHEN new.doc_id IS NULL THEN 'removed'
                WHEN old.fp != new.fp THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
    tags=("cdc", "dedup"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus delta (added / removed / changed /
    unchanged by content fingerprint) — operators/cdc.py::snapshot_diff.
    The two snapshots are modulo slices of `documents`, with docs at
    doc_id % 11 == 0 edited in the new snapshot so every status value
    is exercised.  Only (id, fingerprint) pairs shuffle."""
    from ubw_spark.operators.cdc import snapshot_diff

    d = table(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 7 != 0)
    new = d.where(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new, "doc_id", "text")


@register(
    "cdc_incremental_agg",
    oracle="""
    WITH new AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10.0e0
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 11 <> 0)
    SELECT o_orderpriority, count(*)::BIGINT AS cnt,
           sum(CAST(round(price * 100) AS BIGINT))::BIGINT AS cents
    FROM new GROUP BY 1
    """,
    tags=("cdc", "incremental"),
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/incremental.py): a
    materialized per-priority (count, cents) aggregate of the OLD order
    snapshot is folded forward with the signed row delta to the NEW
    snapshot — inserts (keys the old dump lacked), deletes (keys %11),
    and in-place price changes (keys %13, a delete+insert pair).  The
    oracle aggregates the new snapshot FROM SCRATCH, so the gate proves
    agg(old) ⊕ delta == agg(new) bit-for-bit — cents are discretized
    per row, making the sums order-independent integers.

    Scale: the delta join shuffles (key, fingerprint, 2 columns); the
    fold is delta-sized groupBy + |groups|-sized join.  The new
    snapshot is read once to DERIVE the delta and never re-aggregated
    — at 100 TB that is the difference between touching the dump and
    touching the dashboard."""
    from ubw_spark.operators.incremental import (
        apply_delta_to_agg,
        grouped_agg,
        row_delta,
    )

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    key = F.col("o_orderkey")
    old = base.where(key % 7 != 0)
    new = base.where(key % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            key % 13 == 0, F.col("o_totalprice") + F.lit(10.0)
        ).otherwise(F.col("o_totalprice")),
    )
    measures = {
        "cnt": F.lit(1).cast("long"),
        "cents": F.round(F.col("o_totalprice") * 100, 0).cast("long"),
    }
    state = grouped_agg(old, ["o_orderpriority"], measures)
    delta = row_delta(
        old, new, ["o_orderkey"], ["o_orderpriority", "o_totalprice"]
    )
    maintained = apply_delta_to_agg(
        state, delta, ["o_orderpriority"], measures, count_col="cnt"
    )
    return maintained.select("o_orderpriority", "cnt", "cents")


@register(
    "cdc_incremental_join_agg",
    oracle="""
    WITH new_o AS (
      SELECT o_custkey,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10.0e0
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 11 <> 0),
    new_c AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 17 = 0 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer)
    SELECT c_mktsegment, count(*)::BIGINT AS cnt,
           sum(CAST(round(price * 100) AS BIGINT))::BIGINT AS cents
    FROM new_o JOIN new_c ON o_custkey = c_custkey
    GROUP BY 1
    """,
    tags=("cdc", "incremental", "join"),
)
def cdc_incremental_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an aggregate OVER A JOIN VIEW
    (operators/incremental.py::join_delta): revenue cents per market
    segment of orders ⋈ customer, maintained under simultaneous churn
    on BOTH bases — orders inserted/deleted/re-priced AND customers
    migrating segments — via the bilinear identity
    Δ(A⋈B) = ΔA⋈B_old + A_old⋈ΔB + ΔA⋈ΔB (signs multiplied), then the
    same apply_delta_to_agg fold as the single-table query.  The oracle
    joins and aggregates the NEW snapshots from scratch: maintained ==
    recomputed bit-for-bit.

    Scale: each delta term joins a delta-sized side against a base
    keyed on the join key — the full A⋈B join never re-runs, and the
    fold stays delta + |groups| sized."""
    from ubw_spark.operators.incremental import (
        apply_delta_to_agg,
        grouped_agg,
        join_delta,
        row_delta,
    )

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    okey = F.col("o_orderkey")
    old_o = o.where(okey % 7 != 0)
    new_o = o.where(okey % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            okey % 13 == 0, F.col("o_totalprice") + F.lit(10.0)
        ).otherwise(F.col("o_totalprice")),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    old_c = c
    new_c = c.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 17 == 0, F.lit("MACHINERY")).otherwise(
            F.col("c_mktsegment")
        ),
    )

    measures = {
        "cnt": F.lit(1).cast("long"),
        "cents": F.round(F.col("o_totalprice") * 100, 0).cast("long"),
    }
    state = grouped_agg(
        old_o.join(old_c, old_o["o_custkey"] == old_c["c_custkey"]),
        ["c_mktsegment"],
        measures,
    )
    d_o = row_delta(
        old_o, new_o, ["o_orderkey"], ["o_custkey", "o_totalprice"]
    )
    d_c = row_delta(old_c, new_c, ["c_custkey"], ["c_mktsegment"])
    jd = join_delta(
        old_o.drop("o_orderkey"),
        d_o.drop("o_orderkey"),
        old_c,
        d_c,
        on=[("o_custkey", "c_custkey")],
    )
    maintained = apply_delta_to_agg(
        state, jd, ["c_mktsegment"], measures, count_col="cnt"
    )
    return maintained.select("c_mktsegment", "cnt", "cents")


@register(
    "profile_key_skew",
    oracle="""
    WITH c AS (SELECT l_suppkey AS key, count(*)::BIGINT AS cnt
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
                 count(*)::BIGINT AS n_keys FROM c),
    top AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key ASC LIMIT 10),
    r AS (SELECT key, cnt,
                 row_number() OVER (ORDER BY cnt DESC, key ASC) AS rnk
          FROM top)
    SELECT r.rnk, r.key, r.cnt, t.n_keys, t.total_rows,
           CAST((r.cnt * 1000) // t.total_rows AS BIGINT) AS share_milli
    FROM r, t
    """,
    tags=("skew", "agg"),
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaviest-key report for a prospective join/agg key (supplier key
    over lineitem): exact integer milli-shares of the top 10 — the
    decide-whether-to-salt readout feeding salted_groupby_agg.

    Scale: groupBy with map-side combine, TakeOrderedAndProject for
    the top-k (the rank window is grounded by the literal limit), and
    a one-row totals broadcast."""
    from ubw_spark.operators.skew import key_skew_report

    li = table(spark, sf_dir, "lineitem").select("l_suppkey")
    return key_skew_report(li, "l_suppkey", k=10)
