"""Time-windowed aggregations over `events` — the batch twins of the
streaming operators (SURVEY §2.9 is net-new vs the reference).

Each query here is the exact batch semantics of a Structured Streaming
pipeline in ubw_spark.streaming: tumbling/sliding windows via
``F.window``, sessionization via the gap rule.  Running them in batch
against a SQL oracle proves the window math; the streaming tests then
prove the same plans run incrementally with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ubw_spark.queries.registry import register, table

_FMT = "yyyy-MM-dd HH:mm:ss"


# shared by the batch query and its streaming twin: a windowed result
# assembled from watermarked micro-batches must be value-identical to
# the one-pass batch aggregation
_TUMBLING_ORACLE = """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           CAST(round(sum(value) * 100) AS BIGINT) AS total_cents
    FROM events GROUP BY 1, 2
    """


@register(
    "events_tumbling_hourly",
    oracle=_TUMBLING_ORACLE,
    tags=("events", "window", "streaming"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (F.window — identical operator batch or
    stream; in streaming add withWatermark and state cleanup is free)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # integer cents: accumulation-order independent (see sessionize)
            F.round(F.sum("value") * 100, 0).cast("long").alias("total_cents"),
        )
        .select(
            F.date_format(F.col("window.start"), _FMT).alias("window_start"),
            "event_type",
            "n",
            "total_cents",
        )
    )


@register(
    "events_sliding_windows",
    oracle="""
    WITH g AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, value FROM events),
         e AS (SELECT b AS ws, value FROM g
               UNION ALL
               SELECT b - INTERVAL '30 minutes' AS ws, value FROM g)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n,
           CAST(round(sum(value) * 100) AS BIGINT) AS total_cents
    FROM e GROUP BY ws
    """,
    tags=("events", "window", "streaming"),
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour length, 30 min slide — each event belongs
    to 2 windows (Spark expands rows by length/slide; shuffle volume
    scales by that factor, so keep the ratio small at 100 TB)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # value is 2-decimal money: exact integer cents sidesteps the
            # round-half ambiguity that a float avg/round would hit.
            F.round(F.sum("value") * 100, 0).cast("long").alias("total_cents"),
        )
        .select(
            F.date_format(F.col("window.start"), _FMT).alias("window_start"),
            "n",
            "total_cents",
        )
    )


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             -- CAST: DuckDB's windowed sum yields HUGEINT, which pandas
             -- canonicalizes to float64 (31.0 vs Spark's 31) — BIGINT keeps
             -- the driver's value-hash comparable.
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(round(sum(value) * 100) AS BIGINT) AS session_cents,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("events", "window", "streaming"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via the lag/cumsum rule —
    one shuffle on user_id, then two window passes in the same sort
    order (no second shuffle).  The streaming twin uses
    F.session_window which merges windows in state instead."""
    ev = table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    gap = F.lag("ts").over(order)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            gap.isNull()
            # Compare in microseconds: casting to whole seconds first would
            # truncate sub-second gaps in (1800.0, 1801.0) into a mis-merge.
            | ((F.unix_micros(F.col("ts")) - F.unix_micros(gap)) > 1800 * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # value is 2-decimal money: exact integer cents is accumulation-order
        # independent, unlike round(sum(double), 4) which can land either side
        # of a half boundary depending on partition order.
        F.round(F.sum("value") * 100, 0).cast("long").alias("session_cents"),
        F.date_format(F.min("ts"), _FMT).alias("session_start"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f USING (user_id))
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
           day_offset, count(*) AS active_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY 1, 2
    """,
    tags=("events", "analytics"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts: users grouped by first-seen day, counted on
    each later activity day (offset ≤ 7).  Two shuffles total: the
    first-day agg and the final cohort count — the per-user join reuses
    the user_id partitioning.  The classic growth-analytics query."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .where(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
        "day_offset",
    ).agg(F.count(F.lit(1)).alias("active_users"))


@register(
    "events_attribution_position",
    oracle="""
    WITH e AS (SELECT user_id, event_id, ts, event_type FROM events
               WHERE event_type IN ('view', 'click', 'purchase')),
    j AS (SELECT *,
            count(CASE WHEN event_type = 'purchase' THEN 1 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS jny
          FROM e),
    p AS (SELECT user_id, jny FROM j WHERE event_type = 'purchase'),
    t AS (SELECT j.* FROM j JOIN p USING (user_id, jny)
          WHERE j.event_type <> 'purchase'),
    r AS (SELECT event_type,
            row_number() OVER (PARTITION BY user_id, jny
                               ORDER BY ts, event_id) AS rn,
            count(*) OVER (PARTITION BY user_id, jny) AS n
          FROM t)
    SELECT event_type,
           sum(CASE WHEN n = 1 THEN 1000
                    WHEN n = 2 THEN 500
                    WHEN rn = 1 THEN 400
                    WHEN rn = n THEN 400
                    ELSE 200 // (n - 2) END)::BIGINT AS credit_milli,
           count(*)::BIGINT AS touches
    FROM r GROUP BY 1
    """,
    tags=("events", "window", "attribution"),
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution
    (operators/attribution.py): each purchase closes the journey of
    views/clicks since the user's previous purchase; credit splits
    40/20/40 first/middles/last in INTEGER milli-credits, so the
    per-channel totals are exact BIGINTs both engines agree on —
    float credit would drift by summation order.  Scale: one per-user
    running-count window, one (user, journey)-keyed join, one
    per-journey window; nothing corpus-global."""
    from ubw_spark.operators.attribution import position_attribution

    credits = position_attribution(table(spark, sf_dir, "events"))
    return credits.groupBy("event_type").agg(
        F.sum("credit_milli").alias("credit_milli"),
        F.count(F.lit(1)).alias("touches"),
    )


def _stage_out_of_order_arrivals(spark: SparkSession, ev: DataFrame, base: str) -> str:
    """Stage ``ev`` as a sequence of arrival files with GENUINELY
    out-of-order rows, for the streaming queries below.  Returns the
    incoming directory (``base`` is registered for atexit cleanup).

    Events are split into arrival files by 10-day event-time chunk
    (anchored at the data's own min(ts), so the construction holds for
    any time span), but a deterministic ~1/7 slice
    (crc32(event_id) % 7 == 0) is DEMOTED one file — it arrives up to
    10 days late, so every micro-batch after the first contains
    out-of-order rows.  Consumed with ``maxFilesPerTrigger=1`` and
    ``withWatermark("ts", "10 days")``, the 10-day delay provably never
    drops a row: an event from chunk c arrives at latest in chunk
    c+1's batch, whose in-effect watermark is
    max_ts(files ≤ c) − 10d ≤ end(chunk c) − 10d < start(chunk c),
    below every demoted event's event time.

    Two far-future sentinel files (event_type '__flush__', user_id
    10_000_000+i — outside every real key domain) arrive last: the
    FIRST pushes the watermark past every real window/session end, the
    SECOND makes that advance take effect during a DATA batch (the
    watermark used in batch k is computed from batches < k), so append
    sinks finalize all real aggregates without relying on trailing
    no-data micro-batches.  The sentinels' own windows/sessions stay
    unfinalized in state and never reach the sink."""
    import datetime
    import os

    from ubw_spark.artifacts import register_artifact

    register_artifact(base)
    incoming = f"{base}/in"
    os.makedirs(incoming, exist_ok=True)

    # arrival slot: 10-day event-time chunk FROM THE DATA'S OWN min(ts)
    # (one tiny agg job; chunking by day-of-month would silently
    # interleave months and void the drop-free proof on multi-month
    # data), + 1 for the late slice.  An empty slot yields no file and
    # no micro-batch — safe, because a slot holding demoted rows is by
    # definition non-empty; the proof only needs files in slot order.
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo_day = bounds["lo"].date()
    span_days = (bounds["hi"].date() - lo_day).days
    n_chunks = span_days // 10 + 1
    chunk = (F.datediff(F.col("ts"), F.lit(lo_day)) / F.lit(10)).cast("int")
    slot = chunk + F.when(
        F.crc32(F.col("event_id").cast("string")) % 7 == 0, F.lit(1)
    ).otherwise(F.lit(0))
    staged = ev.withColumn("__slot", slot)
    n_slots = n_chunks + 1
    sentinel_days = (
        lo_day + datetime.timedelta(days=span_days + 40),
        lo_day + datetime.timedelta(days=span_days + 41),
    )
    mtime = 1_700_000_000
    # ONE events pass splits all arrival files (repartition on the slot
    # → one file per slot under __slot=N/ dirs) — a per-slot
    # filter-and-write loop would re-scan the whole table once per
    # slot, ~n_slots× the read volume for a headline query.
    stage = f"{base}/stage"
    (
        staged.repartition(F.col("__slot"))
        .write.mode("overwrite")
        .partitionBy("__slot")
        .parquet(stage)
    )
    for d_name in sorted(os.listdir(stage)):
        if not d_name.startswith("__slot="):
            continue
        s = int(d_name.split("=", 1)[1])
        parts = [
            f for f in os.listdir(f"{stage}/{d_name}")
            if f.endswith(".parquet")
        ]
        if len(parts) != 1:
            # the drop-free proof needs each slot to be ONE micro-batch:
            # a same-slot split would let the first file raise the
            # watermark over the second file's oldest demoted events.
            # repartition(col) puts a slot's rows in one partition, so
            # this can only fire if that guarantee changes — fail loud.
            raise RuntimeError(
                f"_stage_out_of_order_arrivals: slot {s} wrote "
                f"{len(parts)} files; expected exactly 1"
            )
        dst = f"{incoming}/b{s}.parquet"
        os.rename(f"{stage}/{d_name}/{parts[0]}", dst)
        # file-source batch order = (modification time, path): pin it
        # so "late" files are genuinely processed later
        os.utime(dst, (mtime + s, mtime + s))
    # two sentinel flush files (see docstring): the FIRST advances the
    # watermark past every real aggregate, the SECOND makes the advance
    # effective during a data batch
    for i, sent_day in enumerate(sentinel_days):
        # The sentinel is ONE engine-written row with known values: the
        # round-13 form planned a JVM-literal frame and ran a Spark
        # write job per sentinel (~0.2-0.4 s each: plan + job + commit
        # protocol); writing the parquet file directly with pyarrow
        # costs ~10 ms and produces the identical physical layout the
        # staged arrival files carry (int64 event_id/user_id,
        # timestamp[us] UTC-adjusted ts — matching the Spark-written
        # files — string/double payloads).  The stream reads every
        # arrival file under the EXPLICIT events schema, so no
        # inference path ever sees this file, and sentinel rows never
        # reach the output (their own windows sit past the final
        # watermark; the oracle pins that).
        import datetime as _dt

        import pyarrow as pa
        import pyarrow.parquet as papq

        sent_dt = _dt.datetime(
            sent_day.year, sent_day.month, sent_day.day,
            tzinfo=_dt.timezone.utc,
        )
        tbl = pa.table(
            {
                "event_id": pa.array([10_000_000 + i], pa.int64()),
                "ts": pa.array([sent_dt], pa.timestamp("us", tz="UTC")),
                "user_id": pa.array([10_000_000 + i], pa.int64()),
                "event_type": pa.array(["__flush__"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        )
        dst = f"{incoming}/s{i}.parquet"
        papq.write_table(tbl, dst)
        os.utime(dst, (mtime + n_slots + i, mtime + n_slots + i))
    return incoming


@register(
    "stream_tumbling_watermark",
    oracle=_TUMBLING_ORACLE,
    tags=("events", "window", "streaming"),
)
def stream_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event-time/watermark path EXECUTED AS A REAL STRUCTURED
    STREAMING QUERY under the driver gate (VERDICT r11 #4) — the
    out-of-order twin of ``events_tumbling_hourly``.

    Construction: ``_stage_out_of_order_arrivals`` (chunked arrival
    files with a demoted ~1/7 late slice + sentinel flush files — the
    drop-free proof lives on that helper).  The stream runs
    ``readStream`` (maxFilesPerTrigger=1) → ``withWatermark("ts",
    "10 days")`` → tumbling 1-hour window agg → append-mode parquet
    sink with a checkpoint.

    Oracle = the SAME batch tumbling SQL: watermarked incremental
    assembly must be value-identical to the one-pass batch aggregate.
    At 100 TB this is the continuous ingest posture: state is bounded
    by windows-per-watermark-horizon (not by stream length), each
    micro-batch shuffles only its own rows, and finalized windows are
    appended exactly once (checkpointed offsets + idempotent sink)."""
    import uuid

    from ubw_spark.streaming.stages import (
        shuffle_partitions_override,
        stream_shuffle_partitions,
    )

    ev = table(spark, sf_dir, "events")
    run = uuid.uuid4().hex[:10]
    base = f"/tmp/ubw_spark_stream_wm_{run}"
    ckpt, sink = f"{base}/ckpt", f"{base}/out"
    incoming = _stage_out_of_order_arrivals(spark, ev, base)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming)
    )
    agg = (
        stream.withWatermark("ts", "10 days")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value") * 100, 0).cast("long").alias("total_cents"),
        )
        .select(
            F.date_format(F.col("window.start"), _FMT).alias("window_start"),
            "event_type",
            "n",
            "total_cents",
        )
    )
    # State/sink partition count sized for streaming, not inherited
    # from the batch session (stream_shuffle_partitions: AQE cannot
    # coalesce stateful shuffles, and every state partition costs a
    # store commit + checkpoint delta + sink file PER MICRO-BATCH).
    # Partitioning never changes the aggregation's values, only where
    # rows are summed — the DuckDB oracle pins that.
    with shuffle_partitions_override(
        spark, stream_shuffle_partitions(spark)
    ):
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(300)
        finally:
            q.stop()
    if not finished:
        raise RuntimeError(
            "stream_tumbling_watermark: ingest did not finish within "
            "300s — a partial sink would undercount windows"
        )
    return spark.read.schema(agg.schema).parquet(sink)


# Shared by the stateful streaming query and its oracle: the gap-rule
# sessionization of events_sessionize, grouped WITHOUT the per-user
# session ordinal (session_start identifies a session; the ordinal is
# an artifact of the batch cumsum construction that a merging
# session-window state machine never materializes).
_SESSION_STREAM_ORACLE = """
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           CAST(round(sum(value) * 100) AS BIGINT) AS session_cents
    FROM sessions GROUP BY user_id, session_id
    """


@register(
    "stream_session_window_stateful",
    oracle=_SESSION_STREAM_ORACLE,
    tags=("events", "session", "streaming", "stateful"),
)
def stream_session_window_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL streaming under the driver gate (VERDICT r12 #1): a
    real ``readStream`` whose per-key session state MERGES across
    micro-batches — ``session_window`` keeps one open (start, end)
    range per (user, session) in the state store, extends it when an
    in-gap event arrives in a later micro-batch, bridges two open
    sessions when a late event lands between them, and emits a session
    only once the watermark passes its end.  This goes beyond
    stream_tumbling_watermark's fixed window keys: the GROUPING itself
    is stateful (window identity changes as data arrives).

    Construction: the same ``_stage_out_of_order_arrivals`` chunked
    files (demoted ~1/7 late slice + sentinel flush files) →
    ``withWatermark("ts", "10 days")`` → ``session_window("ts",
    "30 minutes")`` per user → append-mode parquet sink.  Late events
    cannot corrupt a finalized session: a session is emitted only when
    watermark > session end, and any event that would extend or bridge
    it satisfies ts > session_end − gap ≥ watermark-at-its-arrival (the
    staging helper's no-drop bound), so the session it touches is still
    open in state.  Spark's session merge is boundary-INCLUSIVE (an
    event exactly gap-seconds after the last still merges — verified),
    identical to the batch twin's ``diff > 1800s → new session`` rule.

    Oracle = the gap-rule sessionization SQL of ``events_sessionize``
    (its batch twin) minus the per-user session ordinal: incremental
    stateful assembly must be value-identical to the batch answer.
    At 100 TB: state is bounded by OPEN sessions within the watermark
    horizon per key — closed sessions leave state; each micro-batch
    shuffles only its own rows; exactly-once via checkpointed offsets
    + idempotent file sink (kill-and-replay pytest in
    tests/test_streaming.py)."""
    import uuid

    from ubw_spark.streaming.stages import (
        shuffle_partitions_override,
        stream_shuffle_partitions,
    )

    ev = table(spark, sf_dir, "events")
    run = uuid.uuid4().hex[:10]
    base = f"/tmp/ubw_spark_stream_sess_{run}"
    ckpt, sink = f"{base}/ckpt", f"{base}/out"
    incoming = _stage_out_of_order_arrivals(spark, ev, base)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming)
    )
    agg = (
        stream.withWatermark("ts", "10 days")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") * 100, 0).cast("long").alias("session_cents"),
        )
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), _FMT).alias(
                "session_start"
            ),
            "n_events",
            "session_cents",
        )
    )
    # Streaming-sized state partitions — see stream_tumbling_watermark;
    # session merging is per-user, so partitioning cannot change which
    # sessions form, only which state store holds each user.
    with shuffle_partitions_override(
        spark, stream_shuffle_partitions(spark)
    ):
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(300)
        finally:
            q.stop()
    if not finished:
        raise RuntimeError(
            "stream_session_window_stateful: ingest did not finish "
            "within 300s — a partial sink would undercount sessions"
        )
    return spark.read.schema(agg.schema).parquet(sink)
