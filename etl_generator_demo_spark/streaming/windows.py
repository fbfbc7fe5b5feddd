"""Time-window operators over the events stream — SURVEY.md §2.11
([EXT]; the reference has no streaming surface).

Batch-first: `F.window` / `F.session_window` produce identical results
in batch and in Structured Streaming, so each operator here is written
once and reused by `streaming_pipeline()` with `readStream` +
`withWatermark` for a live source. Windowed aggregation in streaming
mode keeps per-window partial state in the state store; the watermark
bounds it (late events beyond 10 minutes are dropped).

Oracle parity: tumbling window starts are epoch-aligned, equal to
date_trunc on the period; sliding windows enumerate the (width/slide)
grids; session windows are the classic gaps-and-islands rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "st_tumbling_hourly",
    oracle="""
    SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    survey_ids=("§2.11",),
)
def st_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type."""
    return tumbling_counts(t(spark, sf_dir, "events")).orderBy("window_start", "event_type")


@register(
    "st_sliding_windows",
    oracle="""
    WITH grid AS (
        SELECT TIME_BUCKET(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS window_start, value
        FROM events
        UNION ALL
        SELECT TIME_BUCKET(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes', value
        FROM events
    )
    SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM grid
    GROUP BY 1
    ORDER BY window_start
    """,
    survey_ids=("§2.11",),
)
def st_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour width, 30-minute slide (each event lands
    in two windows; the oracle enumerates both grid positions)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@register(
    "st_session_windows",
    oracle="""
    WITH marked AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
                            > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    islands AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    survey_ids=("§2.11",),
)
def st_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap
    (F.session_window; merged-session semantics match gaps-and-islands).

    Scale shape (measured at the 100x probe tier, 1M events/955k
    sessions): one hash shuffle on user_id + per-partition sort-merge,
    then the output-ordering range shuffle — wall clock is linear in
    events + sessions, with the driver-side row materialization of the
    probe's collect() as the largest term. A gaps-and-islands window
    rewrite and 4x shuffle partitions were both measured no faster;
    Catalyst already prunes the scan to (user_id, ts) through the
    nanos-ts normalization (the explicit select just documents it)."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    return user_sessions(ev).orderBy("user_id", "session_start")


def user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """(user_id, session_start, n_events) via F.session_window.

    Hot-user skew: session semantics are a per-user total order, so
    Spark's plan shuffles every event of a user to one task
    (MergingSessions is a single sorted linear pass — a hot user costs
    O(n log n) in that task, never quadratic). When one user carries
    enough volume to straggle, use ``user_sessions_salted`` — result-
    identical, skew-spread (tests/test_skew_hotuser.py)."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def user_sessions_salted(
    events: DataFrame, gap: str = "30 minutes", bucket_secs: int = 86400
) -> DataFrame:
    """Two-phase sessionization that spreads a hot user across tasks —
    the salting answer for session windows, where plain salt-and-join
    would corrupt the per-user order.

    Phase 1 sessionizes within ``(user_id, time-bucket)``: the bucket
    id is a deterministic time-derived salt, so one user's events
    shuffle to as many tasks as buckets they span. Phase 2 repairs the
    bucket-boundary splits: per user, adjacent phase-1 sessions merge
    when the next starts inside the previous session's gap extension —
    a gaps-and-islands pass over SESSION SUMMARIES (orders of magnitude
    fewer rows than events; session ends are nondecreasing in start
    order, so lag(end) is the running max and chain merges compose).

    Exactly ``user_sessions`` semantics: intra-bucket splits are
    F.session_window's own; extra splits exist only at bucket edges and
    phase 2 merges precisely those whose inter-session gap is inside
    ``gap`` (strict ``<``, matching session_window's half-open
    [start, last+gap) windows). Equivalence pinned on planted hot-user
    data and on the real fixture in tests/test_skew_hotuser.py."""
    # cast: unix_micros requires TIMESTAMP; the parquet ts column may
    # infer as TIMESTAMP_NTZ (wall-clock identical under UTC session tz)
    bucket = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(int(bucket_secs) * 1_000_000)
    )
    phase1 = (
        events.groupBy(
            "user_id",
            bucket.alias("_b"),
            F.session_window("ts", gap).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
        )
    )
    w = Window.partitionBy("user_id").orderBy("s_start")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        phase1.withColumn("_prev_end", F.lag("s_end").over(w))
        .withColumn(
            "_new",
            (
                F.col("_prev_end").isNull()
                | (F.col("s_start") >= F.col("_prev_end"))
            ).cast("long"),
        )
        .withColumn("_sess_no", F.sum("_new").over(run))
        .groupBy("user_id", "_sess_no")
        .agg(
            F.min("s_start").alias("session_start"),
            F.sum("n_events").alias("n_events"),
        )
        .select("user_id", "session_start", "n_events")
    )


@register(
    "st_session_windows_salted",
    oracle="""
    WITH marked AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
                            > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    islands AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    survey_ids=("§2.11",),
)
def st_session_windows_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-user-safe tier of ``st_session_windows``: two-phase
    salted sessionization (1-hour salt buckets at fixture scale; a day
    in production). Same oracle as the plain tier — the session set is
    identical by construction, so the hash proves the salting repair
    step exact."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    return user_sessions_salted(ev, bucket_secs=3600).orderBy(
        "user_id", "session_start"
    )


@register(
    "st_late_data_watermark_semantics",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS max_ts FROM events)
    SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           COUNT(*) AS n_events
    FROM events, mx
    WHERE CAST(ts AS TIMESTAMP) >= mx.max_ts - INTERVAL '10 minutes'
    GROUP BY 1
    ORDER BY 1
    """,
    survey_ids=("§2.11",),
)
def st_late_data_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics expressed in batch: only events within the
    10-minute watermark horizon of max event time count (what a
    streaming query with withWatermark('ts','10 minutes') would admit
    at end-of-stream)."""
    ev = t(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("wm")
    )
    return (
        ev.join(F.broadcast(horizon))
        .filter(F.col("ts") >= F.col("wm"))
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("window_start")
    )


def streaming_pipeline(spark: SparkSession, source: DataFrame | None = None):
    """Structured Streaming assembly of the same tumbling aggregation:
    readStream -> withWatermark -> window agg. Returns the unstarted
    streaming DataFrame (callers attach writeStream/sink). With no
    source, uses the rate source shaped like events."""
    if source is None:
        source = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 100)
            .load()
            .select(
                F.col("timestamp").alias("ts"),
                (F.col("value") % 5).cast("string").alias("event_type"),
                (F.col("value") % 100).cast("double").alias("value"),
            )
        )
    if dict(source.dtypes).get("ts") == "timestamp_ntz":
        # withWatermark requires TIMESTAMP; NTZ parquet sources are
        # wall-clock identical under the UTC session timezone
        source = source.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        source.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "st_hourly_top_events",
    oracle="""
    WITH counts AS (
        SELECT TIME_BUCKET(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type, COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT window_start, event_type, n_events,
               ROW_NUMBER() OVER (PARTITION BY window_start
                                  ORDER BY n_events DESC, event_type) AS rk
        FROM counts
    )
    SELECT window_start, event_type,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY window_start, rk
    """,
    survey_ids=("§2.11", "W4"),
)
def st_hourly_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour — the trending-now query.
    In Structured Streaming the windowed counts are the incremental
    stateful stage (same state as `st_tumbling_hourly`); the per-window
    ranking runs on the COMPLETE-mode output or per finalized window
    after the watermark — ranks over open windows would churn every
    micro-batch. Deterministic rank ties by event_type; one windowed
    groupBy + one window-partitioned rank, both keyed by window."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.col("event_type")
        )
    )
    return (
        counts.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= 3)
        .select("window_start", "event_type", F.col("n_events").cast("long").alias("n_events"), "rk")
        .orderBy("window_start", "rk")
    )


LATENESS_BUCKET_S = 600  # 10-minute lateness histogram buckets


@register(
    "st_lateness_histogram",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events
    ),
    arrival AS (
        -- deterministic bounded-disorder replay: events arrive batched
        -- by day but md5-shuffled WITHIN each day (the fixture itself
        -- is time-ordered, which would make every lateness zero);
        -- lateness = how far behind the running max event-time each
        -- event arrives under that replay
        SELECT event_id, ts,
               MAX(ts) OVER (ORDER BY CAST(ts AS DATE),
                                      MD5(CAST(event_id AS VARCHAR)), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS high_water
        FROM ev
    ),
    lateness AS (
        SELECT (EPOCH_US(high_water) - EPOCH_US(ts)) // 1000000 AS late_s
        FROM arrival
    )
    SELECT CAST(late_s // {LATENESS_BUCKET_S} AS BIGINT) AS bucket,
           CAST(late_s // {LATENESS_BUCKET_S} * {LATENESS_BUCKET_S} AS BIGINT)
               AS bucket_lo_s,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM lateness
    GROUP BY late_s // {LATENESS_BUCKET_S}
    ORDER BY bucket
    """,
    survey_ids=("§2.11", "W3"),
)
def st_lateness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-lateness histogram — the measurement that JUSTIFIES a
    watermark delay instead of guessing it: for each event, how far
    its event-time lags the stream's running high-water mark at its
    arrival position — under a deterministic bounded-disorder replay
    (day-batched, md5-shuffled within the day; the raw fixture is
    time-ordered and would measure zero) — bucketed to 10-minute bins. The tail of this
    histogram IS the `withWatermark` delay choice: a delay covering
    99.9% of mass drops 0.1% of events — exactly the trade
    `st_late_data_watermark_semantics` demonstrates downstream.
    Lateness in exact integer seconds (microsecond epoch arithmetic);
    the running high-water mark is ``global_running`` max — a
    range-partitioned two-phase prefix scan over the replay order,
    bit-identical to the global-window spelling the oracle keeps but
    with no single-partition stage — plus one map-combined groupBy."""
    from etl_generator_demo_spark.operators.analytics_ext import global_running

    ev = (
        t(spark, sf_dir, "events")
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"))
        .withColumn("_day", F.to_date("ts"))
        .withColumn("_shuf", F.md5(F.col("event_id").cast("string")))
    )
    curved = global_running(
        ev,
        [F.col("_day").asc(), F.col("_shuf").asc(), F.col("event_id").asc()],
        "ts",
        kind="max",
        out_col="_hw",
    )
    late_s = (
        (F.unix_micros(F.col("_hw")) - F.unix_micros(F.col("ts"))) / F.lit(1_000_000)
    ).cast("long")
    bucket = F.floor(late_s / LATENESS_BUCKET_S).cast("long")
    return (
        curved.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "bucket",
            (F.col("bucket") * LATENESS_BUCKET_S).cast("long").alias("bucket_lo_s"),
            "n_events",
        )
        .select("bucket", "bucket_lo_s", "n_events")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Dynamic-gap session windows — per-event-type inactivity thresholds
# ---------------------------------------------------------------------------
#: Inactivity gap (seconds) by event type: transient events close
#: sessions fast, high-intent events hold them open.
DYN_GAPS_S = {"error": 300, "click": 600, "view": 600, "signup": 1800, "purchase": 3600}


@register(
    "st_session_dynamic_gap",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id,
               EPOCH_US(CAST(ts AS TIMESTAMP)) AS s_us,
               EPOCH_US(CAST(ts AS TIMESTAMP)) + CAST(1000000 AS BIGINT) * CASE event_type
                   WHEN 'error' THEN {DYN_GAPS_S['error']}
                   WHEN 'click' THEN {DYN_GAPS_S['click']}
                   WHEN 'view' THEN {DYN_GAPS_S['view']}
                   WHEN 'signup' THEN {DYN_GAPS_S['signup']}
                   ELSE {DYN_GAPS_S['purchase']} END AS e_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, s_us, e_us, event_id,
               CASE WHEN MAX(e_us) OVER w IS NULL
                         OR s_us >= MAX(e_us) OVER w
                    THEN 1 ELSE 0 END AS new_session
        FROM iv
        WINDOW w AS (PARTITION BY user_id ORDER BY s_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    islands AS (
        SELECT user_id, s_us, e_us,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY s_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM flagged
    )
    SELECT user_id,
           MAKE_TIMESTAMP(MIN(s_us)) AS session_start,
           MAKE_TIMESTAMP(MAX(e_us)) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    survey_ids=("§2.11",),
)
def st_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows whose inactivity gap depends on the EVENT — a
    purchase holds the session open for an hour, an error closes it in
    five minutes (``F.session_window`` with a gap COLUMN, the dynamic
    form Structured Streaming executes with the same merging state
    store as the fixed-gap variant). Spark merges an event's
    [ts, ts+gap) into the session while it starts strictly before the
    current session end; the oracle replays exactly that with the
    running-MAX island idiom in microsecond integers (a new session
    starts when s_us >= max prior end). Same user-keyed single
    shuffle + skew posture as `st_session_windows`."""
    gap = F.concat(
        F.coalesce(
            F.element_at(
                F.create_map(
                    *[
                        x
                        for k, v in DYN_GAPS_S.items()
                        for x in (F.lit(k), F.lit(v))
                    ]
                ),
                F.col("event_type"),
            ),
            F.lit(DYN_GAPS_S["purchase"]),
        ).cast("string"),
        F.lit(" seconds"),
    )
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return (
        ev.groupBy("user_id", F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
