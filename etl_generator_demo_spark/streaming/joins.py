"""Stream-stream interval join — SURVEY.md §2.11 [EXT].

The canonical Structured Streaming join: two event streams, equi-key
plus an event-time range condition. Written once as a batch-shaped
function (``attribution_join``) and reused verbatim under streaming —
Spark's stream-stream inner join requires exactly this shape
(watermarks on both sides + a time-bound join condition) to know when
buffered state can be evicted; the range bound here IS the state TTL.

At scale: state per key is bounded by (gap + watermark delay) of
events; the join shuffles both streams on user_id once. The batch
registration gives the DuckDB-checked semantics; the pytest runs the
same plan as a real two-stream join (file sources, availableNow) and
asserts stream ≡ batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register

ATTRIBUTION_GAP_MINUTES = 30


def attribution_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Purchases attributed to every click by the same user in the
    preceding 30 minutes. Works identically over batch DataFrames and
    watermarked streams (the time-range condition doubles as the
    streaming state-eviction bound)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    cond = (
        (p["user_id"] == c["c_user"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {ATTRIBUTION_GAP_MINUTES} MINUTES"))
    )
    return p.join(c, cond).select(
        "purchase_id", "user_id", "purchase_ts", "amount", "click_id", "click_ts"
    )


@register(
    "st_stream_stream_attribution",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           CAST(p.ts AS TIMESTAMP)  AS purchase_ts,
           p.value                  AS amount,
           c.event_id               AS click_id,
           CAST(c.ts AS TIMESTAMP)  AS click_ts
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
     AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL '{ATTRIBUTION_GAP_MINUTES} minutes'
    WHERE p.event_type = 'purchase'
    ORDER BY purchase_id, click_id
    """,
    survey_ids=("§2.11", "J7"),
)
def st_stream_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch registration of the stream-stream interval join (ALL
    qualifying clicks per purchase — the as-of join's keep-latest is
    the other discipline, ``j8_asof_purchase_last_click``). The pytest
    runs this exact plan as a two-stream watermarked join and asserts
    identical output."""
    ev = t(spark, sf_dir, "events")
    return attribution_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).orderBy("purchase_id", "click_id")


def streaming_exact_dedup(
    stream: DataFrame, key_cols: list[str], watermark_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Streaming tier of X1 exact dedup: keep the first arrival of each
    key, with the watermark bounding how long a key is remembered —
    ``dropDuplicatesWithinWatermark`` evicts key state once the
    watermark passes it, so state is O(keys per delay window), not
    O(all keys ever seen). Exactly the at-most-once admission an
    ingest pipeline puts in front of the corpus. Batch DataFrames get
    plain dropDuplicates (no watermark state to bound)."""
    if not stream.isStreaming:
        return stream.dropDuplicates(key_cols)
    if dict(stream.dtypes).get(watermark_col) == "timestamp_ntz":
        # withWatermark requires TIMESTAMP; NTZ sources are wall-clock
        # identical under the UTC session timezone
        stream = stream.withColumn(watermark_col, F.col(watermark_col).cast("timestamp"))
    return stream.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(key_cols)


# ---------------------------------------------------------------------------
# Stream-static enrichment join — the most common production streaming
# pattern: a fact stream joined to a slowly-changing dimension.
# ---------------------------------------------------------------------------
def enrich_purchases_with_segment(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Purchases enriched with the customer's market segment, rolled up
    to hourly revenue per segment. The same plan runs over a batch
    DataFrame (registered query) and a streaming `events` source: a
    stream-STATIC equi-join needs no watermark on the static side —
    Spark broadcasts/rescans the dimension per micro-batch, state-free
    (only the window aggregate holds state, bounded by the watermark).

    At 100 TB/day of events the dimension is the small side by orders
    of magnitude — broadcast, so the stream never shuffles for the
    join; the only stateful shuffle is the windowed aggregate."""
    purchases = events.filter(F.col("event_type") == "purchase")
    dim = customer.select("c_custkey", "c_mktsegment")
    return (
        purchases.join(F.broadcast(dim), purchases.user_id == dim.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("c_mktsegment").alias("segment"),
            "n_purchases",
            "revenue",
        )
    )


@register(
    "st_stream_static_enrich",
    oracle="""
    SELECT DATE_TRUNC('hour', CAST(e.ts AS TIMESTAMP)) AS window_start,
           c.c_mktsegment AS segment,
           COUNT(*) AS n_purchases,
           ROUND(SUM(e.value), 2) AS revenue
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    GROUP BY 1, 2
    ORDER BY window_start, segment
    """,
    survey_ids=("§2.11", "J1", "J6"),
)
def st_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch registration of the stream-static dimension join; the
    pytest runs the identical plan as a real watermarked stream
    (file source, availableNow) and asserts stream ≡ batch."""
    return enrich_purchases_with_segment(
        t(spark, sf_dir, "events"), t(spark, sf_dir, "customer")
    ).orderBy("window_start", "segment")


def attribution_join_outer(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER variant of :func:`attribution_join`: every purchase
    emits, unattributed ones with a null click. Same shape batch and
    streaming; under streaming the null-match rows are emitted by
    WATERMARK PASSAGE — a purchase's state row flushes with nulls only
    once the watermark clears its join window (purchase_ts), so the
    outer side can never emit a null for a click that might still
    arrive. The time bound is both the join predicate and the state
    TTL, exactly as in the inner form."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (p["user_id"] == c["c_user"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {ATTRIBUTION_GAP_MINUTES} MINUTES"))
    )
    return p.join(c, cond, "left_outer").select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        F.when(F.col("click_id").isNull(), 1).otherwise(0).cast("long").alias(
            "unattributed"
        ),
    )


@register(
    "st_stream_stream_left_outer",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           CAST(p.ts AS TIMESTAMP)  AS purchase_ts,
           c.event_id               AS click_id,
           CAST(c.ts AS TIMESTAMP)  AS click_ts,
           CAST(CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS unattributed
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
     AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
                                    - INTERVAL '{ATTRIBUTION_GAP_MINUTES} minutes'
    ORDER BY purchase_id, click_id
    """,
    survey_ids=("§2.11", "J4", "J7"),
)
def st_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch registration of the stream-stream LEFT OUTER interval
    join — the attribution query that also surfaces UNATTRIBUTED
    purchases (organic conversions), which the inner form silently
    drops. Streaming left-outer is the semantically hard case: Spark
    only allows it because the watermark + time-bound pair proves when
    "no matching click can still arrive", at which point the buffered
    purchase flushes with nulls — the pytest runs this exact plan as a
    real two-stream join and pins BOTH the emitted null-match set (=
    the batch result restricted to purchases the final watermark
    cleared) and the withheld tail (purchases inside the final
    watermark window emit nothing rather than a premature null)."""
    ev = t(spark, sf_dir, "events")
    return attribution_join_outer(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).orderBy("purchase_id", "click_id")


def attribution_join_full_outer(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """FULL OUTER variant — completes the outer-join matrix after the
    round-7 left-outer: every purchase emits (unattributed ones with a
    null click, as before) AND every click emits (ones that converted
    nothing with a null purchase — the abandoned-intent side the left
    form drops). Same shape batch and streaming; under streaming BOTH
    unmatched sides are emitted by watermark passage — a buffered row
    on either side flushes with nulls only once the watermark proves
    its join window empty, so neither side can invent an unmatched row
    early. The time bound is both the join predicate and the state TTL
    for both state stores."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (p["user_id"] == c["c_user"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {ATTRIBUTION_GAP_MINUTES} MINUTES"))
    )
    return p.join(c, cond, "full_outer").select(
        F.coalesce(F.col("user_id"), F.col("c_user")).alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        F.when(F.col("purchase_id").isNull(), F.lit("click_only"))
        .when(F.col("click_id").isNull(), F.lit("purchase_only"))
        .otherwise(F.lit("matched"))
        .alias("match_type"),
    )


@register(
    "st_stream_stream_full_outer",
    oracle=f"""
    SELECT COALESCE(p.user_id, c.user_id) AS user_id,
           p.event_id               AS purchase_id,
           CAST(p.ts AS TIMESTAMP)  AS purchase_ts,
           c.event_id               AS click_id,
           CAST(c.ts AS TIMESTAMP)  AS click_ts,
           CASE WHEN p.event_id IS NULL THEN 'click_only'
                WHEN c.event_id IS NULL THEN 'purchase_only'
                ELSE 'matched' END  AS match_type
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
     AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
                                    - INTERVAL '{ATTRIBUTION_GAP_MINUTES} minutes'
    ORDER BY user_id,
             purchase_id ASC NULLS FIRST,
             click_id ASC NULLS FIRST
    """,
    survey_ids=("§2.11", "J4", "J7"),
)
def st_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch registration of the stream-stream FULL OUTER interval
    join — attribution that keeps BOTH unmatched sides: organic
    purchases (null click) and non-converting clicks (null purchase).
    This is the last cell of the streaming outer-join matrix (inner r6,
    left r7). The ORDER BY pins NULLS FIRST explicitly on both
    nullable keys because the engines' ASC-null defaults differ (Spark
    NULLS FIRST, DuckDB NULLS LAST — the `o_topk_explicit_null_order`
    lesson). The pytest runs this exact plan as a real two-stream
    full-outer join and pins the three emitted row classes against the
    batch result under the final watermark."""
    ev = t(spark, sf_dir, "events")
    return attribution_join_full_outer(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).orderBy(
        "user_id",
        F.col("purchase_id").asc_nulls_first(),
        F.col("click_id").asc_nulls_first(),
    )


# ---------------------------------------------------------------------------
# stream-stream join STATE ledger (the join's memory bill, per batch)
# ---------------------------------------------------------------------------

#: Watermark delay for the state ledger (same 10 minutes the drop
#: ledger uses, justified by `st_lateness_histogram`).
JSL_DELAY_US = 10 * 60 * 1_000_000
#: Interval bound of the attribution join, in microseconds.
JSL_GAP_US = ATTRIBUTION_GAP_MINUTES * 60 * 1_000_000


def join_state_ledger(
    left: DataFrame,
    right: DataFrame,
    gap_us: int = JSL_GAP_US,
    delay_us: int = JSL_DELAY_US,
) -> DataFrame:
    """Per-microbatch state-store size of the stream-stream interval
    join ``left.ts <= right.ts <= left.ts + gap`` (both sides
    watermarked ``delay``) — the ``numRowsTotal`` trajectory a real
    StreamingSymmetricHashJoin reports, i.e. the join's memory bill.

    Inputs carry ``(batch_id long, ts_us long)`` with batch_id the
    arrival microbatch (not necessarily dense; the ledger ranks them).

    Model, pinned empirically against real execution by
    tests/test_join_state_ledger.py (exact-equality boundaries probed
    with planted rows AT the thresholds):

    - the query watermark is the 1-batch-lagged MIN of the two sides'
      event-time high waters, minus the delay:
      ``wm_evict(b) = min(hwL, hwR)(b-1) - delay`` — NULL until both
      sides have produced data;
    - a LEFT row is in state after batch b iff it arrived in a batch
      <= b and ``ts >= wm_evict(b) - gap`` (a click still matchable by
      future purchases; rows AT the boundary are KEPT). Spark
      implements this as an arrival-time store filter plus end-of-batch
      eviction — both collapse to the same predicate because the
      watermark is monotone;
    - a RIGHT row is in state iff arrived <= b and
      ``ts >= wm_evict(b)`` (purchases only wait for clicks at or
      before their own time). Mechanically Spark stores right rows
      first and evicts them at batch end (they count in
      ``numRowsRemoved``), which is why the ledger pins
      ``numRowsTotal`` and the watermark trajectory, NOT the
      mechanism-dependent removal counter.

    Construction is lattice-sized (one row per batch): per-batch
    rollups on each side, prefix max/sum via ``global_running`` (no
    single-partition window), and ONE bounded theta join of events
    against the |batches|-row watermark relation for the
    below-threshold counts (each event fans out to at most |batches|
    ledger rows — fixed, tiny). At 100 TB every stage is keyed or
    lattice-bounded."""
    from etl_generator_demo_spark.operators.analytics_ext import (
        global_row_number,
        global_running,
    )

    la = left.groupBy("batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_left"),
        F.max("ts_us").alias("hwl_us"),
    )
    ra = right.groupBy("batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_right"),
        F.max("ts_us").alias("hwr_us"),
    )
    lat = (
        la.join(ra, "batch_id", "full_outer")
        .select(
            "batch_id",
            F.coalesce("n_left", F.lit(0)).cast("long").alias("n_left"),
            F.coalesce("n_right", F.lit(0)).cast("long").alias("n_right"),
            "hwl_us",
            "hwr_us",
        )
    )
    lat, _n = global_row_number(lat, [F.col("batch_id").asc()], rn_col="_rn")
    lat = lat.withColumn("b", (F.col("_rn") - 1).cast("long")).drop("_rn")
    # inclusive prefix aggregates over the lattice, then a b+1 shift
    # for the 1-batch watermark lag (exclusive prefix without a window)
    runl = global_running(
        lat.filter(F.col("hwl_us").isNotNull()),
        [F.col("b").asc()], "hwl_us", kind="max", out_col="runl_us",
    ).select("b", "runl_us")
    runr = global_running(
        lat.filter(F.col("hwr_us").isNotNull()),
        [F.col("b").asc()], "hwr_us", kind="max", out_col="runr_us",
    ).select("b", "runr_us")
    cums = global_running(
        global_running(lat, [F.col("b").asc()], "n_left", kind="sum", out_col="cuml"),
        [F.col("b").asc()], "n_right", kind="sum", out_col="cumr",
    ).select("b", "batch_id", "n_left", "n_right", "cuml", "cumr")
    # NULL-safe lagged min: a side with no data yet pins the global
    # watermark at none (Spark holds the query watermark until every
    # watermark node has seen data). The prefix maxes exist only at
    # ranks where the side HAD data, but a high water persists across
    # empty batches, so forward-fill each side over the lattice with a
    # bounded theta join (|batches|^2 on the broadcast lattice — found
    # by the randomized differential test; the fixture never exposes a
    # one-side-empty day, a planted plan does)
    def _ffill(run, col):
        return (
            lat.select("b")
            .join(
                F.broadcast(run.select(F.col("b").alias("bp"), col)),
                F.col("bp") <= F.col("b") - 1,
            )
            .groupBy("b")
            .agg(F.max(col).alias(col))
        )

    lag = (
        _ffill(runl, "runl_us")
        .join(_ffill(runr, "runr_us"), "b")
        .select(
            "b",
            (F.least("runl_us", "runr_us") - F.lit(delay_us)).alias("wm_evict_us"),
        )
    )
    wm = cums.join(lag, "b", "left")
    # below-threshold counts: one bounded fan-out against the lattice
    wmx = F.broadcast(
        wm.filter(F.col("wm_evict_us").isNotNull()).select(
            F.col("b").alias("wb"), F.col("wm_evict_us").alias("w_us")
        )
    )
    lb = left.join(
        F.broadcast(lat.select("batch_id", F.col("b").alias("ab"))), "batch_id"
    )
    rb = right.join(
        F.broadcast(lat.select("batch_id", F.col("b").alias("ab"))), "batch_id"
    )
    bel_l = (
        lb.join(wmx, (F.col("ab") <= F.col("wb")) & (F.col("ts_us") < F.col("w_us") - gap_us))
        .groupBy(F.col("wb").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("below_l"))
    )
    bel_r = (
        rb.join(wmx, (F.col("ab") <= F.col("wb")) & (F.col("ts_us") < F.col("w_us")))
        .groupBy(F.col("wb").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("below_r"))
    )
    out = (
        wm.join(bel_l, "b", "left")
        .join(bel_r, "b", "left")
        .select(
            F.col("b").alias("ledger_batch"),
            "batch_id",
            "n_left",
            "n_right",
            "wm_evict_us",
            (F.col("cuml") - F.coalesce("below_l", F.lit(0))).cast("long").alias("state_left"),
            (F.col("cumr") - F.coalesce("below_r", F.lit(0))).cast("long").alias("state_right"),
        )
        .withColumn("state_total", (F.col("state_left") + F.col("state_right")).cast("long"))
        .orderBy("ledger_batch")
    )
    return out


@register(
    "st_join_state_ledger",
    oracle=f"""
    WITH ev AS (
        SELECT event_type,
               EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    lat AS (
        SELECT day,
               ROW_NUMBER() OVER (ORDER BY day) - 1 AS b,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                    AS BIGINT) AS n_left,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS n_right,
               MAX(ts_us) FILTER (WHERE event_type = 'click') AS hwl_us,
               MAX(ts_us) FILTER (WHERE event_type = 'purchase') AS hwr_us
        FROM ev GROUP BY day
    ),
    run AS (
        SELECT b, day, n_left, n_right,
               MAX(hwl_us) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND 1 PRECEDING) AS runl1,
               MAX(hwr_us) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND 1 PRECEDING) AS runr1,
               SUM(n_left) OVER (ORDER BY b) AS cuml,
               SUM(n_right) OVER (ORDER BY b) AS cumr
        FROM lat
    ),
    wm AS (
        SELECT b, day, n_left, n_right, cuml, cumr,
               CASE WHEN runl1 IS NOT NULL AND runr1 IS NOT NULL
                    THEN LEAST(runl1, runr1) - {JSL_DELAY_US}
               END AS wm_evict_us
        FROM wm_src
    ),
    bel AS (
        SELECT w.b,
               CAST(COUNT(*) FILTER (WHERE e.event_type = 'click'
                    AND e.ts_us < w.wm_evict_us - {JSL_GAP_US})
                    AS BIGINT) AS below_l,
               CAST(COUNT(*) FILTER (WHERE e.event_type = 'purchase'
                    AND e.ts_us < w.wm_evict_us) AS BIGINT) AS below_r
        FROM wm w JOIN ev e ON e.day <= w.day
        WHERE w.wm_evict_us IS NOT NULL
        GROUP BY w.b
    )
    SELECT CAST(w.b AS BIGINT) AS ledger_batch,
           w.n_left AS n_clicks, w.n_right AS n_purchases,
           CAST(w.wm_evict_us AS BIGINT) AS wm_evict_us,
           CAST(w.cuml - COALESCE(bel.below_l, 0) AS BIGINT) AS state_left,
           CAST(w.cumr - COALESCE(bel.below_r, 0) AS BIGINT) AS state_right,
           CAST(w.cuml - COALESCE(bel.below_l, 0)
                + w.cumr - COALESCE(bel.below_r, 0) AS BIGINT) AS state_total
    FROM wm w LEFT JOIN bel ON bel.b = w.b
    ORDER BY w.b
    """.replace("FROM wm_src", "FROM run"),
    survey_ids=("§2.11", "J7", "A1", "W3"),
)
def st_join_state_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream join's memory bill, per microbatch: replay the
    attribution join (clicks x purchases, 30m interval,
    10m watermarks) in day-sized microbatches and report the exact
    state-store row counts a real StreamingSymmetricHashJoin holds —
    per side and total — plus the eviction-watermark trajectory. The
    drop ledger prices what the watermark THROWS AWAY; this one prices
    what the join must KEEP: clicks live (gap + delay) past the
    watermark, purchases live (delay) — the sizing rule that decides
    whether a 100 TB/day join fits executor state stores.
    Semantics pinned against real execution (boundary rows planted AT
    the thresholds) by tests/test_join_state_ledger.py."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("ts").cast("timestamp").cast("date").alias("day"),
    )
    mk = lambda typ: ev.filter(F.col("event_type") == typ).select(
        F.col("day").alias("batch_id"), "ts_us"
    )
    led = join_state_ledger(mk("click"), mk("purchase"))
    return led.select(
        "ledger_batch",
        F.col("n_left").alias("n_clicks"),
        F.col("n_right").alias("n_purchases"),
        "wm_evict_us",
        "state_left",
        "state_right",
        "state_total",
    ).orderBy("ledger_batch")


#: Watermark delays swept for the join-state knob curve (minutes).
JSL_DELAY_SWEEP_MIN = (5, 10, 30, 60)


def _jsl_arm_sql(delay_min: int, p: str) -> str:
    """One namespaced copy of the state-ledger CTE chain at a given
    delay, reduced to its per-delay aggregate row."""
    delay_us = delay_min * 60 * 1_000_000
    return f"""
    {p}lat AS (
        SELECT day,
               ROW_NUMBER() OVER (ORDER BY day) - 1 AS b,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                    AS BIGINT) AS n_left,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS n_right,
               MAX(ts_us) FILTER (WHERE event_type = 'click') AS hwl_us,
               MAX(ts_us) FILTER (WHERE event_type = 'purchase') AS hwr_us
        FROM ev GROUP BY day
    ),
    {p}run AS (
        SELECT b, day, n_left, n_right,
               MAX(hwl_us) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND 1 PRECEDING) AS runl1,
               MAX(hwr_us) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND 1 PRECEDING) AS runr1,
               SUM(n_left) OVER (ORDER BY b) AS cuml,
               SUM(n_right) OVER (ORDER BY b) AS cumr
        FROM {p}lat
    ),
    {p}wm AS (
        SELECT b, day, cuml, cumr,
               CASE WHEN runl1 IS NOT NULL AND runr1 IS NOT NULL
                    THEN LEAST(runl1, runr1) - {delay_us}
               END AS wm_evict_us
        FROM {p}run
    ),
    {p}bel AS (
        SELECT w.b,
               CAST(COUNT(*) FILTER (WHERE e.event_type = 'click'
                    AND e.ts_us < w.wm_evict_us - {JSL_GAP_US})
                    AS BIGINT) AS below_l,
               CAST(COUNT(*) FILTER (WHERE e.event_type = 'purchase'
                    AND e.ts_us < w.wm_evict_us) AS BIGINT) AS below_r
        FROM {p}wm w JOIN ev e ON e.day <= w.day
        WHERE w.wm_evict_us IS NOT NULL
        GROUP BY w.b
    ),
    {p}st AS (
        SELECT w.b,
               w.cuml - COALESCE(l.below_l, 0)
               + w.cumr - COALESCE(l.below_r, 0) AS st_total
        FROM {p}wm w LEFT JOIN {p}bel l ON l.b = w.b
    )"""


def _jsl_sweep_oracle() -> str:
    chains, arms = [], []
    for i, d in enumerate(JSL_DELAY_SWEEP_MIN):
        p = f"d{i}_"
        chains.append(_jsl_arm_sql(d, p))
        arms.append(f"""
        SELECT CAST({d} AS BIGINT) AS delay_min,
               CAST(COUNT(*) AS BIGINT) AS n_batches,
               CAST(MAX(st_total) AS BIGINT) AS peak_state_total,
               CAST(SUM(st_total) // COUNT(*) AS BIGINT)
                   AS mean_state_total
        FROM {p}st""")
    union = "\n        UNION ALL\n".join(arms)
    return f"""
    WITH ev AS (
        SELECT event_type,
               EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    {','.join(chains)}
    SELECT * FROM ({union}) ORDER BY delay_min
    """


@register(
    "st_join_state_delay_sweep",
    oracle=_jsl_sweep_oracle(),
    survey_ids=("§2.11", "J7", "A1", "W3"),
)
def st_join_state_delay_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-state ledger's knob curve: peak and mean state-store
    size of the stream-stream attribution join at watermark delays of
    5/10/30/60 minutes — the memory side of the delay trade whose
    completeness side `st_watermark_delay_sweep` already prices (more
    delay = fewer late drops but more rows buffered: left rows live
    gap+delay past the watermark, right rows live delay). Reading the
    two curves together is how the delay is actually chosen.

    Four lattice-sized ledger evaluations (the per-day replay is
    shared; each delay shifts only the eviction threshold), aggregated
    to one row per delay. The oracle runs four namespaced copies of
    the ledger chain — the `x3_kmeans_k_sweep` pattern."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("ts").cast("timestamp").cast("date").alias("day"),
    )
    mk = lambda typ: ev.filter(F.col("event_type") == typ).select(
        F.col("day").alias("batch_id"), "ts_us"
    )
    parts = []
    for d in JSL_DELAY_SWEEP_MIN:
        led = join_state_ledger(
            mk("click"), mk("purchase"), delay_us=d * 60 * 1_000_000
        )
        parts.append(
            led.agg(
                F.lit(d).cast("long").alias("delay_min"),
                F.count(F.lit(1)).cast("long").alias("n_batches"),
                F.max("state_total").cast("long").alias("peak_state_total"),
                F.expr("CAST(SUM(state_total) div COUNT(1) AS LONG)").alias(
                    "mean_state_total"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("delay_min")
