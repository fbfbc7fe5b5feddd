"""Planted hot-user skew proof for the per-user queries (VERDICT r2 #6).

`x4_funnel_conversion` and `st_session_windows` both key on user_id;
one viral user must not turn an exchange into a straggler. These tests
plant a user carrying ~1000x the events of everyone else and assert
(a) exact results, (b) the plan feature that absorbs the skew:
map-side partial aggregation for the funnel stages, and local session
pre-merge (`spark.sql.sessionWindow.merge.sessions.in.local.partition`)
for session windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_HOT = 30_000
N_COLD = 50
EPOCH = 1_704_067_200  # 2024-01-01 00:00:00 UTC


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _hot_funnel_events(spark):
    """User 1: N_HOT events 2s apart cycling view->click->purchase
    (qualifies every stage). Users 1000..: one view each."""
    hot = spark.range(N_HOT).select(
        F.lit(1).alias("user_id"),
        F.timestamp_seconds(F.lit(EPOCH) + F.col("id") * 2).alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
    )
    cold = spark.range(N_COLD).select(
        (F.col("id") + 1000).alias("user_id"),
        F.timestamp_seconds(F.lit(EPOCH) + F.col("id")).alias("ts"),
        F.lit("view").alias("event_type"),
    )
    return hot.unionByName(cold)


class TestFunnelHotUser:
    def test_partial_agg_collapses_hot_user_before_shuffle(self, spark):
        from etl_generator_demo_spark.operators.analytics_ext import funnel_counts

        out = funnel_counts(_hot_funnel_events(spark))
        plan = _plan(out)
        # map-side combine: a hot user's events become one row per map
        # partition BEFORE the exchange — the skew never crosses a shuffle
        assert "partial_min" in plan
        assert "partial_count" in plan

    def test_exact_counts_with_hot_user(self, spark):
        from etl_generator_demo_spark.operators.analytics_ext import funnel_counts

        row = funnel_counts(_hot_funnel_events(spark)).first()
        # hot user + every cold user viewed; only the hot user clicked
        # after a view and purchased after that click
        assert row["n_view"] == 1 + N_COLD
        assert row["n_view_click"] == 1
        assert row["n_view_click_purchase"] == 1


class TestSessionWindowsHotUser:
    def _events(self, spark):
        """Hot user: N_HOT events 2s apart in 3 bursts separated by
        >30min (3 sessions). Cold users: 2 events 1s apart (1 session)."""
        burst = N_HOT // 3
        hot = spark.range(N_HOT).select(
            F.lit(1).alias("user_id"),
            F.timestamp_seconds(
                F.lit(EPOCH)
                + F.col("id") * 2
                + (F.col("id") / burst).cast("long") * 7200
            ).alias("ts"),
        )
        cold = spark.range(N_COLD).crossJoin(
            spark.range(2).withColumnRenamed("id", "k")
        ).select(
            (F.col("id") + 1000).alias("user_id"),
            F.timestamp_seconds(F.lit(EPOCH) + F.col("id") * 100 + F.col("k")).alias(
                "ts"
            ),
        )
        return hot.unionByName(cold)

    def _expect(self):
        burst = N_HOT // 3
        hot_sessions = [(1, burst), (1, burst), (1, N_HOT - 2 * burst)]
        cold_sessions = [(1000 + i, 2) for i in range(N_COLD)]
        return sorted(hot_sessions + cold_sessions)

    def test_exact_sessions_with_hot_user(self, spark):
        from etl_generator_demo_spark.streaming.windows import user_sessions

        got = user_sessions(self._events(spark)).collect()
        assert sorted((r["user_id"], r["n_events"]) for r in got) == self._expect()

    def test_salted_sessions_spread_hot_user_and_match(self, spark):
        """The skew mitigation: two-phase salted sessionization
        shuffles phase 1 on (user_id, time-bucket) — the hot user's
        events spread across as many tasks as buckets they span — and
        phase 2 merges boundary sessions over session summaries.
        Result-identical to plain session_window on the same data."""
        from etl_generator_demo_spark.streaming.windows import user_sessions_salted

        # 1-hour salt buckets: the hot user's 3 bursts span many buckets
        out = user_sessions_salted(self._events(spark), bucket_secs=3600)
        plan = _plan(out)
        # phase-1 exchange is keyed by the salt too (Catalyst extracts
        # the bucket expression as _groupingexpression), not user_id alone
        import re

        assert re.search(
            r"Exchange hashpartitioning\(user_id#\d+L?, _groupingexpression", plan
        )
        got = sorted((r["user_id"], r["n_events"]) for r in out.collect())
        assert got == self._expect()

    def test_salted_sessions_match_plain_on_fixture(self, spark, sf_dir):
        """Cross-validation on the real events fixture: salted ≡ plain
        for every (user, session_start, n_events), including sessions
        that straddle a salt-bucket boundary (small bucket forces
        straddles)."""
        from etl_generator_demo_spark.operators.relational import t
        from etl_generator_demo_spark.streaming.windows import (
            user_sessions,
            user_sessions_salted,
        )

        ev = t(spark, str(sf_dir), "events").select("user_id", "ts")
        plain = sorted(map(tuple, user_sessions(ev).collect()))
        salted = sorted(map(tuple, user_sessions_salted(ev, bucket_secs=900).collect()))
        assert salted == plain
