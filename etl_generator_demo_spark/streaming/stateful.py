"""Custom stateful streaming operator — `applyInPandasWithState`
(SURVEY §2.11 [EXT]; the north-star's "custom stateful operators").

`running_user_stats` maintains per-user running aggregates (event
count, value sum, last-seen timestamp) across micro-batches with an
event-time timeout: users idle past the timeout are finalized and
evicted from the state store, which is what bounds state size on an
unbounded 100 TB/day stream (without eviction, per-key state grows
forever).

The update function is self-contained (local imports, no module
globals) — executor Python workers unpickle it without this package
on sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("last_seen", TimestampType(), True),
        StructField("status", StringType(), True),  # active | finalized
    ]
)

_STATE_SCHEMA = "n BIGINT, total DOUBLE, last_seen TIMESTAMP"


def running_user_stats(
    events: DataFrame, timeout_minutes: int = 30
) -> DataFrame:
    """Streaming per-user running stats with idle-timeout finalization.

    `events` must be a STREAMING DataFrame with (user_id, ts, value)
    and a watermark on ts (required for EventTimeTimeout).
    """

    def update(key, pdfs, state):
        import pandas as _pd

        (user_id,) = key
        if state.hasTimedOut:
            n, total, last_seen = state.get
            state.remove()
            yield _pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "last_seen": [last_seen],
                    "status": ["finalized"],
                }
            )
            return

        n, total, last_seen = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            mx = mx.to_pydatetime() if hasattr(mx, "to_pydatetime") else mx
            last_seen = mx if last_seen is None else max(last_seen, mx)
        state.update((n, float(total), last_seen))
        # finalize this user if idle past the timeout (event-time based).
        # Clamp to the current watermark: when replaying history the
        # watermark can already be past last_seen+timeout, and Spark
        # rejects timeouts earlier than the watermark.
        ms = int(timeout_minutes) * 60 * 1000
        target = int(last_seen.timestamp() * 1000) + ms
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(target, wm + 60_000))
        yield _pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "last_seen": [last_seen],
                "status": ["active"],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="EventTimeTimeout",
    )
