"""Randomized differential tests for the two streaming ledgers: on
seeded random batch plans, the Spark-built ledgers must equal a pure
Python recomputation of the pinned semantics (the CDC-fold
randomized-differential precedent).

- drop ledger: two-watermark model — late filter vs the 2-batch-lagged
  high water, eviction watermark = 1-lagged (strict < drop).
- join state ledger: wm_evict = min(side high waters, 1-batch lag) -
  delay; left rows live while ts >= wm - gap, right while ts >= wm
  (boundaries kept).
"""

from __future__ import annotations

import pytest

import datetime as dt
import random

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
DELAY_US = 10 * 60 * 1_000_000
GAP_US = 30 * 60 * 1_000_000


def _ts(minute: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minute)


def _us(minute: int) -> int:
    return int(
        _ts(minute).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )


def _py_drop_ledger(batches_us, delay_us):
    """batches_us: list of lists of ts_us. Returns [(n_events,
    wm_late, wm_evict, n_dropped)] per batch."""
    out, hws = [], []
    for b, evs in enumerate(batches_us):
        hw2 = max(hws[: b - 1], default=None) if b >= 2 else None
        hw1 = max(hws[:b], default=None) if b >= 1 else None
        wm_late = None if hw2 is None else hw2 - delay_us
        wm_evict = None if hw1 is None else hw1 - delay_us
        dropped = (
            0 if wm_late is None else sum(1 for t in evs if t < wm_late)
        )
        hws.append(max(evs))
        out.append((len(evs), wm_late, wm_evict, dropped))
    return out


def _py_state_ledger(lbatches, rbatches, gap_us, delay_us):
    """Returns [(batch_rank, state_left, state_right)] over the ranked
    union of non-empty batch ids."""
    ids = sorted(
        {b for b, evs in lbatches.items() if evs}
        | {b for b, evs in rbatches.items() if evs}
    )
    out = []
    for i, bid in enumerate(ids):
        prior = ids[:i]
        hl = [t for b in prior for t in lbatches.get(b, [])]
        hr = [t for b in prior for t in rbatches.get(b, [])]
        wm = min(max(hl), max(hr)) - delay_us if hl and hr else None
        upto = ids[: i + 1]
        left = [t for b in upto for t in lbatches.get(b, [])]
        right = [t for b in upto for t in rbatches.get(b, [])]
        sl = (
            len(left)
            if wm is None
            else sum(1 for t in left if t >= wm - gap_us)
        )
        sr = len(right) if wm is None else sum(1 for t in right if t >= wm)
        out.append((i, sl, sr))
    return out


def test_drop_ledger_random_differential(spark):
    """Equal-size random batches (the ledger batches by rank // size;
    events carry strictly increasing ids so arrival order is the
    generation order)."""
    from etl_generator_demo_spark.streaming.windows import (
        watermark_drop_ledger,
    )

    rng = random.Random(1207)
    for trial in range(4):
        nb, sz = rng.randint(3, 5), rng.randint(2, 4)
        batches_min = [
            [rng.randint(0, 400) for _ in range(sz)] for _ in range(nb)
        ]
        rows, eid = [], 0
        for evs in batches_min:
            for m in evs:
                rows.append((eid, _ts(m)))
                eid += 1
        ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
        led = watermark_drop_ledger(
            ev, [F.col("event_id").asc()], batch_size=sz, delay_us=DELAY_US
        ).collect()
        want = _py_drop_ledger(
            [[_us(m) for m in evs] for evs in batches_min], DELAY_US
        )
        got = [
            (r["n_events"], r["wm_late_us"], r["wm_evict_us"], r["n_dropped"])
            for r in led
        ]
        assert got == want, f"trial {trial}"


@pytest.mark.slow
def test_state_ledger_random_differential(spark):
    from etl_generator_demo_spark.streaming.joins import join_state_ledger

    rng = random.Random(4242)
    for trial in range(4):
        nb = rng.randint(3, 5)
        lb, rb, lrows, rrows = {}, {}, [], []
        for b in range(nb):
            lev = [_us(rng.randint(0, 400)) for _ in range(rng.randint(0, 3))]
            rev = [_us(rng.randint(0, 400)) for _ in range(rng.randint(0, 3))]
            lb[b], rb[b] = lev, rev
            lrows += [(b, t) for t in lev]
            rrows += [(b, t) for t in rev]
        if not lrows or not rrows:
            continue
        mk = lambda rows: spark.createDataFrame(
            rows, "batch_id long, ts_us long"
        )
        led = join_state_ledger(
            mk(lrows), mk(rrows), gap_us=GAP_US, delay_us=DELAY_US
        ).collect()
        want = _py_state_ledger(lb, rb, GAP_US, DELAY_US)
        got = [
            (r["ledger_batch"], r["state_left"], r["state_right"]) for r in led
        ]
        assert got == want, f"trial {trial}"
