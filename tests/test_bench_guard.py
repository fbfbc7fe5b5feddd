"""bench.py contamination guard (round 8).

BENCH_r07 committed a box-noise run ~21% above a quiet re-run; the
guard makes that failure mode visible (loadavg in the artifact) and
self-healing (min-across-passes retry when the shared-query total
deviates upward >15% from the last committed record). These tests pin
the record-discovery helper — the retry loop itself is three lines of
arithmetic exercised by the driver's real per-round run.
"""

import json

import bench


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def test_last_committed_reads_raw_bench_line(tmp_path):
    _write(
        tmp_path,
        "BENCH_r03.json",
        {"metric": "m", "value": 2.0, "sf": 0.1, "queries": {"q1": 2.0}},
    )
    name, q, calib = bench._last_committed(0.1, here=str(tmp_path))
    assert name == "BENCH_r03.json" and q == {"q1": 2.0}
    assert calib is None


def test_last_committed_reads_driver_wrapper_and_picks_newest(tmp_path):
    # the driver wraps the bench JSON line under "parsed" alongside
    # n/rc/cpus/sf metadata (observed in the committed BENCH_r07.json)
    _write(
        tmp_path,
        "BENCH_r02.json",
        {"metric": "m", "sf": 0.1, "queries": {"q1": 9.0}},
    )
    _write(
        tmp_path,
        "BENCH_r10.json",
        {
            "n": 10,
            "rc": 0,
            "sf": 0.1,
            "parsed": {"sf": 0.1, "queries": {"q1": 1.5, "q2": 0.5}},
        },
    )
    name, q, calib = bench._last_committed(0.1, here=str(tmp_path))
    assert name == "BENCH_r10.json" and q == {"q1": 1.5, "q2": 0.5}
    assert calib is None


def test_last_committed_rejects_sf_mismatch_and_absence(tmp_path):
    assert bench._last_committed(0.1, here=str(tmp_path)) is None
    _write(
        tmp_path,
        "BENCH_r01.json",
        {"metric": "m", "sf": 0.01, "queries": {"q1": 1.0}},
    )
    assert bench._last_committed(0.1, here=str(tmp_path)) is None


def test_last_committed_survives_garbage(tmp_path):
    (tmp_path / "BENCH_r05.json").write_text("{not json")
    assert bench._last_committed(0.1, here=str(tmp_path)) is None


def test_idle_gate_passes_quiet_box(monkeypatch):
    """Threshold above any possible loadavg -> no wait, not timed out."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_IDLE_LOAD", "1e9")
    gate = bench._wait_for_idle()
    assert gate["waited_sec"] == 0.0 and gate["timed_out"] is False
    assert gate["threshold"] == 1e9


def test_idle_gate_bounded_wait_flags_timeout(monkeypatch):
    """A permanently busy box (threshold 0 can never be met) degrades
    to a flagged record after the bounded wait instead of hanging."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_IDLE_LOAD", "0")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_IDLE_WAIT", "0")
    gate = bench._wait_for_idle()
    assert gate["timed_out"] is True and gate["waited_sec"] == 0.0


def test_min_passes_policy_is_at_least_two(monkeypatch):
    """BENCH_r08 shipped passes=1; the policy floor is 2 even when the
    env var asks for fewer. Tested as function return values (r9
    advice: not inspect.getsource substrings)."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_PASSES", "1")
    assert bench._resolve_passes() == 2
    monkeypatch.setenv("SPARK_GRAFT_BENCH_PASSES", "5")
    assert bench._resolve_passes() == 5
    monkeypatch.delenv("SPARK_GRAFT_BENCH_PASSES", raising=False)
    assert bench._resolve_passes() == 2


def test_noise_ratio_policy(monkeypatch):
    """Default retry threshold is 8% upward deviation; env override
    is honored."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_NOISE_RATIO", raising=False)
    assert bench._resolve_noise_ratio() == 1.08
    monkeypatch.setenv("SPARK_GRAFT_BENCH_NOISE_RATIO", "1.5")
    assert bench._resolve_noise_ratio() == 1.5


def test_repo_record_is_discoverable():
    """The real repo's newest BENCH_r*.json must parse — if the driver
    changes its wrapper shape the guard silently disarms, which this
    catches."""
    found = bench._last_committed(0.1)
    assert found is not None
    name, q, _calib = found
    assert q and all(isinstance(v, float) for v in q.values())


def test_compact_stdout_line_degrades_to_totals():
    """Stage-2 guard: when the per-query dict itself outgrows the
    driver tail, the line degrades to totals (BENCH_LOCAL.json keeps
    the full record) instead of reintroducing the BENCH_r09
    parsed-null failure."""
    import json

    import bench

    big = {
        "metric": "headline_total_sec",
        "value": 1.0,
        "unit": "sec",
        "queries": {f"q{i:03d}_padded_query_name_xxxx": 1.234 for i in range(120)},
        "sf": 0.1,
        "passes": 2,
        "load_start_5m": 0.1,
        "idle_waited_sec": 5,
        "idle_timed_out": False,
        "ratio_vs_prev": 1.0,
        "noise_suspect": False,
    }
    line = bench._compact_stdout_line(dict(big))
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["value"] == 1.0  # totals survive
    assert parsed["queries"] == {"_dropped": "see BENCH_LOCAL.json"}
    # small records pass through untouched
    small = {"metric": "m", "value": 1.0, "unit": "sec",
             "queries": {"q1": 1.0}, "sf": 0.1, "ratio_vs_prev": 1.0}
    assert json.loads(bench._compact_stdout_line(dict(small)))["queries"] == {
        "q1": 1.0
    }


def test_calibration_task_runs_and_is_positive(spark):
    """The host-speed calibration job must run on a vanilla session
    and return a positive wall-clock — it is data-independent, so any
    environment that can run Spark at all can run it."""
    import bench

    sec = bench._calibration_sec(spark)
    assert isinstance(sec, float) and sec > 0


def test_last_committed_carries_calibration(tmp_path):
    """Round-14: the guard normalizes ratio_vs_prev by the prior
    record's calibration when present (driver wrapper shape too)."""
    _write(
        tmp_path,
        "BENCH_r13.json",
        {
            "n": 10,
            "rc": 0,
            "parsed": {
                "sf": 0.1,
                "queries": {"q1": 1.0},
                "calibration_sec": 0.62,
            },
        },
    )
    name, q, calib = bench._last_committed(0.1, here=str(tmp_path))
    assert name == "BENCH_r13.json" and calib == 0.62
