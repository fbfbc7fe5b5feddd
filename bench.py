"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line to stdout:
    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}
Everything else goes to stderr.

Headline set: one representative per operator family — scan+agg, the
flagship join, star join, 4-table join, window top-k, sessionization,
MinHash LSH, exact Jaccard, cosine top-k, ANN, as-of join, JSON agg.
Results are fully materialized via collect() (row counts are small by
construction; the driver-side edge is the only place this engine ever
collects).

ANN honesty: the benched ANN entries are the PROBE-ONLY paths
(x3_ann_lsh_probe is the registered hash-exact probe; x3_ann_ivf_probe
is the same probe the registered x3_ann_ivf_topk verdict uses, timed
without the brute-force recall side). Round 3 benched the bounded-error
verdict queries, which compute the exact full-scan answer inside the
query — correctness-gold but a dishonest ANN latency number.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q2_revenue_by_segment",
    "q3_revenue_by_nation",
    "w4_top3_orders_per_customer",
    "st_session_windows",
    "x2_minhash_lsh_pairs",
    "x2_ngram_jaccard_pairs",
    "x3_cosine_topk",
    "x3_ann_lsh_probe",
    "x3_neardup_lsh_bucketed",
    "x2_dedup_clusters",
    "j8_asof_purchase_last_click",
    "f_json_struct_agg",
    # round-4 operators: substring-dup coverage + bigram-LM quality
    "x2_shingle_dup_coverage",
    "x4_bigram_lm_quality",
    # round-4 additions: BM25 retrieval + SemDeDup (k-means inside)
    "x4_bm25_topk",
    # round-4 late addition: PQ compression (triangle census is
    # registry-gated but not benched: the sf0.1 co-purchase graph's
    # wedge stage is a deliberate O(m^1.5) census, not a latency path)
    "x3_pq_codes",
    # late round-4: d^2-bounded Arrow Gram partials (covariance) —
    # the shuffle-volume-independent partial-aggregation pattern
    # round-7: the Q21 analogue (EXISTS pair rewritten as one
    # per-order aggregate — the heaviest new fact-join shape) and the
    # coverage curve (global_row_number + global_running composition)
    "q21_suppliers_kept_waiting",
    "x4_ngram_coverage_topk",
    # round-9 headliners: exact substring dedup (winnowing candidates
    # + diagonal-run verify — the Lee et al. ExactSubstr path), the
    # relational BPE trainer (3 vocab-keyed merge rounds), RRF hybrid
    # retrieval (BM25 + pruned LSH probe + fusion), and exact WCC
    # (pointer-doubling fixpoint on the thresholded graph)
    "x4_bpe_merge_steps",
    "x4_rrf_hybrid_topk",
    # round-10 headliners: tokenizer APPLICATION (the vocab-join
    # serving path next to the merge trainer above), HITS (the
    # iterative bipartite family's latency), and the Jaccard
    # threshold sweep (one inverted-index pair join read four times —
    # the tuning-curve family's cost shape)
    "g_hits_bipartite",
    "x2_jaccard_threshold_sweep",
    # round-11 headliners: the mergeable quantile sketch (the A3
    # serving tier's latency), CDC apply (one keyed shuffle folding a
    # change log to a snapshot), and the packing context sweep (one
    # prefix-sum scan exploded x4 — the tuning-curve cost shape)
    "a_hdr_quantile_sketch",
    "d_cdc_apply_snapshot",
    "x4_packing_context_sweep",
    # round-12 headliners: the ExactSubstr removal->rebuild pipeline
    # (replaces the retired spans query as the substring-dedup
    # representative — it CONTAINS the spans-policy work plus the
    # rebuild), DSIR selection (two LM rollups + b-keyed join), the
    # watermark drop ledger (global row_number + batch-lattice joins),
    # the Matryoshka recall sweep (NQ x dims brute-force eval), and
    # the cross-modal CLIP gate (two towers joined on media_id)
    "x2_removal_rematerialize",
    "x4_dsir_importance_topk",
    "st_watermark_drop_ledger",
    "x3_matryoshka_prefix_recall",
    "x5_crossmodal_clip_gate",
    # round-13 headliners: the bin-decomposed RANGE-frame band count
    # (the de-globalized W3 spelling — watch the 8-exchange plan stay
    # cheap), the pre-filter IVF probe (the filtered-ANN serving path:
    # pruned scan + pushed predicate + bounded rank), and the composed
    # three-tier decontamination funnel (exact/fuzzy/semantic gates +
    # anti-join chain — the contamination ladder's steady-state cost)
    "w3_range_frame_price_band",
    "x3_filtered_topk_prefilter",
    "x4_decontam_funnel",
    # round-14 headliners: the exact index-served semantic decontam
    # tier (ball-bound DPP-pruned join — the serving path the funnel
    # now composes; watch it stay ~1s while the funnel drops), and
    # the transaction-log time-travel pipeline (five optimistic
    # commits + five snapshot reads — the DML family's first benched
    # representative; its cost IS the commit protocol's write path)
    "x3_semantic_decontam_indexed",
    "d_txlog_time_travel",
    # round-15 headliner: exactly-once streaming commits into the
    # delta-manifest/checkpoint txlog (8 foreachBatch writes, 4
    # replays absorbed via the per-manifest txn high-water map) —
    # prices the commit protocol's streaming write path the way
    # d_txlog_time_travel prices its batch DML path
    "st_txlog_exactly_once",
    # round-16 headliner: ball-bound-pruned radius search over the
    # derived clustered corpus (the geometry where IVF pruning pays) —
    # warm cost is the pruned scan + 1-row broadcast; watch it stay
    # near-flat while the corpus grows (lists_read is geometry-, not
    # N-dependent; first touch per fixture pays the index build)
    "x3_radius_search_clustered",
]

#: ROTATION POLICY (round-12, r11 verdict item 7). The primary
#: HEADLINE list is the regression canary the driver records every
#: round; its wall total must stay <= ~40 s at sf0.1 or per-query
#: regressions drown in the total. A headliner RETIRES here when ALL
#: of: (a) flat across the last three committed records (max/min <=
#: 1.25 on shared rows), (b) tracked by tools/scaling_probe.py (in
#: QUERIES, or PROBE_EXCLUDED with a documented data-shape reason), and (c) its operator family
#: keeps a representative in HEADLINE. Retired queries are still timed
#: — set SPARK_GRAFT_BENCH_RETIRED=1 — into BENCH_LOCAL.json's
#: "retired" block, so their history continues without diluting the
#: primary signal. Initial rotation (r10/r11 stability, all probed):
RETIRED = [
    "g_wcc_components",        # 7.77/8.15s flat; graph rep: g_hits_bipartite
    "x2_exact_substr_spans",   # 2.75/2.82s; rep: x2_removal_rematerialize
    "x4_bpe_encode_corpus",    # 1.92/1.86s; BPE rep: x4_bpe_merge_steps
    "x3_semdedup_keep",        # 1.31/1.26s; x3 reps: cosine/ann/neardup
    "x2_dedup_incremental",    # 0.76/0.75s; x2 reps: minhash/clusters
    "q4_local_supplier_volume",  # 0.80/0.77s; star-join reps: q2/q3/q21
    "x3_dim_covariance",       # 0.39/0.39s; Gram-partial shape probed
    "x3_ann_ivf_probe",        # 0.37/0.35s; ANN rep: x3_ann_lsh_probe
]


# ---- contamination guard (round-8, after the BENCH_r07 incident: a
# whole-box cross-process load shift inflated every query 1.2-1.7x and
# the noisy run became the committed record). The guard (a) records
# os.getloadavg() so a hot box is visible in the artifact, and
# (b) compares the shared-query total against the most recent committed
# BENCH_r*.json at the same SF — an UPWARD deviation >15% triggers a
# full re-pass (queries keep their min across passes, so a retry can
# only improve the record), up to SPARK_GRAFT_BENCH_RETRIES extra
# passes. If the deviation persists, the record is still emitted but
# carries "noise_suspect": true — a flagged artifact, never silent.
def _last_committed(cur_sf, here: str | None = None):
    """(basename, {query: sec}, calibration_sec|None) of the newest
    committed bench record matching ``cur_sf``, or None. Prefers
    BENCH_LOCAL.json (the full sidecar bench.py writes — immune to the
    driver's stdout-tail truncation that left BENCH_r09.json with
    "parsed": null), then falls back to the newest BENCH_r*.json,
    understanding both the raw bench line and the driver's wrapper
    (bench JSON under ``parsed``). The calibration value (round-14,
    r13 verdict item 7) lets the noise guard normalize the cross-round
    ratio by the box's measured speed instead of flagging every
    whole-box drift as a regression."""
    here = here or os.path.dirname(os.path.abspath(__file__))
    local = os.path.join(here, "BENCH_LOCAL.json")
    if os.path.exists(local):
        try:
            with open(local) as f:
                rec = json.load(f)
            if rec.get("sf") == cur_sf and "queries" in rec:
                return (
                    "BENCH_LOCAL.json",
                    {k: float(v) for k, v in rec["queries"].items()},
                    rec.get("calibration_sec"),
                )
        except Exception:
            pass
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    if best is None:
        return None
    try:
        with open(best[1]) as f:
            rec = json.load(f)
        node = rec if isinstance(rec, dict) else {}
        if "queries" not in node and isinstance(rec, dict):
            for v in rec.values():
                if isinstance(v, dict) and "queries" in v:
                    node = v
                    break
        if node.get("sf") != cur_sf or "queries" not in node:
            return None
        return (
            os.path.basename(best[1]),
            {k: float(v) for k, v in node["queries"].items()},
            node.get("calibration_sec"),
        )
    except Exception:
        return None


def _wait_for_idle():
    """Idle gate (round-9, after BENCH_r08 started at loadavg 7.24 and
    the 15% ratio gate let an ~11%-inflated record through): refuse to
    START timing while the 5-min loadavg says another workload owns
    the box. Polls until the 1- AND 5-min loadavg drop under
    SPARK_GRAFT_BENCH_IDLE_LOAD (default 4.0 ≈ 2× a quiet-box bound of
    ~2 observed across r1-r8 artifacts), bounded by
    SPARK_GRAFT_BENCH_IDLE_WAIT seconds (default 600) so a permanently
    busy box degrades to a flagged record instead of a hang. Runs
    BEFORE the SparkSession exists, so our own work never trips it.
    Returns the artifact field."""
    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_LOAD", "4.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT", "600"))
    start = [round(x, 2) for x in os.getloadavg()]
    waited = 0.0
    while True:
        one, five, _ = os.getloadavg()
        if max(one, five) <= threshold or waited >= max_wait:
            break
        print(
            f"-- idle gate: loadavg {one:.2f}/{five:.2f} > {threshold}; "
            f"waiting ({waited:.0f}s/{max_wait:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(15.0)
        waited += 15.0
    end = os.getloadavg()
    return {
        "threshold": threshold,
        "loadavg_before_wait": start,
        "loadavg_after_wait": [round(x, 2) for x in end],
        "waited_sec": round(waited, 1),
        "timed_out": waited >= max_wait and max(end[0], end[1]) > threshold,
    }


CALIBRATION_ROWS = 64_000_000

#: A primary pass whose interleaved calibration rep runs more than
#: this factor over the session-best calibration was CONTENDED by
#: foreign load (our own Spark work is idle between the calibration
#: rep and the pass start; the reference task is fixed-size CPU work,
#: so only cross-process contention slows it). Quiet-box rep-to-rep
#: jitter measured ~5-10%; 1.25 is a load signature.
CALIB_CONTENTION_RATIO = 1.25


def _calibration_sec(spark) -> float:
    """Fixed synthetic CPU-bound reference task (round-11, verdict
    stretch #8): hash-reduce a constant-size range — no I/O, no data
    dependence, 32 fixed partitions — timed min-of-3. The committed
    record divides the headline total by this so cross-round whole-box
    speed drift (the ~1.18x r10-vs-r9 shift) is visible IN the
    artifact as a normalized ratio instead of adjudicated from memory.
    bit_xor, not sum: the fold must not overflow under ANSI mode."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(3):
        best = min(best, _calibration_rep(spark))
    return round(best, 3)


def _calibration_rep(spark) -> float:
    """One rep of the fixed reference task — interleaved before each
    primary pass (round-14, r13 verdict item 7) so foreign load DURING
    the run is measured, not just at the start-of-run idle gate (the
    r13 record started under the gate threshold and was contaminated
    mid-run)."""
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(0, CALIBRATION_ROWS, 1, 32).select(
        F.xxhash64("id").alias("h")
    ).agg(F.expr("bit_xor(h)")).collect()
    return round(time.time() - t0, 3)


def _warm_indexes(spark, sf_dir: str) -> None:
    """Warm the persisted ANN/band index caches BEFORE timing: the
    x3_ann_* and x2_dedup_incremental headliners probe materialized
    indexes (ann_index.py), and an index build belongs to ingest, not
    query latency. ensure_* is a single _SUCCESS stat when warm, so
    the timed runs below measure the steady-state probe only (the
    min-of-2 would hide a cold build anyway; this makes run 1 honest
    too)."""
    from etl_generator_demo_spark.operators.ann_index import (
        ensure_ivf_index,
        ensure_lsh_index,
    )
    from etl_generator_demo_spark.operators.dedup_incremental import (
        ensure_corpus_band_index,
        ensure_full_band_index,
        ensure_shingle_index,
    )

    ensure_lsh_index(spark, sf_dir)
    ensure_ivf_index(spark, sf_dir)
    ensure_corpus_band_index(spark, sf_dir)
    ensure_full_band_index(spark, sf_dir)
    ensure_shingle_index(spark, sf_dir)


def _resolve_passes() -> int:
    """Pass-count policy (round-9 advice, factored for testability):
    always >=2 full passes regardless of SPARK_GRAFT_BENCH_PASSES —
    BENCH_r08 shipped with passes=1 and ~11% whole-box inflation
    under the old 15% gate."""
    return max(2, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))


def _resolve_noise_ratio() -> float:
    """Retry threshold vs the last committed record (default 1.08):
    with min-of-2 passes the residual pass-to-pass jitter on a quiet
    box is ~2-3%, so an 8% upward deviation is a load signature, not
    variance."""
    return float(os.environ.get("SPARK_GRAFT_BENCH_NOISE_RATIO", "1.08"))


def _compact_stdout_line(out: dict, limit: int = 1900) -> str:
    """Render the one-line stdout record, guaranteed under ``limit``.

    The driver tail-captures ~2000 chars of stdout; BENCH_r09 shipped
    ``parsed: null`` when the line outgrew it. Degrade in two stages:
    drop scalar diagnostics first, then the per-query dict itself —
    the dict is what actually grows with HEADLINE, and the full record
    is always preserved in BENCH_LOCAL.json.
    """
    line = json.dumps(out)
    if len(line) > limit:
        for k in (
            "idle_waited_sec",
            "idle_timed_out",
            "load_start_5m",
            "ratio_vs_prev",
            "calibration_per_pass",
            "calib_clean_passes",
        ):
            out.pop(k, None)
        line = json.dumps(out)
    if len(line) > limit:
        out["queries"] = {"_dropped": "see BENCH_LOCAL.json"}
        line = json.dumps(out)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    idle_gate = _wait_for_idle()  # before the JVM: gate on OTHER work
    from etl_generator_demo_spark.registry import load_all
    from etl_generator_demo_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # JVM/codegen warmup on the smallest fixture so headline timings
    # measure the queries, not JIT.
    registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()

    _warm_indexes(spark, sf_dir)

    calibration = _calibration_sec(spark)
    print(f"-- calibration task: {calibration:.3f}s", file=sys.stderr)

    # IVF probe-only wrapper: the registered x3_ann_ivf_topk is a
    # bounded-error verdict (exact scan + probe + recall join); the
    # number worth tracking is the probe alone. k-means centroids are
    # not SQL-reproducible, so this wrapper is bench-only — the LSH
    # probe, whose hyperplanes ARE SQL-reproducible, is registered and
    # hash-checked as x3_ann_lsh_probe.
    def _ivf_probe_bench(spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_generator_demo_spark.operators.ann_index import ivf_probe_topk
        from etl_generator_demo_spark.operators.relational import t

        qv = [
            float(x)
            for x in t(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == 0)
            .select("embedding")
            .first()["embedding"]
        ]
        return ivf_probe_topk(spark, sf_dir, qv, k=10, n_probe=4, exclude_ids=(0,)).select(
            "vec_id", "label", "cosine"
        )

    extra = {"x3_ann_ivf_probe": _ivf_probe_bench}

    def run_set(the_sf_dir: str, names=None) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in (HEADLINE if names is None else names):
            fn = registry[name].fn if name in registry else extra[name]
            # three runs, report the min: run 1 is dominated by plan
            # compilation + whole-stage-codegen JIT and run 2 can still
            # pay lazy JIT tails (measured: x2_dedup_incremental
            # 3.8/1.3/1.0 s — the round-4 "wobble" was min-of-2
            # catching run 2), which amortize to zero on a long-lived
            # cluster — steady-state is the honest number.
            best = float("inf")
            rows = []
            for _ in range(3):
                t0 = time.time()
                rows = fn(spark, the_sf_dir).collect()
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)
            print(f"  {name}: {best:.2f}s ({len(rows)} rows)", file=sys.stderr)
        return timings

    def parse_sf(d: str):
        sf = d.rstrip("/").rsplit("sf", 1)[-1]
        return float(sf) if sf.replace(".", "").isdigit() else sf

    loadavg_start = os.getloadavg()
    # Min-of-N passes: keep each query's min across >=2 full passes —
    # steady-state with warm caches is the honest number on a shared
    # box; a transient load spike during one pass cannot contaminate
    # both. Policy lives in _resolve_passes() (tested directly).
    # Round-14 (r13 verdict item 7): one calibration rep is interleaved
    # BEFORE each primary pass — the start-of-run idle gate cannot see
    # load arriving mid-run (the r13 record started quiet and finished
    # at loadavg 6.2). A pass whose rep runs >CALIB_CONTENTION_RATIO
    # over the session-best calibration is CONTENDED; min-merge means
    # one clean pass fixes the record, so when no pass was clean we
    # spend bounded extra passes hunting one.
    min_passes = _resolve_passes()
    calib_per_pass: list[float] = []

    def primary_pass() -> dict[str, float]:
        calib_per_pass.append(_calibration_rep(spark))
        return run_set(sf_dir)

    def n_clean() -> int:
        # Gate against the RUNNING session minimum, not the start-of-run
        # calibration: a box that was loaded at session start and quiets
        # down later would otherwise inflate the contention limit and
        # count contended passes as clean (r14 advice).
        lim = min(calibration, *calib_per_pass) * CALIB_CONTENTION_RATIO
        return sum(1 for c in calib_per_pass if c <= lim)

    timings = primary_pass()
    passes = 1
    while passes < min_passes:
        repass = primary_pass()
        timings = {k: min(timings[k], repass[k]) for k in timings}
        passes += 1
    calib_retries = int(os.environ.get("SPARK_GRAFT_BENCH_CALIB_RETRIES", "2"))
    while n_clean() == 0 and calib_retries > 0:
        print(
            f"-- calibration contention: per-pass reps {calib_per_pass} all "
            f">{CALIB_CONTENTION_RATIO}x running session min "
            f"{min(calibration, *calib_per_pass):.3f}s; re-passing",
            file=sys.stderr,
        )
        repass = primary_pass()
        timings = {k: min(timings[k], repass[k]) for k in timings}
        passes += 1
        calib_retries -= 1
    calib_now = round(min([calibration, *calib_per_pass]), 3)
    guard = None
    prev = _last_committed(parse_sf(sf_dir))
    # retry threshold policy lives in _resolve_noise_ratio() (tested)
    thresh = _resolve_noise_ratio()
    if prev is not None:
        prev_name, prev_q, prev_calib = prev
        shared = sorted(set(prev_q) & set(timings))
        max_retries = int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "2"))
        retries = 0
        while shared:
            now_total = sum(timings[k] for k in shared)
            prev_total = sum(prev_q[k] for k in shared)
            ratio = now_total / prev_total if prev_total else 1.0
            guard = {
                "prev_record": prev_name,
                "shared_queries": len(shared),
                "shared_total_prev": round(prev_total, 3),
                "shared_total_now": round(now_total, 3),
                "ratio_vs_prev": round(ratio, 3),
            }
            # calibration-normalized ratio (round-14): divide out the
            # measured box-speed shift between the two records so a
            # whole-box drift (the 1.22x-driver vs 0.836x-quiet r13
            # whipsaw) stops reading as a plan regression. The retry
            # and noise_suspect decisions use the normalized ratio
            # when the prior record carries a calibration.
            eff = ratio
            if prev_calib:
                speed_shift = calib_now / float(prev_calib)
                eff = ratio / speed_shift if speed_shift > 0 else ratio
                guard["calibration_prev"] = prev_calib
                guard["ratio_vs_prev_norm"] = round(eff, 3)
            # only an UPWARD deviation is suspect — cross-process load
            # can only inflate wall-clock; running faster than a
            # (possibly itself-noisy, cf. BENCH_r07) committed record
            # needs no retry
            if eff <= thresh or retries >= max_retries:
                break
            print(
                f"-- noise guard: shared total {now_total:.2f}s vs committed "
                f"{prev_total:.2f}s ({eff:.2f}x normalized) deviates "
                f">{thresh - 1:.0%}; re-passing",
                file=sys.stderr,
            )
            repass = primary_pass()
            timings = {
                k: min(timings[k], repass[k]) for k in timings
            }
            calib_now = round(min([calib_now, *calib_per_pass]), 3)
            passes += 1
            retries += 1
        if guard is not None:
            guard["noise_suspect"] = (
                guard.get("ratio_vs_prev_norm", guard["ratio_vs_prev"]) > thresh
            )

    # Second scale factor (round-6 verdict advice #2): the committed
    # bench record itself must show the scaling slope, not just the
    # one-off PROBE_r5 artifact. Runs AFTER the primary set so the
    # primary numbers stay comparable with earlier rounds' JVM-warmth
    # conditions. Opt out with SPARK_GRAFT_BENCH_SECONDARY="" when
    # timing a single SF in isolation (never time two things at once).
    secondary_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_SECONDARY", "/root/testdata/sf0.01"
    )
    secondary = None
    if secondary_dir and os.path.isdir(secondary_dir) and secondary_dir != sf_dir:
        print(f"-- secondary SF: {secondary_dir}", file=sys.stderr)
        _warm_indexes(spark, secondary_dir)
        sec_timings = run_set(secondary_dir)
        for _ in range(min_passes - 1):  # same min-of-N policy
            rp = run_set(secondary_dir)
            sec_timings = {k: min(sec_timings[k], rp[k]) for k in sec_timings}
        secondary = {
            "sf": parse_sf(secondary_dir),
            "value": round(sum(sec_timings.values()), 3),
            "queries": sec_timings,
            "passes": min_passes,
        }

    retired = None
    if os.environ.get("SPARK_GRAFT_BENCH_RETIRED"):
        print("-- retired set (rotation policy)", file=sys.stderr)
        ret = run_set(sf_dir, RETIRED)
        rp = run_set(sf_dir, RETIRED)
        ret = {k: min(ret[k], rp[k]) for k in ret}
        retired = {"queries": ret, "value": round(sum(ret.values()), 3)}

    full = {
        "metric": "headline_query_wall_clock_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": parse_sf(sf_dir),
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "passes": passes,
        "idle_gate": idle_gate,
        "calibration_sec": calib_now,
        "calibration_per_pass": calib_per_pass,
        "calib_clean_passes": n_clean(),
        "calib_contended": n_clean() == 0,
        "value_per_calib": round(sum(timings.values()) / calib_now, 3),
    }
    if guard is not None:
        full["noise_guard"] = guard
    if secondary is not None:
        full["secondary"] = secondary
    if retired is not None:
        full["retired"] = retired
    # Full record to a committed sidecar: the driver captures only a
    # bounded stdout tail (BENCH_r09.json shipped "parsed": null
    # because the r9 line outgrew it), so the sidecar is the durable
    # full artifact and the noise guard's preferred prev-record source.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    # Stdout line: the driver parses ONE JSON line from a ~2000-char
    # tail — keep it compact (per-query timings stay; verbose nested
    # detail collapses to scalars; secondary keeps its total only).
    out = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "queries": timings,
        "sf": full["sf"],
        "passes": passes,
        "load_start_5m": round(loadavg_start[1], 2),
        "calibration_sec": calibration,
        "value_per_calib": full["value_per_calib"],
        "idle_waited_sec": idle_gate.get("waited_sec"),
        "idle_timed_out": idle_gate.get("timed_out"),
    }
    if guard is not None:
        out["ratio_vs_prev"] = guard["ratio_vs_prev"]
        out["noise_suspect"] = guard["noise_suspect"]
    if secondary is not None:
        out["secondary_sf"] = secondary["sf"]
        out["secondary_total"] = secondary["value"]
    if retired is not None:
        out["retired_total"] = retired["value"]
    print(_compact_stdout_line(out))


if __name__ == "__main__":
    main()
