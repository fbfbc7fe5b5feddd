"""Physical-plan audit: verifies the scale-critical plan properties of
every headline query (the ".explain and iterate" loop, mechanized).

Checks per query:
- broadcast vs sort-merge joins (dims must broadcast)
- PushedFilters reaching the parquet scan when the query filters
- ReadSchema width (column pruning: no scan reads all columns unless
  the query genuinely needs them)
- WholeStageCodegen spans (JVM-side execution; Python only where declared)
- number of shuffle Exchanges (each one is a cluster-wide barrier)

Usage: python tools/plan_audit.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")

EXPECTATIONS: dict[str, dict] = {
    # name -> {max_exchanges, min_broadcast, pushed_filters}
    #
    # Cache-state-aware budgets (round 16, VERDICT r15 item 2): a
    # query served from a persisted index (shingle store / band index
    # / LSH bucket index) has FEWER shuffles warm than when the
    # ``operators/_fallback`` inline pipeline fires (index
    # unavailable or mid-rebuild — the state that produced the r5 and
    # r15 WARNs under contention). Entries may carry
    # ``max_exchanges_cold`` / ``min_broadcast_cold`` for the inline
    # state; the audit detects which state each plan was actually
    # built in (fallback-event diff), applies that state's budget, and
    # prints the state. ``--cold`` forces the inline state for all
    # three fallback sites so the cold budgets are auditable
    # deterministically.
    "q1_pricing_summary": {"max_exchanges": 2, "pushed": True},
    "q2_revenue_by_segment": {"max_exchanges": 4, "min_broadcast": 1},
    "q3_revenue_by_nation": {"max_exchanges": 2, "min_broadcast": 3},
    "q4_local_supplier_volume": {"max_exchanges": 3, "min_broadcast": 3, "pushed": True},
    "w4_top3_orders_per_customer": {"max_exchanges": 2},
    "o_topk_orders": {"max_exchanges": 1, "take_ordered": True},
    "x2_minhash_lsh_pairs": {"max_exchanges": 6},
    "x3_cosine_topk": {"max_exchanges": 1, "take_ordered": True},
    # bucket stage served from the persisted LSH index (r5): the plan
    # is an index self-join + broadcast vector rejoin — the corpus-wide
    # Arrow bucket matmul is ingest-time now. r17: the candidate
    # distinct moved AFTER the cosine filter on the broadcast plan
    # (output-sized dedup; the map-side pipeline runs exchange-free),
    # so warm = output distinct + final sort only
    "x3_neardup_lsh_bucketed": {"max_exchanges": 2, "min_broadcast": 2},
    # bounded-error verdict (like IVF below): the exact tier scans the
    # corpus by design; the LSH probe branch must prune on its
    # partition columns
    "x3_ann_lsh_topk": {"partition_pruned_on": "lsh_table"},
    # bounded-error verdict: the exact brute-force tier scans the
    # corpus (by design, that IS the ground truth), so only require
    # the IVF index branch itself to prune on its partition column
    "x3_ann_ivf_topk": {"partition_pruned_on": "ivf_list"},
    "x2_dedup_clusters": {"max_exchanges": 12},
    # corpus side must stream (broadcast the batch's band keys), so the
    # only shuffles are the batch's own signature groupBy + hit agg
    "x2_dedup_incremental": {"max_exchanges": 4, "min_broadcast": 1},
    # candidates-then-verify: candidate pairs materialized once
    # (localCheckpoint) then broadcast into the semi joins; inverted
    # index runs only on the pruned shingle relation
    "x2_neardup_verified": {"max_exchanges": 7, "min_broadcast": 2},
    # 4-stage composition stays one distributed plan: quality is
    # scan-side, each groupBy/window is one exchange
    "x4_corpus_pipeline": {"max_exchanges": 9},
    "x4_tfidf_top_terms": {"max_exchanges": 5},
    "x4_sequence_packing": {"max_exchanges": 2},
    "st_stream_stream_attribution": {"max_exchanges": 3, "pushed": True},
    # localCheckpoint in connected_components truncates the visible
    # plan (like x2_dedup_clusters), so only the shuffle budget applies
    "x3_neardup_clusters": {"max_exchanges": 12},
    "j8_asof_purchase_last_click": {"max_exchanges": 3, "pushed": True},
    "st_session_windows": {"max_exchanges": 2},
    # salted two-phase: (user, bucket) phase-1 exchange + per-user merge
    # + the output-ordering range shuffle
    "st_session_windows_salted": {"max_exchanges": 4},
    "f_json_struct_agg": {"max_exchanges": 2},
    "sq_correlated_above_nation_avg": {"max_exchanges": 3},
    # benchmark shingle set must broadcast; shuffles = benchmark
    # distinct + per-doc count + output ordering
    # r16: served from the persisted shingle index — warm is two
    # index scans + broadcast semi + per-doc agg (3 shuffles); cold
    # falls back to the inline Arrow shingle pipeline (one extra
    # distinct shuffle)
    "x4_decontaminate": {"max_exchanges": 3, "max_exchanges_cold": 4,
                         "min_broadcast": 1},
    # query batch broadcasts; one narrow shuffle into the per-query
    # ranking window + output ordering
    "x3_ann_batch_topk": {"max_exchanges": 2, "min_broadcast": 1},
    "f_time_of_day_mapping": {"max_exchanges": 2},
    # probe-only ANN (the benched entry): pruned index scan, top-k, no
    # corpus scan — shuffles only for the tiny dedupe + output ordering
    "x3_ann_lsh_probe": {"partition_pruned_on": "lsh_table", "max_exchanges": 3},
    # pointer-doubling output: the per-round joins are behind
    # localCheckpoint lineage cuts, so the visible plan is the final
    # ordered projection
    "j_hierarchy_depth": {"max_exchanges": 2},
    "j_hierarchy_ancestors": {"max_exchanges": 2},
    # decode agg: one groupBy exchange + ordered output
    "x5_decode_features": {"max_exchanges": 2},
    # shingle counts + co-keyed join back + per-doc agg + output order
    # (cold: + the inline Arrow shingling's distinct + ingest shuffle)
    "x2_shingle_dup_coverage": {"max_exchanges": 3, "max_exchanges_cold": 5},
    # adjacency window + two count aggs + joins back + per-doc agg
    "x4_bigram_lm_quality": {"max_exchanges": 6, "min_broadcast": 1},
    # per-lang count + quota broadcast + md5-rank window + output order
    "x4_temperature_mixture": {"max_exchanges": 5, "min_broadcast": 1},
    # one pruned index scan serves the whole batch; probe relation and
    # query vectors broadcast
    "x3_ann_batch_probe": {
        "partition_pruned_on": "lsh_table",
        "max_exchanges": 3,
        "min_broadcast": 2,
    },
    # scan-side explode of an arithmetic sequence; only the output
    # ordering shuffles
    "x4_chunk_with_overlap": {"max_exchanges": 1},
    # fingerprint groupBy (behind localCheckpoint) + band self-join +
    # pair distinct + rejoin + output order
    "x2_simhash_neardup_pairs": {"max_exchanges": 2},
    # one doc_id window shuffle + distinct + output order
    "x4_winnowing_fingerprints": {"max_exchanges": 3},
    # query-term stats and the scalar stats row broadcast; corpus-keyed
    # shuffles: token tf/dl groupBys, the scalar-stats SinglePartition,
    # the doc_id join repartition, and the final per-doc agg — every
    # one keyed and linear, none all-pairs
    "x4_bm25_topk": {"max_exchanges": 7, "min_broadcast": 2, "take_ordered": True},
    # vocab broadcasts; pairs are generated per-doc (co-keyed self-join)
    "x4_pmi_cooccurrence": {"max_exchanges": 7, "min_broadcast": 3},
    # final Lloyd assignment: centroid model broadcast, one groupBy per
    # assignment + label rejoin + output order (earlier rounds run in
    # their own jobs behind the driver-side model collect)
    "x3_kmeans_clusters": {"max_exchanges": 5, "min_broadcast": 1},
    # within-cluster pairs via ONE Arrow-grouped exact-integer Gram
    # stage (keyed on cluster_id, never corpus-wide); centroid model
    # broadcast; assignment behind a localCheckpoint lineage cut
    "x3_semdedup_keep": {"max_exchanges": 4, "min_broadcast": 1},
    # single window shuffle on the partition key + output ordering
    "w_cume_dist_percent_rank": {"max_exchanges": 2, "pushed": True},
    # dim broadcast + ONE stateful window-agg shuffle + output order —
    # the stream-static join itself must add no exchange
    "st_stream_static_enrich": {"max_exchanges": 2, "min_broadcast": 1, "pushed": True},
    # key-count groupBy + the rank window over the KEY relation (single
    # partition by design: |keys| << |rows|) + scalar agg
    "x4_key_skew_audit": {"max_exchanges": 4},
    # vocab groupBy + vocab-sized rank window + scalar regression agg
    "x4_zipf_slope": {"max_exchanges": 4},
    # pure scan-side projection: only the output ordering may shuffle
    "x3_random_projection": {"max_exchanges": 1},
    # sketch groupBy + exact-side groupBy; the 4x(row,bucket) fan-out
    # is map-side and the sketch probes via broadcast
    "x4_heavy_hitters_cms": {"max_exchanges": 3, "min_broadcast": 1},
    # token first-occurrence groupBy + bucket groupBy + cumulative
    # window over the bucket relation
    "x4_vocab_growth": {"max_exchanges": 4},
    # band join + inverted-index verify + per-bucket agg — the verify
    # tier reuses the shingle relation, so budget covers both chains
    "x2_lsh_precision_report": {"max_exchanges": 8, "max_exchanges_cold": 9},
    # one lead() window on the natural key + output ordering
    "d_scd2_user_state": {"max_exchanges": 2, "pushed": True},
    # four stage scalar aggregates over the shared pipeline chain
    # (quality scan + exact-dedup join + LSH band join feed them)
    "x4_pipeline_attrition": {"max_exchanges": 12},
    # ONE aggregate with an Expand (x3 row replication), not 3 scans —
    # the documented trap; scale tier is a_approx_distinct
    "a_multi_distinct": {"max_exchanges": 3},
    # (cluster,label) groupBy + majority window + totals join over the
    # cluster relation; Lloyd rounds sit behind the model collects
    "x3_label_purity": {"max_exchanges": 7, "min_broadcast": 1},
    # counted-aggregate compilation of INTERSECT ALL: one shuffle per
    # side + the join + output ordering
    "u_intersect_all_urgent_finished": {"max_exchanges": 4},
    # one framed window shuffle + output ordering; pushed custkey filter
    "w_moving_median": {"max_exchanges": 2, "pushed": True},
    # minhash chain + source rejoin on the narrow pair relation
    "x2_source_overlap_matrix": {"max_exchanges": 8},
    # GROUPING SETS expand into ONE hash aggregate (Expand node), not
    # one scan per set
    "a_grouping_sets": {"max_exchanges": 2},
    # prefix filter: checkpointed token relation feeds card/df/rank/
    # overlap branches; budget covers the rank window + prefix join +
    # candidate distinct + overlap agg + rejoins
    "x2_token_overlap_join": {"max_exchanges": 11},
    # LSH candidate chain + the two text rejoins (broadcast)
    "x2_edit_distance_pairs": {"max_exchanges": 4, "min_broadcast": 2},
    # day-grain dedup + 7-offset explode dedup + two rollups + join
    "x4_rolling_7d_active_users": {"max_exchanges": 6},
    # one lag window on the partition key + output ordering
    "w_ewma_order_totals": {"max_exchanges": 2, "pushed": True},
    # two grouped exact medians with per-group models broadcast back
    "x4_mad_outliers": {"max_exchanges": 5, "min_broadcast": 2},
    # union + digest groupBy + output ordering
    "x5_payload_dedup": {"max_exchanges": 3},
    # degree rollup + orientation rejoin + wedge join + closing semi +
    # global totals (wedge stage capped O(m^1.5) by orientation)
    "g_triangle_count": {"max_exchanges": 7},
    # lag-flag-cumsum window + per-session rollup + output ordering
    "x4_gap_sessionization": {"max_exchanges": 3, "pushed": True},
    # daily rollup + spine explode + left join + carry window
    "w_gap_fill_forward": {"max_exchanges": 5, "pushed": True},
    # 7 unioned single-row aggregates (scalar exchanges) + FK checks
    # via broadcast hit markers
    "q_data_quality_audit": {"max_exchanges": 11, "min_broadcast": 2},
    # counted-aggregate EXCEPT ALL: one shuffle per side + join + order
    "u_except_all_urgent_minus_finished": {"max_exchanges": 4},
    # seek pagination: pushed cursor range predicate + TakeOrdered,
    # zero exchanges
    "o_keyset_page": {"max_exchanges": 0, "take_ordered": True},
    # checkpointed shingles feed card + both join sides; inter agg +
    # direction union + rejoins. Cold budget carries one exchange of
    # slack over the measured inline-pipeline count (5): the r5/r15
    # WARNs showed 6 when the shingle store was MID-rebuild under
    # contention — a state between the two clean audits (r15 verdict
    # item 2's suggested pin)
    "x2_shingle_containment_pairs": {"max_exchanges": 5, "max_exchanges_cold": 6},
    # one Arrow encode pass; only the output ordering shuffles
    "x3_pq_codes": {"max_exchanges": 1},
    # sweep-line: session rollup + boundary-merge + curve window + day agg
    # sweep-line curve via global_running (two-phase prefix sum): the
    # localCheckpoint cuts the visible plan at the range-partitioned
    # boundary relation, so the user_id pushdown happens in the
    # checkpointed job; visible shuffles = pid window + day agg + order
    "x4_concurrent_sessions": {"max_exchanges": 3},
    # bigram explode + two vocab groupBys; 256-row weight model broadcast
    "x4_dsir_importance": {"max_exchanges": 4, "min_broadcast": 1},
    # one cumulative-weight window on the group key; totals broadcast
    "a_weighted_median": {"max_exchanges": 3, "min_broadcast": 1},
    # customer-grain rollup + three NTILE windows over the rollup
    # exact distributed ntile: three global_row_number passes behind
    # localCheckpoint lineage cuts (range shuffles, never a global
    # window); the visible plan is the final projection + output order
    "x4_rfm_scores": {"max_exchanges": 2, "no_window": True},
    # query relation broadcast; ONE corpus pass + per-query rank window
    "x3_knn_label_vote": {"max_exchanges": 2, "min_broadcast": 1},
    # CC behind localCheckpoint; rejoin + survivorship agg
    "x2_golden_records": {"max_exchanges": 2},
    # per-basket pair gen (co-keyed) + support aggs; item supports broadcast
    "x4_association_rules": {"max_exchanges": 8, "min_broadcast": 2},
    # Catalyst decorrelates LATERAL into the ranked join
    "u_lateral_topn_per_nation": {"max_exchanges": 2, "min_broadcast": 1},
    # first-owner min + co-keyed join back + per-doc agg
    "x4_shingle_novelty": {"max_exchanges": 3, "max_exchanges_cold": 4},
    # length scan × |caps| explode (map-side) + one grouped agg
    "x4_seqlen_cap_selection": {"max_exchanges": 2},
    # windowed counts + per-window rank + output order
    "st_hourly_top_events": {"max_exchanges": 3},
    # trigram explode × |langs| + vocab-keyed profile joins + argmax window
    # r11: +tric pre-collapse (3 rollups read the typed relation).
    # r13: +2 — the vocab-size countDistinct moved INTO the plan (it
    # was an eager distinct().count() at construction time before: a
    # hidden separate job the audit never saw, paid on every plan-only
    # inspection; the runtime total work went DOWN — see fd26119)
    "x4_trigram_langid_confusion": {"max_exchanges": 12, "min_broadcast": 2},
    # island-key rank window + two grouped aggs, all keyed by user
    "w_activity_streaks": {"max_exchanges": 3, "pushed": True},
    # pure scan + TakeOrdered: priorities are column expressions
    "x4_weighted_sample_topk": {"max_exchanges": 0, "take_ordered": True},
    # candidates pruned to probed lists behind the model collects; ADC
    # is one Arrow pass + TakeOrdered
    "x3_ivfpq_adc_topk": {"max_exchanges": 0, "take_ordered": True},
    # partition-pruned multiprobe directory read + TakeOrdered
    "x3_ann_lsh_multiprobe": {
        "partition_pruned_on": "lsh_table",
        "max_exchanges": 1,
        "take_ordered": True,
    },
    # nation dim joined twice under roles; every dim broadcast, the
    # fact chain shuffles once into the grouped aggregate
    "q7_volume_shipping": {"max_exchanges": 2, "min_broadcast": 4},
    # conditional-aggregate scalar; part dim broadcast, date pushed
    "q14_promo_revenue_share": {"max_exchanges": 1, "min_broadcast": 1, "pushed": True},
    # grouped-HAVING key set aggregated FIRST, then semi/equi joins
    "q18_large_volume_customers": {"max_exchanges": 3, "min_broadcast": 2},
    # scan-side block slicing; only the hash groupBy + output ordering
    "x4_chunk_level_dedup": {"max_exchanges": 2},
    # DSIR chain (vocab groupBys, weight model broadcast) + per-lang window
    "x4_dsir_resampled_mixture": {"max_exchanges": 5, "min_broadcast": 2},
    # one corpus pass into scalar aggs + lang-sized entropy rollup
    "x4_corpus_report_card": {"max_exchanges": 4, "min_broadcast": 1},
    # interval→bucket explode turns BNLJ into an EQUI join (broadcast
    # small side) + residual filter; one grouped agg
    "j_theta_banded_bucketed": {"max_exchanges": 2, "min_broadcast": 1},
    # one scored corpus pass + two rank windows + the k-grid agg
    "x3_ann_recall_curve": {"max_exchanges": 1},
    # positive pairs checkpointed; negative pool join + anti checks
    # broadcast; per-pair md5 rank window
    # negatives come from a bounded md5-ranked pool (TakeOrdered top-1000),
    # never a full-corpus cross join; pool + both anti checks broadcast
    "x4_contrastive_triplets": {
        "max_exchanges": 2,
        "min_broadcast": 3,
        "take_ordered": True,
    },
    # checkpointed shingles + signatures; band join + nibble joins +
    # exact-tier verification chains
    "x2_bbit_minhash_estimates": {"max_exchanges": 5, "min_broadcast": 2},
    # six-table join, five dims broadcast; shuffles: orders⋈lineitem +
    # the year aggregate
    "q8_market_share": {"max_exchanges": 3, "min_broadcast": 4, "pushed": True},
    # returnflag + date both pushed; customer/nation broadcast; top-20
    # must be TakeOrderedAndProject, never a global sort
    "q10_returned_items": {
        "max_exchanges": 3,
        "min_broadcast": 2,
        "pushed": True,
        "take_ordered": True,
    },
    # left join shuffle + custkey count (partitioning reusable) +
    # histogram agg + output ordering
    "q13_customer_distribution": {"max_exchanges": 5, "pushed": True},
    # revenue CTE aggregated per branch + scalar MAX + ordered output;
    # supplier and the 1-row max broadcast
    "q15_top_supplier": {"max_exchanges": 5, "min_broadcast": 2, "pushed": True},
    # r7 window spelling: brand part set broadcast ONCE (single pass);
    # per-part avg is a window over the partkey partition + global agg
    "q17_small_quantity_revenue": {
        "max_exchanges": 2,
        "min_broadcast": 1,
        "pushed": True,
    },
    # disjunction evaluated as broadcast-join residual; envelope
    # conjuncts pushed into both scans; one scalar agg
    "q19_disjunctive_predicates": {"max_exchanges": 1, "min_broadcast": 1, "pushed": True},
    # scalar avg broadcast + anti join + segment agg + output ordering
    "q22_dormant_accounts": {"max_exchanges": 5, "min_broadcast": 2, "pushed": True},
    # scan-side 2-D explode (no Python stage); per-media agg + ordering
    "x5_image_tiling_plan": {"max_exchanges": 2},
    # user-keyed range join (both event sets shuffle once) + ONE
    # purchase-keyed window pass + output ordering
    "x4_multitouch_attribution": {"max_exchanges": 4, "pushed": True},
    # fine-class groupBy + coarse-key window + ordering — class
    # relations only, documents never shuffle
    "x4_k_anonymity_ladder": {"max_exchanges": 3},
    # per-partition Arrow Gram partials (d^2-bounded); only the (i,j)
    # partial sum + output ordering shuffle
    "x3_dim_covariance": {"max_exchanges": 2},
    # user-keyed session window + session agg + signature agg; top-20
    # must be TakeOrderedAndProject
    "x4_journey_signatures": {"max_exchanges": 3, "take_ordered": True},
    # four scans with broadcast hit markers + scalar aggs; forget keys
    # aggregate before broadcasting — zero fact-fact shuffles
    "d_gdpr_erasure_audit": {"max_exchanges": 7, "min_broadcast": 4, "pushed": True},
    # three group-level aggregates merged on the group key (tiny);
    # the delta branch's scan filter must push down
    "d_incremental_agg_maintenance": {"max_exchanges": 5, "pushed": True},
    # running-max island window + two user-keyed aggs + ordering
    "x4_covered_time_per_user": {"max_exchanges": 3},
    # one user-keyed session-window shuffle + output ordering, same
    # budget as the fixed-gap variant
    "st_session_dynamic_gap": {"max_exchanges": 2},
    # docs reduce to cells in one groupBy; margins/grid/sum are
    # margin-sized; scalar exchanges dominate the count
    "x4_chi2_lang_source": {"max_exchanges": 9, "min_broadcast": 2},
    # source-keyed window + global-rank exact tier (SinglePartition by
    # contract) + scalar count + 101-row grid broadcast + ordering
    # per-source percent_rank window (keyed) + broadcast 101-row grid;
    # the global exact-rank tier is global_row_number behind its
    # checkpoint cut — no single-partition window survives in the plan
    "x4_quantile_normalize_scores": {"max_exchanges": 6, "min_broadcast": 2},
    # shard sketch groupBy + two scalar aggregates + 1-row cross join
    "a_hll_shard_merge": {"max_exchanges": 5},
    # user-grain agg + 2-row arm rollup + scalar pivot; pushed filter
    # not required (conversion flag needs every event row)
    "x4_ab_test_lift": {"max_exchanges": 3},
    # two scored scans -> TakeOrdered top-10s; rank window runs on a
    # 10-row relation (the SinglePartition there is trivial)
    "x3_mrl_prefix_recall": {"max_exchanges": 4, "pushed": True, "take_ordered": True},
    # day-grain dedup + day-sketch agg + two range joins over the
    # day relation (|days| rows) + per-day rollups + ordering
    "x4_rolling_7d_hll_users": {"max_exchanges": 8},
    # per-value grid groupBy; cumulative window + max run on the
    # grid relation (<= 1e4 lattice points — SinglePartition there
    # is by design), pushed source filter
    "x4_ks_source_drift": {"max_exchanges": 6, "pushed": True},
    # signup⋈events join (conditioned on the signup time, so it can't
    # pre-aggregate) + user-grain agg + day-grid aggs; the cumulative
    # windows run on the distinct-day relation — every shuffle keyed
    "x4_kaplan_meier_conversion": {"max_exchanges": 8, "pushed": True},
    # daily rollup (exact cents) + day-grid pairwise join + scalar
    # aggs; |days|^2 pairs regardless of event volume
    "x4_mann_kendall_trend": {"max_exchanges": 6},
    # daily rollup behind a checkpoint; cumulative walk on the day
    # grid; TakeOrdered argmax
    "x4_cusum_changepoint": {"max_exchanges": 3, "take_ordered": True},
    # one scalar byte total + one map-combined shard groupBy; payload
    # column never read
    "x5_shard_manifest": {"max_exchanges": 3},
    # native WITH RECURSIVE: the per-level union steps run as their
    # own jobs outside the visible final plan (like the checkpointed
    # CC loops); the output plan is the ordered projection
    "u_recursive_cte_depth": {"max_exchanges": 3},
    # variant parse is scan-side; one grouped agg + ordering
    "f_variant_extract_agg": {"max_exchanges": 2},
    # non-linear recursion boundary: ONE user-keyed applyInPandas
    # walk + output ordering; pushed user/event-type filters
    "x4_capped_running_balance": {"max_exchanges": 2, "pushed": True},
    # one 9-group digit agg + grid completion; scalar total broadcast
    "x4_benford_digit_audit": {"max_exchanges": 4, "pushed": True},
    # daily rollup + checkpointed dev series (lineage cut hides the
    # pushed scan); lag join on the day grid
    "x4_daily_revenue_acf": {"max_exchanges": 4},
    # daily rollup + two lag windows on the day grid + scalar agg
    "x4_forecast_backtest": {"max_exchanges": 3, "pushed": True},
    # ------------------------------------------------------------------
    # Measured pins (full-registry sweep): budgets set to the observed
    # shuffle count at sf0.01 — any regression that ADDS an exchange to
    # one of these plans now fails the audit. Codegen presence is
    # asserted for every entry by the generic check.
    # ------------------------------------------------------------------
    # keyed dedup window shuffle + per-type agg + output ordering
    "st_dedup_first_occurrence": {"max_exchanges": 3},
    # bitmap tier (type,bucket)->type + exact countDistinct tier +
    # broadcast verdict join + ordering
    "a_bitmap_distinct": {"max_exchanges": 5},
    "f_try_error_safe_ops": {"max_exchanges": 2},
    "f_hash_functions": {"max_exchanges": 3},
    "u_posexplode_ordinality": {"max_exchanges": 3},
    # monthly rollup + lattice-bounded month-grid window + ordering
    "f_yoy_mom_growth": {"max_exchanges": 2},
    # one map-combined global moment pass, shared across three pairs
    "a_corr_matrix_lineitem": {"max_exchanges": 3},
    "a_approx_distinct": {"max_exchanges": 2},
    "a_approx_distinct_by_group": {"max_exchanges": 3},
    "a_argmax_top_customer_per_segment": {"max_exchanges": 2},
    "a_bool_aggregates": {"max_exchanges": 2},
    "a_collect_sets": {"max_exchanges": 2},
    "a_cube_status_priority": {"max_exchanges": 2},
    "a_distinct_counts": {"max_exchanges": 2},
    "a_global_totals": {"max_exchanges": 1},
    "a_grouping_markers": {"max_exchanges": 2},
    "a_having_big_customers": {"max_exchanges": 2},
    "a_percentiles": {"max_exchanges": 2},
    "a_percentiles_approx": {"max_exchanges": 2},
    "a_pivot_status_by_priority": {"max_exchanges": 3},
    "a_rollup_flag_status": {"max_exchanges": 2},
    "a_stats_moments": {"max_exchanges": 2},
    "a_unpivot_metrics": {"max_exchanges": 2},
    "d_snapshot_diff": {"max_exchanges": 3},
    "f_arithmetic_revenue": {"max_exchanges": 1},
    "f_array_ops": {"max_exchanges": 1},
    "f_bitwise_ops": {"max_exchanges": 1},
    "f_case_price_buckets": {"max_exchanges": 2},
    "f_cast_validation": {"max_exchanges": 1},
    "f_date_arithmetic": {"max_exchanges": 1},
    "f_date_monthly_revenue": {"max_exchanges": 2},
    "f_date_standardize": {"max_exchanges": 1},
    "f_decimal_money_totals": {"max_exchanges": 2},
    "f_json_extract": {"max_exchanges": 1},
    "f_json_map_explode": {"max_exchanges": 1},
    "f_null_handling": {"max_exchanges": 2},
    "f_regexp_ops": {"max_exchanges": 1},
    "f_string_ops": {"max_exchanges": 1},
    "g_pagerank_tree": {"max_exchanges": 1},
    "j8_asof_forward_next_view": {"max_exchanges": 2},
    "j_anti_customers_without_urgent_orders": {"max_exchanges": 1},
    "j_bloom_prejoin_prune": {"max_exchanges": 0},
    "j_cross_region_nation_grid": {"max_exchanges": 2},
    "j_left_customers_per_nation": {"max_exchanges": 2},
    "j_point_in_time_features": {"max_exchanges": 2},
    "j_range_late_shipments": {"max_exchanges": 2},
    "j_self_line_pairs": {"max_exchanges": 2},
    "j_semi_customers_with_urgent_orders": {"max_exchanges": 1},
    "j_theta_price_band": {"max_exchanges": 2},
    "o_limit_offset_page": {"max_exchanges": 0},
    # WITH TIES via top-k cutoff + literal filter: the cutoff job is a
    # TakeOrderedAndProject outside this plan; the returned plan must be
    # window-free with the cutoff pushed to the parquet scan
    "o_top_recent_with_ties": {"max_exchanges": 1, "pushed": True, "no_window": True},
    "p_predicates": {"max_exchanges": 1},
    "q6_forecast_revenue": {"max_exchanges": 1},
    "sq_in_and_not_exists": {"max_exchanges": 1},
    "sq_scalar_above_1p5x_avg": {"max_exchanges": 2},
    "st_late_data_watermark_semantics": {"max_exchanges": 2},
    # running high-water mark via global_running (two-phase prefix
    # max, keyed pid window — never SinglePartition): pid window +
    # bucket groupBy + output order
    "st_lateness_histogram": {"max_exchanges": 3},
    "st_sliding_windows": {"max_exchanges": 2},
    "st_tumbling_hourly": {"max_exchanges": 2},
    "u_cte_above_avg_nations": {"max_exchanges": 3},
    "u_except_never_urgent": {"max_exchanges": 2},
    "u_intersect_urgent_and_big": {"max_exchanges": 2},
    "u_union_key_accounts": {"max_exchanges": 2},
    "u_union_schema_drift": {"max_exchanges": 1},
    "w1_rank_customers_in_nation": {"max_exchanges": 2},
    "w2_order_gaps": {"max_exchanges": 2},
    # r13 bin-decomposed spelling: the single global-sort exchange
    # became bin-keyed windows + the tiny lattice prefix + broadcast
    # rejoins — more exchanges, but none corpus-sized through one task
    "w3_range_frame_price_band": {"max_exchanges": 8, "min_broadcast": 2},
    "w3_running_totals": {"max_exchanges": 2},
    "w_first_last_order_span": {"max_exchanges": 2},
    # exact distributed ntile (global_row_number behind a checkpoint
    # cut): visible plan is quartile groupBy + output order, window-free
    "w_ntile_price_quartiles": {"max_exchanges": 2, "no_window": True},
    "w_share_of_total": {"max_exchanges": 2},
    "x1_dedup_exact": {"max_exchanges": 2},
    "x1_dedup_normalized": {"max_exchanges": 2},
    "x2_cluster_size_histogram": {"max_exchanges": 3},
    "x2_dedup_qa_sample": {"max_exchanges": 4},
    "x2_minhash_estimate_error": {"max_exchanges": 8, "max_exchanges_cold": 9},
    "x2_minhash_lsh_pairs_guarded": {"max_exchanges": 5},
    # shingle-set consumers serve from the persisted distinct-shingle
    # store since r5 (ensure_shingle_index): the Arrow text pass and
    # the distinct shuffle are ingest-time, so warm budgets tightened.
    # r17: the per-doc cardinality relation is localCheckpointed (it
    # fed both endpoint joins; AQE exchange reuse deduped it only when
    # a best-effort stage-cache race won — the r15/r16 contention WARNs
    # were that race losing), so the warm plan drops to 2 visible
    # shuffles DETERMINISTICALLY; cold keeps the inline shingle pass.
    "x2_ngram_jaccard_pairs": {
        "max_exchanges": 2,
        "min_broadcast": 2,
        "max_exchanges_cold": 4,
    },
    "x2_simhash_fingerprints": {"max_exchanges": 2, "max_exchanges_cold": 3},
    "x3_label_centroids": {"max_exchanges": 4},
    "x3_quantize_int8": {"max_exchanges": 1},
    "x4_balanced_sample_per_lang": {"max_exchanges": 2},
    "x4_cohort_retention": {"max_exchanges": 4},
    "x4_event_transitions": {"max_exchanges": 3},
    "x4_fingerprints": {"max_exchanges": 2},
    "x4_funnel_conversion": {"max_exchanges": 7},
    "x4_heavy_hitter_tokens": {"max_exchanges": 1},
    "x4_lang_source_rollup": {"max_exchanges": 2},
    "x4_pack_bins_greedy": {"max_exchanges": 5},
    "x4_pii_scrub": {"max_exchanges": 1},
    "x4_profile_documents": {"max_exchanges": 2},
    "x4_quality_and_lang": {"max_exchanges": 1},
    "x4_quality_buckets": {"max_exchanges": 7},
    "x4_repetition_scores": {"max_exchanges": 3},
    "x4_rolling_7d_user_spend": {"max_exchanges": 2},
    "x4_sample_docs": {"max_exchanges": 1},
    "x4_text_stats": {"max_exchanges": 1},
    "x4_token_budget_mixture": {"max_exchanges": 2},
    "x4_token_estimates": {"max_exchanges": 1},
    "x4_token_length_histogram": {"max_exchanges": 2},
    "x4_train_val_test_split": {"max_exchanges": 1},
    "x4_value_outliers": {"max_exchanges": 2},
    "x5_clip_duration_buckets": {"max_exchanges": 2},
    "x5_frame_samples": {"max_exchanges": 1},
    "x5_multimodal_meta": {"max_exchanges": 1},
    "x5_resize_plan": {"max_exchanges": 1},
    # ------------------------------------------------------------------
    # Round 7: TPC-H analogues of the six blocked shapes. Budgets =
    # observed at sf0.01. Shuffle inventory per docstring: the only
    # exchanges are fact-fact joins, map-combined aggregates, and
    # output ordering; every dim side broadcasts.
    # ------------------------------------------------------------------
    "q9_profit_by_nation_year": {"max_exchanges": 2, "min_broadcast": 3, "pushed": True},
    "q11_important_parts": {"max_exchanges": 4, "min_broadcast": 2, "pushed": True},
    "q12_late_lines_by_priority": {"max_exchanges": 2, "min_broadcast": 1, "pushed": True},
    "q16_supplier_part_variety": {"max_exchanges": 4, "min_broadcast": 2, "pushed": True},
    "q20_excess_shipments": {"max_exchanges": 4, "min_broadcast": 3, "pushed": True},  # r7 window spelling: one scan, no agg rejoin
    "q21_suppliers_kept_waiting": {"max_exchanges": 2, "min_broadcast": 2, "pushed": True},  # r7 window spelling: one fact join, no stats rejoin
    # ------------------------------------------------------------------
    # Round 7: rank-statistics + lexical-diversity suite. Budgets =
    # observed at sf0.01. The global_row_number/global_running callers
    # (spearman, gini, ngram_coverage) have localCheckpoint lineage
    # cuts, so the visible plan understates total exchanges — the pin
    # guards the SERVED plan like the other checkpointed entries.
    # ------------------------------------------------------------------
    "a_mode_orderpriority": {"max_exchanges": 3},  # r7 window spelling: one fact pass, no rejoin
    "x4_spearman_rank_corr": {"max_exchanges": 1, "min_broadcast": 1},
    "x4_gini_doclen_by_lang": {"max_exchanges": 3, "min_broadcast": 1},
    "x4_burstiness_per_user": {"max_exchanges": 1},
    "x4_herfindahl_source_concentration": {"max_exchanges": 3},
    "x4_token_simpson_diversity": {"max_exchanges": 3},
    "x4_type_token_ratio": {"max_exchanges": 3},
    "x4_ngram_coverage_topk": {"max_exchanges": 4},
    # Round-7 second batch: FILTER-clause aggregate, tolerance as-of,
    # local clustering coefficient (deg-ordered orientation inherits
    # g_triangle_count's shuffle inventory + the corner-credit agg),
    # Shannon entropy (vocabulary-bounded two-level aggregate).
    "a_filtered_aggregates": {"max_exchanges": 2},  # FILTER is aggregate-level; the scan is full by design
    "j8_asof_tolerance_click": {"max_exchanges": 2, "pushed": True},
    "g_clustering_coefficient": {"max_exchanges": 9},
    "x4_shannon_entropy_lang": {"max_exchanges": 3},
    # stream-stream LEFT OUTER interval join (batch registration): the
    # click side broadcasts at fixture ratios; under streaming the same
    # plan is a state-store join keyed on user_id
    "st_stream_stream_left_outer": {"max_exchanges": 1, "min_broadcast": 1, "pushed": True},
    # modern-SQL surface pair: domain-bounded ordered LISTAGG; GROUP
    # BY ALL compiles to the ordinary hash aggregate + output ordering
    "a_listagg_ordered": {"max_exchanges": 3},
    "a_group_by_all_revenue": {"max_exchanges": 2},
    # ISO week/year-of-week calendar parity: pushed scan window + one
    # map-combined aggregate + output ordering
    "f_iso_week_revenue": {"max_exchanges": 2, "pushed": True},
    # three scalar-subquery branches: NAAJ/anti joins fold to scalar
    # counts; visible plan is the broadcast scalar assembly
    "sq_notin_null_semantics": {"max_exchanges": 1},
    # nullable-key top-k with explicit NULLS FIRST: zero exchanges
    "o_topk_explicit_null_order": {"max_exchanges": 0, "take_ordered": True},
    # constant arithmetic over one scan + scalar count: <=1 exchange
    "f_negative_arith_semantics": {"max_exchanges": 1},
    # Wilson bound: one map-combined aggregate -> TakeOrdered
    "x4_wilson_conversion_rank": {"max_exchanges": 1, "take_ordered": True},
    # MI: one contingency aggregate; marginals are windows over the
    # bounded |lang x source| cells relation
    "x4_mutual_information_lang_source": {"max_exchanges": 2},
    # Round-8 graph family. LPA/k-core localCheckpoint per round, so
    # the visible plan is the post-iteration tail only (like
    # x2_dedup_clusters); the per-round budget is two keyed shuffles
    # (count + arg-max) documented in graph_ext.py.
    "g_label_propagation": {"max_exchanges": 1},
    "g_community_sizes": {"max_exchanges": 7, "min_broadcast": 1},
    "g_modularity_lpa": {"max_exchanges": 11, "min_broadcast": 3},
    "g_kcore_membership": {"max_exchanges": 2},
    "g_degree_assortativity": {"max_exchanges": 7},
    "g_adamic_adar_topk": {"max_exchanges": 5, "min_broadcast": 1},
    "g_degree_histogram": {"max_exchanges": 5},
    # stream-stream FULL OUTER interval join (batch registration):
    # full outer cannot broadcast (both sides must retain unmatched
    # rows), so the correct plan IS the co-partitioned sort-merge join
    # — under streaming the same shape is the symmetric state-store
    # join with watermark eviction on both sides
    "st_stream_stream_full_outer": {"max_exchanges": 3, "pushed": True},
    # STL-lite: daily rollup (localCheckpoint cuts the scan) then
    # |days|-bounded lattice windows + one broadcast dow join
    "x4_stl_daily_revenue": {"max_exchanges": 2, "min_broadcast": 1},
    # Round-8 SQL-surface family. Quantified ALL/ANY rewrite: the two
    # per-group extrema relations broadcast (supplier-max is tiny; the
    # orders-max join may also fold under AQE) — the correlated probe
    # the syntax implies must never appear
    "sq_quantified_all_any": {"max_exchanges": 3, "min_broadcast": 1},
    # null-safe equi-join over the status×priority-bounded grouped
    # relation: EqualNullSafe must plan as a (broadcast) HASH join,
    # never a nested loop
    "j_null_safe_equality": {"max_exchanges": 3, "min_broadcast": 1},
    # one partitioned window pass (rank + 4 IGNORE NULLS navigations
    # share the frame) over one scan
    "w_nth_value_ignore_nulls": {"max_exchanges": 2},
    # calendar grid: scan + distinct on the pushed day>=28 filter
    "f_interval_month_arithmetic": {"max_exchanges": 2, "pushed": True},
    # backward + forward union-window asofs co-keyed on user_id, then
    # one broadcast-able equi-join on the probe id
    "j8_asof_nearest": {"max_exchanges": 3, "min_broadcast": 1},
    # five sufficient statistics in ONE map-side-combined global
    # aggregate over the daily rollup
    "a_regr_slope_revenue": {"max_exchanges": 2},
    # same budget shape as g_adamic_adar_topk + the two degree joins
    "g_jaccard_link_prediction": {"max_exchanges": 7, "min_broadcast": 3},
    # histograms are bin-bounded and localCheckpointed; everything
    # downstream (pair grid, two KL sums) joins bounded relations —
    # broadcast throughout
    "x4_js_divergence_sources": {"max_exchanges": 7, "min_broadcast": 4},
    # the distributed transition counting collapses into the bounded
    # collect (taxonomy² cells); the returned relation is the
    # driver-solved 4-row table — no shuffle by construction
    "x4_markov_attribution": {"max_exchanges": 0},
    # journey windows + transition groupBy + per-source entropy agg
    "x4_entropy_rate_transitions": {"max_exchanges": 4},
    # checkpointed cell table; O(cells²) theta join + three margin aggs
    "x4_kendall_tau_bins": {"max_exchanges": 6},
    # checkpointed contingency table + margins/grid/χ²/V closed form
    "x4_cramers_v_lang_source": {"max_exchanges": 9, "min_broadcast": 1},
    # checkpointed quantized relation + model-broadcast distance pass
    "x3_silhouette_centroid": {"max_exchanges": 2},
    # one window pass + one aggregate (winsorized sum reconstructed)
    "x4_winsorized_stats": {"max_exchanges": 2},
    # day-lattice rollup (checkpoint truncates the plan) + pair agg
    "x4_theil_sen_trend": {"max_exchanges": 1},
    # (day,user) distinct + ×7 explode + semi grid join + distinct agg
    "w_sliding_distinct_users": {"max_exchanges": 5, "min_broadcast": 1},
    # 168-cell profile: checkpointed counts + broadcast grid/total
    "x4_hour_dow_seasonality": {"max_exchanges": 2, "min_broadcast": 1},
    # Round-9 exact substring dedup (Lee et al. 2022). Spans: winnowing
    # fp self-join + candidate-doc semi joins (broadcast) + kgram hash
    # join + diagonal-run window + pair agg
    "x2_exact_substr_spans": {"max_exchanges": 9, "min_broadcast": 5},
    # coverage: kgram groupBy(h) + join back + per-doc window + doc join
    "x2_duplicated_token_fraction": {"max_exchanges": 4},
    "x2_exact_substr_corpus_rate": {"max_exchanges": 5},
    # RRF fusion: both halves pool-bounded; the full outer join of two
    # <=20-row rank lists cannot broadcast (outer both sides) — its
    # SMJ is over pools, not corpora
    "x4_rrf_hybrid_topk": {"max_exchanges": 7, "min_broadcast": 2},
    # WCC: per-round shuffles hidden behind localCheckpoint (the
    # dedup_clusters pattern); visible tail is the final projection
    "g_wcc_components": {"max_exchanges": 1},
    "g_wcc_size_histogram": {"max_exchanges": 3},
    # union-ingest dedup batch twin: two scans union + keyed window +
    # per-type agg
    "st_union_dedup_two_sources": {"max_exchanges": 3},
    # ExactSubstr apply step: coverage shape + the min-owner aggregate
    "x2_dup_span_removal": {"max_exchanges": 4},
    # QUALIFY rewrite: one keyed window + one rollup
    "w_qualify_above_customer_avg": {"max_exchanges": 3},
    # multiplier bootstrap: B-key map-combined agg + B-row windows +
    # scalar cross join (replicate grid broadcast)
    "x4_poisson_bootstrap_ci": {"max_exchanges": 3},
    # BFS: per-round shuffles behind localCheckpoint; visible tail is
    # the node left-join + histogram
    "g_bfs_hop_histogram": {"max_exchanges": 4, "min_broadcast": 1},
    # MMR: pool collected (bounded model fetch); result is a local
    # relation — zero shuffles by construction
    "x3_mmr_diversified_topk": {"max_exchanges": 0},
    # PRF pass 1 + feedback mining (broadcast 10-doc set)
    "x4_prf_expansion_terms": {"max_exchanges": 9, "min_broadcast": 3},
    # PRF both passes; all small sides broadcast, TakeOrdered tail
    "x4_prf_query_expansion": {"max_exchanges": 13, "min_broadcast": 7},
    # DISTINCT ON rewrite: keyed window + InferWindowGroupLimit prune
    "o_distinct_on_latest_order": {"max_exchanges": 2},
    # EXCLUDE CURRENT ROW rewrite: one keyed window pass
    "w_frame_exclude_current": {"max_exchanges": 2},
    # PCA: Gram partials collected (bounded model fetch); the returned
    # relation is the driver-iterated 64-row loading vector
    "x3_pca_power_iteration": {"max_exchanges": 0},
    # BPE: per-step shuffles behind localCheckpoint; visible tail is
    # the final pair aggregate + 1-row tops union
    "x4_bpe_merge_steps": {"max_exchanges": 6},
    # spans pipeline + two broadcast doc->source joins + bounded rollup
    "x2_exact_substr_cross_source": {"max_exchanges": 10, "min_broadcast": 7},
    # both pair pipelines + pair-relation full outer (SMJ over pairs,
    # not corpus) + one-row aggregate
    "x2_dedup_methods_agreement": {
        "max_exchanges": 12,
        "min_broadcast": 8,
        "max_exchanges_cold": 15,
    },
    # spans pipeline + the fp doc-frequency cap aggregate (one extra
    # keyed shuffle + broadcast keep-list)
    "x2_exact_substr_spans_capped": {"max_exchanges": 11, "min_broadcast": 9},
    # model apply: 64-int literal in a zip_with/aggregate expression —
    # one scan + one bucket-keyed agg (+ output order); zero joins
    "x3_pc1_projection_histogram": {"max_exchanges": 2},
    # bilinear join-view IVM: dim broadcast, five segment-keyed group
    # partials merged by broadcast left joins
    "d_incremental_join_maintenance": {"max_exchanges": 8, "min_broadcast": 5},
    # --- round 10 ---
    # rule battery: explode + per-doc agg + doc left-join + source rollup
    "x4_gopher_quality_rules": {"max_exchanges": 4, "min_broadcast": 1},
    # Hamilton allocation on the |langs| strata (broadcast), one keyed
    # selection window, bounded rollup
    "x4_stratified_proportional_sample": {"max_exchanges": 6, "min_broadcast": 1},
    # basket pair self-join + supports + anchor broadcast + top-k window
    "x4_item_item_recs": {"max_exchanges": 9, "min_broadcast": 3},
    # HITS: per-sweep shuffles behind localCheckpoint; visible tail is
    # the two 10-row tops union (the WCC/BPE pattern)
    # r16: the per-sweep checkpoint moved to the RAW aggregate-join
    # output, so the final plan normalizes lazily — the two 1-row
    # total aggregates (one per side) are the only exchanges left in
    # the collected plan; the sweep work itself lives in the
    # checkpoint jobs as before
    "g_hits_bipartite": {"max_exchanges": 0},  # r17: totals are
    # driver-inlined literals — the final plan reads only the
    # checkpointed sweep outputs (budget tightened 2 -> 0)
    # Bellman-Ford rounds behind localCheckpoint; visible tail is the
    # bucket histogram
    "g_sssp_weighted": {"max_exchanges": 2},
    # calendar-lattice driver solve: returned relation is one local row
    "x4_holt_linear_forecast": {"max_exchanges": 0},
    # global_row_number range shuffle (behind localCheckpoint) + shard rollup
    "x4_curriculum_shards": {"max_exchanges": 3},
    # bounds scalar + per-row morton arithmetic + bucket rollup
    "d_zorder_clustering_keys": {"max_exchanges": 3},
    # one array fold per row + label rollup
    "x3_vector_norm_audit": {"max_exchanges": 2},
    # BM25 chain + relevance join + two bounded rank windows + scalar cross
    "x4_ndcg_eval": {"max_exchanges": 12, "min_broadcast": 3},
    # merges behind localCheckpoint; visible: vocab join + source rollup
    "x4_bpe_encode_corpus": {"max_exchanges": 3, "min_broadcast": 1},
    # signature groupBy behind localCheckpoint; 4 config self-joins +
    # distinct + 1-row aggregates unioned
    "x2_lsh_band_tuning_curve": {"max_exchanges": 12, "min_broadcast": 4},
    # verbatim interval-range window: one keyed window + rollup +
    # TakeOrdered
    "w_range_interval_verbatim": {"max_exchanges": 2, "take_ordered": True},
    # 4-row VALUES dim -> BroadcastNestedLoopJoin (range condition)
    "u_values_inline_table": {"max_exchanges": 2, "min_broadcast": 1},
    # PPR rounds behind localCheckpoint; visible tail is TakeOrdered
    "g_personalized_pagerank": {"max_exchanges": 1, "take_ordered": True},
    # --- round 11 ---
    # CDC apply: rank window + op-count agg share the user_id exchange;
    # the snapshot join is the only extra (AQE broadcasts the 12-row
    # latest side)
    "d_cdc_apply_snapshot": {"max_exchanges": 4, "min_broadcast": 1},
    # two sketch rollups (shard then merge), CDF windows, broadcast
    # quantile targets
    "a_hdr_quantile_sketch": {"max_exchanges": 4},
    # unigram-LM trainer: 40 unrolled DP steps behind localCheckpoint
    # (the HITS/WCC pattern); visible tail is the final count-cost
    # join + rank window
    "x4_unigram_lm_vocab": {"max_exchanges": 3, "min_broadcast": 1},
    # encode: per-source word count + rollup joins on the checkpointed
    # model relations (AQE broadcasts the word-type sides)
    "x4_unigram_encode_corpus": {"max_exchanges": 6, "min_broadcast": 2},
    # resolution sweep: exploded rollup + per-r CDF windows + the
    # de-globalized exact prefix scan (range repartition counts as
    # exchanges)
    "a_sketch_resolution_sweep": {"max_exchanges": 7, "min_broadcast": 1},
    # streaming CDC batch twin: one keyed arg-max aggregate + sort
    "st_cdc_running_snapshot": {"max_exchanges": 2},
    # kappa: confusion matrix checkpointed (|langs|^2), three bounded
    # rollups + 1-row cross joins
    "x4_labeler_agreement_kappa": {"max_exchanges": 4, "min_broadcast": 1},
    # packing sweep: sized relation + per-source prefix window,
    # exploded x|lengths|, two bounded rollups
    "x4_packing_context_sweep": {"max_exchanges": 5, "min_broadcast": 1},
    # state-capacity audit: two user_id rollups + day-relation join +
    # calendar-bounded running window (SinglePartition on ~30 rows)
    "st_state_capacity_by_day": {"max_exchanges": 6},
    # DoReMi step: two vocab-bounded count joins, checkpointed lp
    # instances read twice, |sources|-bounded weight math
    "x4_doremi_weight_step": {"max_exchanges": 6},
    # IVF staleness: two Arrow assignment scans over the checkpointed
    # quantized relation + one per-list rollup + 1-row cost joins
    "x3_ivf_staleness_audit": {"max_exchanges": 5},
    # unigram vocab sweep: 50 DP steps behind localCheckpoint; visible
    # tail is the enc join + rollup
    "x4_unigram_vocab_sweep": {"max_exchanges": 3, "min_broadcast": 1},
    # bloom FPR sweep: one hashed relation, width-prefix explode,
    # keyed hit rollups + small left joins on h
    "j_bloom_fpr_sweep": {"max_exchanges": 6, "min_broadcast": 2},
    # minhash k sweep: the estimate-error pair build (candidate-
    # restricted exact tier) + one stacked rollup
    "x2_minhash_k_sweep": {
        "max_exchanges": 9,
        "min_broadcast": 4,
        "max_exchanges_cold": 10,
    },
    # QL-Dirichlet: dl rollup + broadcast query stats + tf left join,
    # TakeOrderedAndProject top-k
    "x4_query_likelihood_topk": {"max_exchanges": 4, "min_broadcast": 3,
                                 "take_ordered": True},
    # l-diversity: two class-keyed rollups, never event-keyed
    "x4_l_diversity_audit": {"max_exchanges": 3},
    # k-means behind kmeans_model's checkpoints; per-config candidate
    # restriction + top-10 + hit join are all broadcast-side
    "x3_ivf_nprobe_recall_sweep": {"max_exchanges": 4, "min_broadcast": 8},
    # one-scan unpivot + column-keyed distinct/minmax aggregate
    "d_analyze_table_stats": {"max_exchanges": 3},
    # scan-side bucket expr + one map-combined agg + ordered limit
    "f_time_bucket_15min": {"max_exchanges": 1, "take_ordered": True},
    # per-n: explode+distinct + broadcast eval semi + per-doc agg,
    # three independent configs unioned
    "x4_decontam_ngram_sweep": {"max_exchanges": 12, "min_broadcast": 3},
    # one inverted-index pair join behind localCheckpoint; r16: the
    # per-tau branches folded into ONE flag projection + two aggregates
    # (pair-count pass + exploded-endpoint groupBy), so the plan drops
    # from 12 exchanges / 4 crossJoin broadcasts to 3 shuffles + the
    # single 1-row crossJoin of the two aggregate rows
    "x2_jaccard_threshold_sweep": {"max_exchanges": 4, "min_broadcast": 1},
    # score relation behind localCheckpoint; per-tau one aggregate
    "x4_quality_threshold_sweep": {"max_exchanges": 3},
    # --- round 12 ---
    # kgram groupBy(h) + join-back + position explode distinct + anti
    # join + per-doc rebuild agg; dims of the rebuild all broadcast
    # r16 array-based rebuild: removed positions aggregate (small) +
    # doc-keyed join back; token bytes never enter an exchange
    "x2_removal_rematerialize": {"max_exchanges": 4, "min_broadcast": 2},
    # the kept relation feeds a second gram window + dup rollup plus
    # four single-row audits cross-joined (each its own tiny exchange)
    "x2_rematerialize_boundary_audit": {"max_exchanges": 11, "min_broadcast": 3},
    # ONE corpus window pass into a checkpointed (doc,b) count
    # relation; LM rollups + b-keyed ratio join + TakeOrdered cut
    "x4_dsir_importance_topk": {"max_exchanges": 9, "min_broadcast": 2,
                                "take_ordered": True},
    # token scan -> map-combined count -> top-100 -> 100-row moments
    # (the rank window runs on the N-bounded head only)
    "x4_zipf_alpha_fit": {"max_exchanges": 3},
    # two global_running prefix scans over the per-doc lattice + one
    # moment aggregate; localCheckpoint cuts the visible plan
    "x4_heaps_law_fit": {"max_exchanges": 4},
    # two keyed rollups + |types| broadcast + class-keyed join chain
    "x4_t_closeness_audit": {"max_exchanges": 7, "min_broadcast": 2},
    # corpus scan x NQ x |dims| broadcasts; ranks via keyed window on
    # the (qid, p) lattice; recall joins are lattice-sized
    "x3_matryoshka_prefix_recall": {"max_exchanges": 5, "min_broadcast": 1},
    # global_row_number (range exchange) + batch rollup + lagged
    # self-joins (batch-lattice-sized, broadcast) + event-batch join
    "st_watermark_drop_ledger": {"max_exchanges": 6, "min_broadcast": 3},
    # frame plan is scan-side arithmetic; one keyed embedding join +
    # output sort
    "x5_av_segment_alignment": {"max_exchanges": 3, "min_broadcast": 1},
    # sparse text tower groupBy + exploded image tower rollup + two
    # media-keyed joins; towers co-keyed on media_id
    "x5_crossmodal_clip_gate": {"max_exchanges": 7, "min_broadcast": 2},
    # one token scan -> two per-doc windows -> chunk rollup -> h rollup
    "x2_cdc_chunk_dedup": {"max_exchanges": 3},
    # ONE corpus window pass (checkpointed per-doc bigram counts),
    # vocab-bounded LM rollups + bigram-keyed lp join + doc rollup
    "x4_doc_perplexity_filter": {"max_exchanges": 7, "min_broadcast": 2},
    # one scored pass cut to max(budgets) (TakeOrdered), rank over the
    # bounded head, broadcast budgets join
    "x4_dsir_budget_sweep": {"max_exchanges": 9, "min_broadcast": 2,
                             "take_ordered": True},
    # (gap x events) keyed windows + two rollups — one compound-key
    # shuffle serves all four gaps
    "st_session_gap_sweep": {"max_exchanges": 3},
    # one replay (range exchange) + batch rollup + broadcast delays
    "st_watermark_delay_sweep": {"max_exchanges": 4, "min_broadcast": 1},
    # one metadata scan -> |modalities| rollup + broadcast targets
    "x5_modality_balance_audit": {"max_exchanges": 4, "min_broadcast": 1},
    # both scorers share one token scan; rankings via global_row_number
    # (range exchanges behind the checkpoint cut); rank join on doc_id
    "x4_ranker_agreement": {"max_exchanges": 3, "min_broadcast": 1},
    # one token scan -> two source-keyed map-combined rollups
    "x4_entropy_per_source": {"max_exchanges": 5, "min_broadcast": 1},
    # held-out bigram relation joined to vocab-bounded train counts,
    # checkpointed once; each lambda is one aggregate of it
    "x4_lm_interpolation_sweep": {"max_exchanges": 4},
    # one (day,user) map-combined rollup + one day rollup
    "x4_dp_sensitivity_audit": {"max_exchanges": 3},
    # fingerprint scan -> band-key self-join -> pair distinct -> two
    # phash fetch joins -> nibble rollup (joins broadcast at test SF)
    "x5_phash_hamming_neardup": {"max_exchanges": 4, "min_broadcast": 1},
    # one embedding scan -> (clip, frame+1) self-join -> clip rollup
    "x5_scene_cut_detection": {"max_exchanges": 2, "min_broadcast": 1},
    # one corpus scan serves all widths (3-row sweep explode); two
    # 5-query rank windows + the recall join + the distortion rollup
    "x3_sq_bits_sweep": {"max_exchanges": 6, "min_broadcast": 2},
    # one event scan + width explode -> (w, user, bucket) self-join
    # -> pair-dedup rollup + fan-out rollup
    "j_range_bin_width_sweep": {"max_exchanges": 6},
    # per-side day rollups + lattice prefix scans (global_running
    # range exchanges) + the two lattice forward-fill rollups (the
    # empty-side-batch fix) + two bounded theta joins against the
    # broadcast |batches|-row watermark relation
    "st_join_state_ledger": {"max_exchanges": 10, "min_broadcast": 4},
    # minhash/band pipeline + broadcast eval bands + candidate-pruned
    # shingle join + per-train rollup
    # r16: bands + shingles served from the persisted indexes — the
    # three inline Arrow text passes and two signature groupBys drop
    # out of the warm plan (10 -> 6 shuffles); cold runs them inline
    "x4_fuzzy_decontam": {"max_exchanges": 6, "max_exchanges_cold": 9,
                          "min_broadcast": 5},
    # one scan -> bounded per-clip windows -> segment rollup + argmax
    # equi-join back
    "x5_keyframe_selection": {"max_exchanges": 3, "min_broadcast": 1},
    # one scan x 4 factors -> (factor, key, salt) map-combined rollup
    # -> factor rollup + two 1-row global aggregates
    "j_salt_factor_sweep": {"max_exchanges": 6},
    # four independent trainings (k=2/4/8/16): per k one cluster-count
    # rollup + one global aggregate over the assignment scan
    "x3_kmeans_k_sweep": {"max_exchanges": 12, "min_broadcast": 4},
    # one |langs|-bounded map-combined rollup + scan-side arithmetic
    "x4_epochs_repeat_audit": {"max_exchanges": 2},
    # anchors against one corpus scan, label filter before the
    # 5-anchor rank windows
    "x3_hard_negative_mining": {"max_exchanges": 2},
    # token explode + md5 gate -> bounded span explode -> distinct +
    # keyed run self-join -> per-doc rollup
    "x4_span_corruption_plan": {"max_exchanges": 5, "min_broadcast": 1},
    # two keyed rollups to the |days| lattice x 3 exploded budgets
    "x4_dp_epsilon_utility_sweep": {"max_exchanges": 4},
    # four-stage composed funnel: checkpointed population + the exact
    # dedup groupBy + the phash band/verify chain + the clip towers,
    # each stage one scalar aggregate
    "x5_media_curation_attrition": {"max_exchanges": 15, "min_broadcast": 6},
    # four namespaced ledger evaluations (incl. the per-side lattice
    # forward-fills); every exchange moves the ~30-row day lattice,
    # not the event relation
    "st_join_state_delay_sweep": {"max_exchanges": 36, "min_broadcast": 8},
    # four ledger evaluations over one shared ranked replay; lattice
    # exchanges only (1/size of the stream each) + the 1-row lazy
    # denominator aggregate (r12 advice: no eager count at plan time)
    "st_batch_size_drop_sweep": {"max_exchanges": 17},
    # one checkpointed global ranking + per-arm bounded re-ranks +
    # the label-pruned truth tier
    "x3_filtered_topk_postfilter_sweep": {"max_exchanges": 10, "min_broadcast": 2},
    # the rematerialize anti-join chain + two type rollups + the
    # KL join (per-type floors, exact sums)
    "x2_dedup_distribution_shift": {"max_exchanges": 14, "min_broadcast": 3},
    # pre-filter filtered-ANN (r13): the label predicate must ride
    # INSIDE the ivf_list-pruned index scan — one FileScan line with
    # BOTH the partition filter and the pushed row filter
    "x3_filtered_topk_prefilter": {
        "pushed_in_pruned_scan": ("ivf_list", "label"),
    },
    # eval embeddings broadcast (BroadcastNestedLoopJoin — crossJoin of
    # a broadcast side); shuffles = flagged-doc rollup + output order
    "x3_semantic_decontam": {"max_exchanges": 2, "min_broadcast": 1},
    # r14 exact ball-bound-pruned serving tier: the (query, list)
    # qualification relation broadcasts onto the index's ivf_list
    # partition column, and Spark plants a dynamic-partition-pruning
    # subquery at the scan — disqualified list dirs are never opened
    "x3_semantic_decontam_indexed": {
        "max_exchanges": 2,
        "min_broadcast": 1,
        "dpp_on": "ivf_list",
    },
    # both tiers' plans in one query (indexed flags ∩ brute flags);
    # the indexed side must still carry its DPP subquery
    "x3_semantic_decontam_recall": {
        "max_exchanges": 2,
        "min_broadcast": 1,
        "dpp_on": "ivf_list",
    },
    # fixed-size eval split through the same DPP-pruned exact join —
    # the probe variant whose slope isolates plan scaling
    "x3_semantic_decontam_fixed_eval": {
        "max_exchanges": 2,
        "min_broadcast": 1,
        "dpp_on": "ivf_list",
    },
    # r15: commits + per-version rollups run eagerly at plan time (the
    # commit protocol IS the operator; r14-advice tmpdir fix made the
    # rollups eager so the scratch table can be removed) — the
    # returned plan is a local row scan + one output sort
    "d_txlog_time_travel": {"max_exchanges": 1},
    # r15 (VERDICT r14 item 1b): exactly-once streaming commits —
    # 8 foreachBatch-shaped writes (4 replays absorbed) run eagerly;
    # returned plan is the 4 collected rollup rows + one output sort
    "st_txlog_exactly_once": {"max_exchanges": 1},
    # r15: zone-map file skipping — clustered OPTIMIZE + stats-pruned
    # range read run eagerly; returned plan is one collected row
    "d_txlog_file_skipping": {"max_exchanges": 0},
    # r15: metadata-only ADD COLUMNS + NULL-fill update — commits and
    # per-version rollups run eagerly; returned plan is the collected
    # rows + one output sort
    "d_txlog_schema_evolution": {"max_exchanges": 1},
    # r15: incremental (streaming-source) reads of the commit log —
    # four append writes + four add-list-only batch rollups run
    # eagerly; returned plan is the collected rows + one output sort
    "st_txlog_incremental_read": {"max_exchanges": 1},
    # exact two-phase ball-bound top-k: phase-2 scan carries a literal
    # ivf_list partition filter and compiles to TakeOrderedAndProject
    "x3_exact_topk_indexed": {
        "max_exchanges": 0,
        "partition_pruned_on": "ivf_list",
        "take_ordered": True,
    },
    # r16 clustered-arm twin: same static-pruned shape over the
    # derived clustered corpus's own index; the pruned_some hash pin
    # is the semantic guard, this pin guards the plan (1 shuffle =
    # output ordering; broadcast = the 1-row query relation)
    "x3_radius_search_clustered": {
        "max_exchanges": 1,
        "min_broadcast": 1,
        "partition_pruned_on": "ivf_list",
    },
    # single-query radius search: driver-side qualification -> LITERAL
    # ivf_list partition filter (static sibling of the DPP path)
    "x3_radius_search": {
        "max_exchanges": 1,
        "min_broadcast": 1,
        "partition_pruned_on": "ivf_list",
        "pushed": True,
    },
    # three contamination tiers + anti-join chain + 4 stage aggregates;
    # eval sides broadcast inside every component
    # r16: exact+fuzzy tiers index-served (see those entries) — warm
    # funnel 18 -> 14 shuffles; cold = the old inline shape
    "x4_decontam_funnel": {"max_exchanges": 14, "max_exchanges_cold": 18,
                           "min_broadcast": 8},
    # same three tiers left-joined onto the train population + the
    # <=7-cell membership groupBy
    "x4_decontam_tier_overlap": {"max_exchanges": 11,
                                 "max_exchanges_cold": 15,
                                 "min_broadcast": 8},
    # three pruned+pushed index probes + bounded ranks + 1-row verdicts
    "x3_prefilter_selectivity_sweep": {
        "pushed_in_pruned_scan": ("ivf_list", "label"),
    },
    # content-hash rollup + co-keyed join back + output order
    "x2_softdedup_weights": {"max_exchanges": 4},
    # ONE hash-partitioned shuffle serves both windows + output order
    "x1_dedup_keep_best": {"max_exchanges": 2},
}


#: Queries allowed to carry an unpartitioned Window over a relation
#: that is bounded by construction but NOT via a Limit node in the
#: window's child subtree (the generic check below cannot see
#: semantic bounds). Every entry must say WHY the input is bounded.
UNPARTITIONED_WINDOW_OK: dict[str, str] = {
    # Every entry: the single-partition window's INPUT relation is
    # bounded by construction (a lattice/grid whose cardinality is
    # fixed by the domain, not by data volume), so one task sorting it
    # is O(constant) at any SF. Corpus-sized relations NEVER qualify.
    "w3_range_frame_price_band": "width-5000 price-bin lattice prefix "
    "(<= max_price/5000 rows, fixed by the price domain)",
    "w_share_of_total": "market-segment rollup (5 rows)",
    "x4_vocab_growth": "doc-count bucket lattice (corpus_size/bucket_width "
    "buckets of the growth curve, ~100 points by design)",
    "x4_ks_source_drift": "shared quantile grid (fixed q points)",
    "x4_kaplan_meier_conversion": "event-time day lattice (|days| rows)",
    "x4_cusum_changepoint": "day lattice (|days| rows)",
    "x4_forecast_backtest": "day lattice (|days| rows)",
    "x4_mutual_information_lang_source": "lang x source contingency cells",
    "x4_stl_daily_revenue": "day lattice (|days| rows)",
    "f_yoy_mom_growth": "month lattice (|months| rows)",
    "x4_poisson_bootstrap_ci": "bootstrap replicate totals (B rows)",
    "x4_stratified_proportional_sample": "per-language quota rows "
    "(largest-remainder seat assignment over |langs|)",
    "x4_doremi_weight_step": "per-source weight rows (|sources|)",
    "st_state_capacity_by_day": "day lattice (|days| rows)",
}


def _top_level_bracket_groups(s: str) -> list[str]:
    """Top-level [...] group contents in a node's argument text."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            elif depth > 0:
                buf.append(ch)
            else:
                depth = 0
        elif depth > 0:
            buf.append(ch)
    return groups


def _window_is_partitioned(node: str) -> bool:
    """True if a ``Window ...`` physical node has a non-empty partition
    spec. TreeNode.argString OMITS empty child lists, so the printed
    shapes are: 3 groups = [exprs],[part],[order]; 2 groups = either
    [exprs],[part] (partition-only) or [exprs],[order] (order-only —
    the dangerous global sort); 1 group = neither. Order-spec entries
    always carry a sort direction (``ASC NULLS``/``DESC NULLS``),
    partition entries never do."""
    groups = _top_level_bracket_groups(node)
    if len(groups) >= 3:
        return True
    if len(groups) == 2:
        last = groups[-1]
        return "ASC NULLS" not in last and "DESC NULLS" not in last
    return False


def _spine_has_bounded_head(lines: list[str], i: int, depth: int) -> bool:
    """True when a bounding node (TakeOrderedAndProject / GlobalLimit /
    CollectLimit) sits on the window's DIRECT input chain: walk first
    children only, stopping at any multi-child node (a Limit on one
    branch of a join says nothing about the other branch — the r13
    advice's counterexample) and at any cardinality-expanding
    single-child node (Generate/explode can re-inflate a limited
    input by a data-dependent factor)."""

    def d_of(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-"))

    def name_of(s: str) -> str:
        return re.sub(r"^\*\(\d+\) ", "", s.lstrip(" :+-"))

    cur, cur_d = i, depth
    while True:
        sub_idx = []
        for k in range(cur + 1, len(lines)):
            if not lines[k].strip():
                continue
            dk = d_of(lines[k])
            if dk <= cur_d:
                break
            sub_idx.append(k)
        if not sub_idx:
            return False  # reached a leaf without meeting a bound
        child_d = min(d_of(lines[k]) for k in sub_idx)
        children = [k for k in sub_idx if d_of(lines[k]) == child_d]
        if len(children) != 1:
            return False  # join/union: bound not attributable
        c = children[0]
        nm = name_of(lines[c])
        if nm.startswith(("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")):
            return True
        if nm.startswith("Generate"):
            return False  # explode below would re-inflate any bound above it
        cur, cur_d = c, child_d


def unbounded_global_windows(plan: str) -> list[str]:
    """Generic scale check (round-13, VERDICT r12 item 2): a Window
    node with an EMPTY partition spec moves every input row into one
    task (Spark's own `WindowExec: No Partition Defined` warning). That
    is only acceptable when the window's DIRECT INPUT CHAIN provably
    bounds cardinality — a Limit / TakeOrderedAndProject on the
    first-child spine (round-14, r13 advice: the earlier
    anywhere-in-subtree test let a Limit on one join branch excuse a
    window fed by the other, unbounded, branch). Returns a description
    per offending Window node.

    Spelling detail: WindowExec prints as
    ``Window [exprs], [partSpec], [orderSpec]`` when partitioned and
    ``Window [exprs], [orderSpec]`` when not — 3 vs 2 top-level
    bracket groups."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        node = line.lstrip(" :+-")
        node = re.sub(r"^\*\(\d+\) ", "", node)
        if not node.startswith("Window ") and not node.startswith("RunningWindowFunction "):
            continue
        if _window_is_partitioned(node):
            continue  # partitioned window — parallel by key
        depth = len(line) - len(line.lstrip(" :+-"))
        if _spine_has_bounded_head(lines, i, depth):
            continue  # bounded head feeds the single-partition sort
        bad.append(node[: 100].strip())
    return bad


def audit(name: str, plan: str, exp: dict, cold: bool = False) -> list[str]:
    problems = []
    n_ex = len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))
    # BroadcastNestedLoopJoin is the broadcast form for non-equi joins
    # (e.g. the batched-retrieval bounded fan-out)
    n_bc = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    # cache-state-aware budgets: the inline-fallback plan legitimately
    # carries its ingest shuffles; audit it against ITS pin
    max_ex = exp.get("max_exchanges")
    min_bc = exp.get("min_broadcast", 0)
    if cold:
        max_ex = exp.get("max_exchanges_cold", max_ex)
        min_bc = exp.get("min_broadcast_cold", min_bc)
    if max_ex is not None and n_ex > max_ex:
        problems.append(
            f"{n_ex} shuffles (budget {max_ex}, {'cold' if cold else 'warm'})"
        )
    if min_bc > n_bc:
        problems.append(f"only {n_bc} broadcast joins (need {min_bc})")
    if exp.get("pushed") and "PushedFilters: [" not in plan.replace("PushedFilters: []", ""):
        problems.append("no pushed filters reached the scan")
    if exp.get("take_ordered") and "TakeOrderedAndProject" not in plan:
        problems.append("global top-k did not compile to TakeOrderedAndProject")
    if exp.get("no_window") and "Window" in plan:
        problems.append("plan contains a Window operator (pinned window-free)")
    if exp.get("partition_pruned") and (
        "PartitionFilters: [" not in plan or "PartitionFilters: []" in plan
    ):
        problems.append("index scan is not partition-pruned")
    if exp.get("pushed_in_pruned_scan"):
        part_col, row_col = exp["pushed_in_pruned_scan"]
        hit = any(
            re.search(r"PartitionFilters: \[[^\]]*" + re.escape(part_col), ln)
            and re.search(r"PushedFilters: \[[^\]]*" + re.escape(row_col), ln)
            for ln in plan.splitlines()
        )
        if not hit:
            problems.append(
                f"no scan carries BOTH PartitionFilters on {part_col} and "
                f"PushedFilters on {row_col} (pre-filter must ride the pruned scan)"
            )
    if exp.get("dpp_on") and not re.search(
        r"dynamicpruningexpression\([^)]*" + re.escape(exp["dpp_on"]), plan
    ):
        problems.append(
            f"no dynamic-partition-pruning subquery on {exp['dpp_on']} at any "
            "scan (the qualification relation must prune the index read)"
        )
    if exp.get("partition_pruned_on") and not re.search(
        r"PartitionFilters: \[[^\]]*" + re.escape(exp["partition_pruned_on"]), plan
    ):
        # column may appear anywhere inside the (possibly paren-heavy,
        # possibly toString-truncated) filter list — match the bracket
        # contents, not a literal prefix
        problems.append(
            f"no partition filter on {exp['partition_pruned_on']} in any scan"
        )
    # codegen spans appear as "*(n) Operator" in the simple plan string
    if "*(" not in plan and "WholeStageCodegen" not in plan:
        problems.append("no whole-stage-codegen span")
    # generic scale gate (applies to EVERY query, expectations or not):
    # no unpartitioned Window over an unbounded input — the
    # x4_zipf_slope regression class (r12 verdict item 2)
    if name not in UNPARTITIONED_WINDOW_OK:
        for w in unbounded_global_windows(plan):
            problems.append(f"unpartitioned Window without bounded head: {w}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--all",
        action="store_true",
        help="audit every registered query (generic checks apply even "
        "without an EXPECTATIONS entry); default audits EXPECTATIONS only",
    )
    ap.add_argument(
        "--cold",
        action="store_true",
        help="force the persisted-index FALLBACK (inline) pipelines via "
        "SPARK_GRAFT_FORCE_FALLBACK and audit against the *_cold budgets "
        "— the deterministic spelling of the index-unavailable state",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import os

    if args.cold:
        os.environ["SPARK_GRAFT_FORCE_FALLBACK"] = "1"

    from etl_generator_demo_spark.operators import _fallback
    from etl_generator_demo_spark.registry import load_all
    from etl_generator_demo_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = args.names or (list(registry) if args.all else list(EXPECTATIONS))
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"error: unknown queries {unknown}; known: {sorted(registry)}")
        return 2
    bad = 0
    for name in names:
        ev0 = _fallback.events()
        df = registry[name].fn(spark, args.sf)
        df.collect()  # AQE finalizes (and codegen-wraps) the plan only on execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        # executed AdaptiveSparkPlan prints Final AND Initial subtrees;
        # audit only the final one
        plan = plan.split("== Initial Plan ==")[0]
        # a fallback event during THIS query's build/run means its plan
        # is the inline (cold) shape — audit it against the cold budget
        cold = args.cold or _fallback.events() > ev0
        problems = audit(name, plan, EXPECTATIONS.get(name, {}), cold=cold)
        n_ex = len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))
        codegen_stages = len(set(re.findall(r"\*\((\d+)\)", plan)))
        summary = (
            f"state={'cold' if cold else 'warm'} shuffles={n_ex} "
            f"bcast={plan.count('BroadcastHashJoin')} "
            f"smj={plan.count('SortMergeJoin')} codegen_stages={codegen_stages}"
        )
        if problems:
            bad += 1
            print(f"WARN {name}: {summary} | " + "; ".join(problems))
        else:
            print(f"OK   {name}: {summary}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
