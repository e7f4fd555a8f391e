#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Each query is forced through full materialization with the noop sink (count()
would let Catalyst prune expensive columns such as the signing UDF).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _out_root() -> str:
    """Directory the bench's sidecar artifacts (BENCH_DETAIL.json,
    BENCH_FLOOR.json) are written to — the repo root in real runs; tests
    point SPARK_GRAFT_BENCH_OUT_DIR at a tmp dir so a subset/failpoint
    run cannot clobber the committed artifacts."""
    return os.environ.get("SPARK_GRAFT_BENCH_OUT_DIR") or os.path.dirname(
        os.path.abspath(__file__)
    )

HEADLINE = [
    # standard OLAP
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume",
    # reference pipelines
    "ref_ingest_partition_assign",
    "ref_minute_sum",
    "ref_sign_pipeline",
    "ref_keyring_lookup_join",
    # LLM-pipeline extensions
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "text_stats_quality",
    "llm_prep_pipeline",
    # time-series + skew ops
    "ts_asof_join",
    "scale_salted_hot_key_agg",
    # streaming path
    "stream_minute_sum",
]


# The documented bench exclusions, in one place: registered queries that are
# deliberately not timed, with the scale rationale. Everything else in the
# registry is fair game for HEADLINE/ext (the driver's correctness sweep
# still checks excluded queries every round).
BENCH_EXCLUDED = {
    "graph_triangle_count": (
        "O(E^1.5) degree-oriented wedge enumeration — a multi-second "
        "analytic batch job by design, not a latency-bound query"
    ),
    "graph_clustering_coefficient": (
        "same wedge machinery as triangle counting (plus per-node "
        "normalization); excluded for the same O(E^1.5) reason"
    ),
    "dedup_embedding_cosine": (
        "brute-force all-pairs exact baseline by documented design "
        "(O(n^2) dot products; ~37 s at sf0.1) — the scale paths it "
        "baselines (sim_ann_lsh/ivf, emb_ivfpq_search) are what the "
        "bench times"
    ),
    "text_bpe_train_k": (
        "k=8 training iterations = 8 full corpus scans by definition "
        "(~8 s at sf0.1) — a tokenizer-TRAINING batch job, not a "
        "latency-bound query; its single-scan serving siblings "
        "(text_bpe_encode, text_bpe_compression_by_lang) are benched"
    ),
}


EXT = [
    "rag_bm25_topk",
    "rag_rrf_fusion",
    "text_repetition_stats",
    "text_chunk_dedup",
    "sketch_kmv_distinct",
    "ts_m4_downsample",
    "seq_pattern_match",
    "lake_snapshot_diff",
    # round-4 additions
    "data_domain_quota",
    "emb_pq_codes",
    "emb_ivfpq_search",
    "lake_mor_delete_read",
    "sim_ann_ivf_recall_eval",
    "text_boilerplate_ngrams",
    "text_dup_span_fraction",
    "emb_matryoshka_recall",
    "sketch_theta_union",
    "profile_outlier_mad",
    "scale_range_boundaries",
    # round-4 wave 2
    "er_blocking_fuzzy_join",
    "rag_hybrid_rrf",
    "profile_correlation_matrix",
    "profile_entropy",
    "seq_markov_transitions",
    "profile_quantile_bins",
    "ts_autocorr",
    # round-4 connectors (full source→decode→sink loops, so these time
    # the DataSource protocol overhead, not just the query plan)
    "stream_firehose_directput",
    "stream_kv_upsert_sink",
    # round-4 wave 3 (statistical signals)
    "llm_bigram_lm_score",
    "ts_stl_decompose",
    "profile_psi_drift",
    "profile_mutual_information",
    "attribution_linear_multi_touch",
    "graph_adamic_adar",
    "cohort_cumulative_hazard",
    "emb_hard_negative_mining",
    "llm_filter_stack",
    "ts_stl_anomaly",
    "profile_freshness_lag",
    "text_langid_eval",
    # round-5 wave (corpus curation, vector diagnostics, journeys)
    "text_exact_substring_dedup",
    "llm_quality_classifier",
    "data_temperature_sample",
    "text_readability_score",
    "text_zipf_fit",
    "rag_ndcg_eval",
    "emb_power_iteration",
    "emb_centroid_outliers",
    "sketch_bottomk_jaccard_eval",
    "ts_burst_ratio",
    "attribution_u_shaped",
    "graph_copurchase_lift",
    "lake_time_travel_read",
    # round-5 governance trio
    "lake_scd2_build",
    "privacy_l_diversity",
    "dedup_containment",
    # round-5 SLO replay pair
    "ref_slo_queue_backtest",
    "ref_alarm_episodes",
    # round-6 wave (manifest/alarm connectors, web provenance,
    # tokenizer application, cross-modal dedup)
    "stream_manifest_lake",
    "stream_alarm_actions",
    "url_parse_extract",
    "url_canonical_dedup",
    "url_registrable_domain",
    "url_domain_content_dedup",
    "text_bpe_encode",
    "text_bpe_compression_by_lang",
    "mm_crossmodal_joint_dedup",
    "data_dedup_keep_best",
    # round-6 wave 2 (audits + retrieval polish)
    "privacy_t_closeness",
    "ref_slo_burn_rate",
    "rag_mmr_rerank",
    "text_unigram_kl_mix",
    "lake_manifest_health",
    "emb_pair_cosine_hist",
    "seq_user_path_topk",
    # round-6 wave 3 (curation audits)
    "dedup_cluster_size_hist",
    "data_epoch_mix_plan",
    "llm_quality_calibration",
    "privacy_pii_density",
    # round-6 wave 4 (training-mix governance)
    "data_shuffle_shard_audit",
    "web_license_gate",
    "dedup_quality_interaction",
    "emb_dedup_threshold_sweep",
    "privacy_dp_count_release",
    # round-6 wave 5 (split/lateness audits)
    "ops_watermark_planner",
    "data_split_leakage",
    "dedup_survivorship_audit",
    # round-6 wave 6 (release gates)
    "llm_dataset_card",
    "llm_classifier_threshold_sweep",
    "mm_scene_segments",
    "privacy_k_suppression_curve",
    # round-6 wave 7 (exact late-data semantics)
    "stream_watermark_late_drop",
    "stream_dedup_ttl_boundary",
    "stream_join_state_boundary",
    # round-6 wave 8 (ANN serving polish)
    "sim_ann_ivf_nprobe_curve",
    "sim_ann_filtered_topk",
    # round-7 (exact-rescore refine stage)
    "emb_ivfpq_refine",
    # round-10 (streaming CDC→SCD2): timed IN ext rather than joining
    # the excluded set — its per-trial cost is the 6-batch MERGE
    # protocol itself (affected-bucket reads + overwrites, the
    # operator under test), not replay harness; the CDC staging is
    # content-cached so trials never pay the slice synthesis
    "stream_cdc_scd2",
]


def _load_prev_bench() -> tuple[str, dict[str, float], float | None] | None:
    """Previous run's (source name, per-query seconds, board median) for
    the vs_prev ratio table; the board median (the prev run's
    ``vs_floor.median_ratio``, None when absent) is the window yardstick
    ``adjudicate_vs_prev`` normalizes with (VERDICT r12 #4).

    Preferred source: the committed sidecar BENCH_DETAIL.json (every bench
    run writes it; it replaced the in-line per-query maps when the printed
    JSON line outgrew the driver's 2000-char tail capture in round 4).
    Fallback: the latest driver BENCH_r*.json (rounds 1-3 carry a parsed
    per-query map; later rounds' tails are truncated, hence the regex)."""
    import glob
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    sidecar = os.path.join(root, "BENCH_DETAIL.json")
    try:
        sf_now = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf_now = -1.0
    if os.path.exists(sidecar):
        try:
            with open(sidecar) as f:
                raw = json.load(f)
            times = {**raw.get("queries", {}), **raw.get("queries_ext", {})}
            # a sidecar from a different scale factor (e.g. a local sf0.001
            # smoke run) would make every vs_prev ratio nonsense — skip it
            if times and raw.get("sf") == sf_now:
                med = raw.get("vs_floor", {}).get("median_ratio")
                return ("BENCH_DETAIL.json", times, med)
        except (OSError, ValueError):
            pass
    cands = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if not cands:
        return None
    path = cands[-1]
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        return None
    prev = raw.get("parsed") if isinstance(raw, dict) else None
    if not isinstance(prev, dict):
        tail = raw.get("tail", "") if isinstance(raw, dict) else ""
        prev = {}
        for key in ("queries", "queries_ext"):
            m = re.search(r'"%s":\s*(\{[^{}]*\})' % key, tail)
            if m:
                try:
                    prev[key] = json.loads(m.group(1))
                except ValueError:
                    pass
    times = {**prev.get("queries", {}), **prev.get("queries_ext", {})}
    med = None
    if isinstance(prev, dict):
        med = prev.get("vs_floor", {}).get("median_ratio")
    return (os.path.basename(path), times, med) if times else None


def _load_floor(sf_now: float) -> dict | None:
    """BENCH_FLOOR.json: per-query minimum steal-clean time across
    calib-gated runs (r8 lesson: this host has no reliably quiet mode —
    single-window sidecars encode whatever weather the window carried, so
    round-over-round ratios flag phantom regressions. A rolling minimum
    is monotone and weather-free: current > 1.25x floor is only called a
    regression if the query's plan fingerprint ALSO changed).

    Read from SPARK_GRAFT_BENCH_OUT_DIR when set (the same place the run
    writes it back) so tests can plant a floor doc without touching the
    committed copy; real runs leave OUT_DIR unset and use the repo root."""
    path = os.path.join(_out_root(), "BENCH_FLOOR.json")
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        return None
    if raw.get("sf") != sf_now or not isinstance(raw.get("floor"), dict):
        return None
    return raw


def floor_mutation_allowed(floor_doc: dict, run_cpus: int) -> bool:
    """A floor is a per-host-SHAPE minimum: the r13 driver's 8-core
    scaling run silently lowered 13 floors (an 8-core reading at sf0.1
    beats the 32-core one on fixed-overhead queries) and advanced 25
    rel-streaks, biasing every later 32-core rel-lane verdict (VERDICT
    r13 what's-wrong #3). The doc now records the core count its floors
    were measured at; a run at any OTHER count must adjudicate against a
    frozen copy and never write back. Docs that predate the stamp are
    32-core by provenance."""
    return int(run_cpus) == int(floor_doc.get("cpus", 32))


def adjudicate_floors(
    floor_doc: dict,
    cur_all: dict,
    cur_pins: dict,
    batch_pins: dict,
    live_fp,
    calib_ok: bool,
    par_eff=None,
    par_sec=None,
    over_ratio: float = 1.25,
    board_max: float = 1.20,
    min_board: int = 20,
    factor_cap: float = 5.0,
    pins_ok: bool = True,
) -> dict:
    """The floor adjudication, pure and unit-testable (r10 continuation:
    every piece of this logic has been refined by a live-run incident —
    floor poisoning, pin-change staleness, the degraded-window streak
    poison — so it is now a function of plain dicts, pinned by
    ``tests/test_bench_floor.py`` instead of only by gated runs).

    Mutates ``floor_doc`` in place (floor / pins / over_streak /
    board_history / eff_history) and returns the ``vs_floor`` report.

    Rules, in order:

    * **Pin reset** (ADVICE r10): a floor only describes the plan it was
      measured under. ``pins`` records, per query, the PLANFP/STREAMFP
      pin value current when that floor entry was last written; when the
      committed pin changes (an intentional plan change, pin regenerated
      same commit), the stale floor is RESET so the query doesn't read
      as over-floor "weather" forever — the new plan re-seeds its own
      floor this run.
    * **Fingerprint adjudication**: a query over ``over_ratio``x floor is
      a REGRESSION only if its live plan fingerprint differs from the
      committed pin; plan-identical exceedances are weather by
      definition (the floor proves the same plan once ran that fast).
      Queries with no batch pin (streaming) are listed as unpinned.
    * **Board-level weather detector**: the JVM-spin/steal calibration
      misses machine states that slow EVERY query uniformly (all-core
      turbo, co-tenant contention, memory bandwidth): one observed
      calib-ok window put 72 of 98 git-untouched, plan-identical queries
      1.3-2.0x over floor simultaneously and pushed a false `sustained`
      flag. The floor board itself is the better instrument — >100
      pinned queries form an internal control group, and a genuine code
      regression cannot move the board MEDIAN. A run whose median floor
      ratio exceeds ``board_max`` is board-degraded: over_streak
      counters do NOT increment (streak RESETS still apply — reading
      fast in a slow window is strong evidence), so `sustained` can only
      be raised by quiet windows. The blind spot this opens — a real
      global regression inflating the whole board — is covered by
      ``board_history`` (last 8 gated medians): 3 consecutive degraded
      gated runs raise ``board_sustained``, and ``eff_history`` (the
      calibration's parallel efficiency) attributes it — eff sagging
      below its own history means the host, steady eff means the engine.
    * **Sustained-over-floor** (VERDICT r9 #2): fingerprint adjudication
      is blind to same-plan slowdowns (a slower UDF body, a fatter
      serialized payload). A query over ``over_ratio``x floor in >=3
      CONSECUTIVE calib-ok quiet runs is flagged even with an unchanged
      fingerprint. Non-gated runs leave streaks untouched (their timings
      carry no evidence either way).
    * **Min-merge** (r9, + ADVICE r10 guard): every run feeds the floor —
      host noise can only INFLATE a wall-clock trial, never deflate it,
      so a new minimum is always a genuine "the same plan once ran this
      fast". The one guard: a batch query's floor only lowers when its
      LIVE fingerprint matches the committed pin, so a transiently-
      broken working-tree query (doing less work on a different plan)
      can't poison the floor. Streaming queries have no cheap live
      fingerprint; their guard is the pin-change reset plus the oracle
      gate.
    * **Parallel-throughput normalization** (VERDICT r10 #2): 8 straight
      board-degraded windows (medians 1.29-1.51, eff 0.41-0.64) froze
      every streak, so a real 1.3x same-plan regression could hide
      indefinitely. The calibration's ``jvm_par_sec`` (fixed per-core
      work on all cores) measures exactly the host state that inflates
      the board: min-merge it like a floor (``jvm_par_floor`` — the
      fastest parallel window ever gated, the same epoch the query
      floors converge to), and divide every ratio by
      ``clamp(par_sec / jvm_par_floor, 1, factor_cap)``. Streak and
      regression ADJUDICATION runs on the normalized ratios: in a
      uniformly-degraded window the normalized board median reads ~1.0
      and a genuinely slowed query still stands out (host slowness
      multiplies compute time; an injected stall does not shrink when
      divided by the host factor). The factor never drops below 1 — a
      fast window must not inflate ratios — and the streak FREEZE now
      keys on the NORMALIZED median: it only engages when degradation
      is non-uniform enough that normalization failed to explain it.
      Raw medians still feed board_history/board_sustained (the
      global-regression backstop) and the floors themselves still
      min-merge raw times. With no ``par_sec`` the factor is 1.0 and
      the behavior is exactly the pre-r11 rules.
    * **Orphan prune** (ADVICE r10): a floor entry whose recorded pin no
      longer exists in the committed pin files belongs to a removed or
      renamed query — drop the floor, pin record, and streak instead of
      carrying them forever. Guard (ADVICE r11): the prune trusts
      ``cur_pins`` to be the COMPLETE committed pin set — a pin file that
      failed to load would make every query it pinned look orphaned and
      wipe the accumulated floors in one run. Callers pass
      ``pins_ok=False`` when any pin file failed to load; the prune is
      skipped and the failure surfaced in the report.
    * **Board-relative lane** (r12, VERDICT r11 #3): ten consecutive
      gated windows froze — this host has shown NO window quiet enough
      for the absolute streak lane since r8, and the run-level parallel
      calibration under-corrects bursty degradation (r12 observation:
      raw median 2.06, par factor 1.43 → norm 1.44, still frozen; the
      per-trial steal jiffies CANNOT be the normalizer because the
      steal-filtered minimums themselves read 2× floors at 6.6% total
      steal — the slowdown is frequency/bandwidth weather invisible to
      steal accounting). The board itself is the only instrument that
      is always calibrated: host weather is board-wide by definition,
      so each query's floor ratio DIVIDED BY THE RUN'S BOARD MEDIAN
      cancels the window entirely. ``rel_streak`` counts consecutive
      runs (gated or not — the cancellation needs no quiet window) in
      which a query reads over ``over_ratio`` × board median;
      ``sustained_rel`` fires at ≥3. Zero-false-positive property: a
      plan-identical board moves together, so every rel ratio ≈ 1
      regardless of weather. Its blind spot — a truly global regression
      moves the median itself — is exactly what ``board_sustained`` +
      ``eff_history`` attribution already cover.
    """
    floor = floor_doc["floor"]
    pins_rec: dict = floor_doc.setdefault("pins", {})
    streaks: dict = floor_doc.setdefault("over_streak", {})
    rel_streaks: dict = floor_doc.setdefault("rel_streak", {})
    floor_resets = sorted(
        q for q in floor
        if q in pins_rec and q in cur_pins and pins_rec[q] != cur_pins[q]
    )
    for q in floor_resets:
        del floor[q]
        del pins_rec[q]
        streaks.pop(q, None)
        rel_streaks.pop(q, None)
    orphaned = []
    if pins_ok and cur_pins:
        orphaned = sorted(
            q for q in floor if q in pins_rec and q not in cur_pins
        )
    for q in orphaned:
        del floor[q]
        del pins_rec[q]
        streaks.pop(q, None)
        rel_streaks.pop(q, None)
    pfloor = floor_doc.get("jvm_par_floor")
    if par_sec:
        pfloor = min(pfloor, par_sec) if pfloor else par_sec
        floor_doc["jvm_par_floor"] = pfloor
    host_factor = 1.0
    if par_sec and pfloor:
        host_factor = max(1.0, min(par_sec / pfloor, factor_cap))
    fratios = {
        q: round(t / floor[q], 2) for q, t in cur_all.items() if floor.get(q)
    }
    nratios = {q: round(r / host_factor, 2) for q, r in fratios.items()}
    over = sorted(q for q, r in nratios.items() if r > over_ratio)
    weather: list[str] = []
    unpinned: list[str] = []
    floor_regressions: list[str] = []
    for q in over:
        if q not in batch_pins:  # streaming: no batch fingerprint
            unpinned.append(q)
            continue
        (floor_regressions if live_fp(q) != batch_pins[q] else weather).append(q)
    srt = sorted(fratios.values())
    board_median = srt[len(srt) // 2] if srt else None
    nsrt = sorted(nratios.values())
    board_median_norm = nsrt[len(nsrt) // 2] if nsrt else None
    board_degraded = (
        board_median is not None
        and len(srt) >= min_board
        and board_median > board_max
    )
    # the streak freeze keys on the NORMALIZED median: a window the host
    # factor fully explains keeps its discriminating power
    freeze = (
        board_median_norm is not None
        and len(nsrt) >= min_board
        and board_median_norm > board_max
    )
    if calib_ok:
        for q in nratios:
            if nratios[q] > over_ratio:
                if not freeze:
                    streaks[q] = int(streaks.get(q, 0)) + 1
            elif fratios[q] <= over_ratio:
                streaks.pop(q, None)
            # else: raw over, normalized under (ADVICE r11) — the host
            # factor explains this run's exceedance but a query whose
            # cost does NOT scale with parallel throughput may hide a
            # real same-plan regression under it; freeze the streak
            # (keep accumulated evidence) instead of popping it. Only a
            # genuinely at-floor RAW reading is evidence of recovery.
        hist = floor_doc.setdefault("board_history", [])
        hist.append(round(board_median, 3) if board_median else None)
        del hist[:-8]
        # normalized medians alongside raw (VERDICT r11 #3): the record
        # that adjudicates whether the opening/closing calibration factor
        # explains real windows (norm ≈1.0–1.2, streaks live) or keeps
        # freezing (bursty hosts → move normalization per-trial)
        nhist = floor_doc.setdefault("board_history_norm", [])
        nhist.append(round(board_median_norm, 3) if board_median_norm else None)
        del nhist[:-8]
        effh = floor_doc.setdefault("eff_history", [])
        effh.append(par_eff)
        del effh[:-8]
    # board-relative lane: live in EVERY window (see docstring). A board
    # below min_board has no statistical control group — leave the rel
    # streaks untouched rather than adjudicate on noise.
    rel: dict = {}
    if board_median and len(fratios) >= min_board:
        rel = {q: round(r / board_median, 2) for q, r in fratios.items()}
        for q, rv in rel.items():
            if rv > over_ratio:
                rel_streaks[q] = int(rel_streaks.get(q, 0)) + 1
            else:
                rel_streaks.pop(q, None)
    sustained_rel = sorted(
        q for q, s in rel_streaks.items() if int(s) >= 3 and q in rel
    )
    sustained = sorted(
        q for q, s in streaks.items() if int(s) >= 3 and q in nratios
    )
    board_hist = floor_doc.get("board_history", [])
    board_sustained = len(board_hist) >= 3 and all(
        m is not None and m > board_max for m in board_hist[-3:]
    )
    updated = 0
    not_lowered: list[str] = []
    for q, t in cur_all.items():
        if t < floor.get(q, 9e9):
            if q in batch_pins and live_fp(q) != batch_pins[q]:
                not_lowered.append(q)
                continue
            floor[q] = t
            if q in cur_pins:
                pins_rec[q] = cur_pins[q]
            updated += 1
    floor_doc["floor"] = dict(sorted(floor.items()))
    floor_doc["pins"] = dict(sorted(pins_rec.items()))
    floor_doc["over_streak"] = dict(sorted(streaks.items()))
    floor_doc["rel_streak"] = dict(sorted(rel_streaks.items()))
    return {
        "ref": "BENCH_FLOOR.json",
        "ratio": fratios,
        "ratio_norm": nratios,
        "ratio_rel": rel,
        "sustained_rel": sustained_rel,
        "median_ratio": board_median,
        "median_ratio_norm": board_median_norm,
        "host_par_factor": round(host_factor, 3),
        "board_degraded": board_degraded,
        "board_degraded_norm": freeze,
        "board_sustained": board_sustained,
        "regressions": floor_regressions,
        "sustained": sustained,
        "weather_over_floor": weather,
        "over_floor_unpinned": unpinned,
        "floor_reset_on_pin_change": floor_resets,
        "floor_pruned_orphaned": orphaned,
        "pin_files_ok": bool(pins_ok),
        "floor_entries_lowered": updated,
        "lower_blocked_fp_mismatch": sorted(not_lowered),
    }


def adjudicate_vs_prev(
    cur_all: dict,
    prev_times: dict,
    cur_board_median=None,
    prev_board_median=None,
    board_degraded: bool = False,
    over_ratio: float = 1.25,
) -> dict:
    """The vs_prev lane, window-normalized (VERDICT r12 #4): the raw
    current/previous ratio table compares two WINDOWS as much as two
    code states — BENCH_r12 presented 42 "regressions" that were all the
    board moving 2× on identical plans. The floor lane already measures
    each window against the same yardstick (the board median of
    floor ratios), so the two runs' window difference is exactly
    ``cur_board_median / prev_board_median``; dividing every per-query
    prev-ratio by that factor cancels the weather the way the
    board-relative lane cancels it within one run.

    The factor is clamped at ≥1: it only FORGIVES a currently-degraded
    window, never inflates ratios when the current window is the faster
    one (a query reading equal wall-clock in a faster window may have
    regressed, but flagging that from two single windows is exactly the
    phantom-regression business this lane is being cured of — the floor
    and rel lanes own real detection; vs_prev is context).

    ``board_degraded`` is stamped through so the artifact always
    self-identifies (the judge's "or at least" fallback, kept even with
    normalization: a reader sees both the corrected list and the
    window's status). Missing medians (first gated run, tiny boards)
    degrade to factor 1.0 — the pre-r13 behavior, plus the stamp."""
    ratios = {
        q: round(t / prev_times[q], 2)
        for q, t in cur_all.items()
        if prev_times.get(q)
    }
    window_factor = 1.0
    if cur_board_median and prev_board_median:
        window_factor = max(1.0, cur_board_median / prev_board_median)
    nratios = {q: round(r / window_factor, 2) for q, r in ratios.items()}
    return {
        "ratio": ratios,
        "ratio_norm": nratios,
        "window_factor": round(window_factor, 3),
        "board_degraded": bool(board_degraded),
        "regressions": sorted(
            q for q, r in nratios.items() if r > over_ratio
        ),
        "new": sorted(q for q in cur_all if q not in prev_times),
    }


def remeasure_sustained_rel(
    flagged: list,
    timer,
    floor: dict,
    board_median,
    rel_streaks: dict,
    over_ratio: float = 1.25,
) -> tuple[list, dict]:
    """The board-relative lane's adjudication protocol (VERDICT r12 #1)
    — written down and executed BEFORE the lane's first sustained flags
    can land, because r12's first live window seeded ~30% of the board
    at rel-streak 1 purely from bursts hitting long queries harder.

    Protocol: a ``sustained_rel`` flag is an ACCUSATION, not a verdict.
    For each flagged query, re-measure ONLY that query (min-of-N, timed
    by the same guarded trial machinery, calib-bracketed by the caller)
    in the same session, late in the run — a burst that inflated the
    main-lane reading has no reason to recur for the same query minutes
    later, while a genuine same-plan slowdown reproduces on demand.
    The re-measured rel ratio is (sec / floor[q]) / board_median with
    the MAIN pass's board median: if the re-measure lands in a calmer
    moment this is forgiving (good — recovery evidence), and if the
    whole window is uniformly degraded the board median still cancels
    it.

    Verdicts: ``confirmed`` (re-measure stays over — the flag stands and
    the streak is kept as accumulated evidence), ``popped`` (re-measure
    at or under — the streak resets to zero; three NEW consecutive
    over-windows are required to re-accuse), ``unmeasured`` (the
    re-measure itself failed or the query has no floor — the flag
    stands untouched, conservatively, and the record says why).

    Returns (confirmed_flags, per-query record); mutates
    ``rel_streaks`` for popped queries."""
    confirmed: list = []
    record: dict = {}
    for q in flagged:
        f = floor.get(q)
        sec = None
        try:
            sec = timer(q)
        except Exception as e:  # a re-measure crash must not kill the run
            record[q] = {
                "verdict": "unmeasured",
                "error": f"{type(e).__name__}: {e}"[:200],
            }
            confirmed.append(q)
            continue
        if sec is None or not f or not board_median:
            record[q] = {
                "verdict": "unmeasured",
                "remeasured_sec": sec,
                "floor": f,
            }
            confirmed.append(q)
            continue
        rel = round((sec / f) / board_median, 2)
        if rel > over_ratio:
            confirmed.append(q)
            record[q] = {
                "verdict": "confirmed",
                "remeasured_sec": round(sec, 3),
                "rel_ratio": rel,
            }
        else:
            rel_streaks.pop(q, None)
            record[q] = {
                "verdict": "popped",
                "remeasured_sec": round(sec, 3),
                "rel_ratio": rel,
            }
    return confirmed, record


def main() -> None:
    from pyspark.sql import functions as F

    from aws_localstack_stream_processing_spark.plans import all_queries
    from aws_localstack_stream_processing_spark.session import get_spark

    spark = get_spark(app_name="slsp-bench")
    qs = all_queries()

    # Test seams (used by tests/test_bench_guard.py, inert in real runs):
    # SPARK_GRAFT_BENCH_ONLY restricts both lanes to a comma-separated
    # query subset; SPARK_GRAFT_BENCH_FAILPOINT makes one named query
    # raise on every call — the e2e proof that a failing query cannot
    # kill the bench's one JSON line (VERDICT r11 #1: BENCH_r11 was
    # parsed:null because one transient worker-spawn flake in an ext
    # query escaped an unguarded trial loop).
    headline_names = list(HEADLINE)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    failpoint = os.environ.get("SPARK_GRAFT_BENCH_FAILPOINT")

    def _q_fn(name):
        if name == failpoint:
            def _boom(_spark, _sf_dir):
                raise RuntimeError(f"injected bench failpoint: {name}")
            return _boom
        return qs[name].fn

    # Per-query failure guard: time the trial block; on ANY exception
    # retry the whole block once (worker-spawn flakes under host load are
    # transient), and on the second failure record a sentinel and move on.
    # The bench must always reach its one JSON line.
    query_failures: dict[str, str] = {}

    def _guarded_times(name, n: int):
        """(clean_min_sec, trials) for one query, or None after the
        retry; failures land in query_failures."""
        err = "unknown"
        for attempt in range(2):
            try:
                trials, trial_steals = _timed_trials(
                    lambda: _q_fn(name)(spark, SF_DIR)
                    .write.format("noop").mode("overwrite").save(),
                    n,
                )
                return _clean_min(trials, trial_steals), trials
            except Exception as e:
                err = f"{type(e).__name__}: {e}"
                print(
                    f"bench {name} attempt {attempt + 1}/2 failed: "
                    f"{err[:400]}",
                    file=sys.stderr,
                )
                try:
                    spark.catalog.clearCache()
                except Exception:
                    pass
        query_failures[name] = err[:300]
        return None

    # JVM/codegen warmup outside the timed region: exercise the code paths
    # the headline queries hit (vectorized parquet scan, decimal hash agg,
    # broadcast join, window) so timings reflect steady state, not first-hit
    # JIT compilation
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # VM-speed calibration: a FIXED deterministic workload timed the same
    # way as the queries. The host shows not just bursty CPU-steal but
    # sustained degradation periods where every query runs uniformly
    # ~1.3-1.5x slower; min-of-N cannot correct a continuous slowdown, so
    # record the machine's speed alongside the query times — the
    # round-over-round ratio of calib_sec separates "the engine changed"
    # from "the VM changed".
    def _calibrate() -> dict[str, float]:
        jvm_trials, py_trials, one_trials, par_trials = [], [], [], []
        # real core count, not the env default (ADVICE r10): on a host with
        # fewer cores than SPARK_GRAFT_CPUS the all-cores probe would be
        # oversubscribed and eff systematically depressed every run,
        # polluting eff_history's host-vs-engine attribution
        ncpu = min(
            spark.sparkContext.defaultParallelism,
            os.cpu_count() or 32,
        )
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(100_000_000).selectExpr(
                "sum(pmod(id * 2654435761, 1048576))"
            ).collect()
            jvm_trials.append(time.perf_counter() - t0)
            # Parallel-efficiency pair: one true single-thread probe and
            # one all-cores probe with IDENTICAL per-core work (100M
            # rows of sustained arithmetic each). The jvm_sec spin above
            # (100M rows split across default parallelism, ~3M/task) is
            # too short per task to feel sustained-compute contention:
            # observed r10, calib jvm 0.22 (quiet-normal) while every
            # 32-thread query ran 1.3-2.0x over floor and a 10-trial
            # re-probe plateaued there. jvm_par_eff = 1t/par separates
            # "host is slow for parallel work" (co-tenant contention,
            # SMT pressure, memory bandwidth — eff sags) from "queries
            # regressed" (eff steady); the floor-board median
            # adjudicates, this records the mechanism.
            t0 = time.perf_counter()
            spark.range(100_000_000, numPartitions=1).selectExpr(
                "sum(pmod(id * 2654435761, 1048576))"
            ).collect()
            one_trials.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            spark.range(
                100_000_000 * ncpu, numPartitions=ncpu
            ).selectExpr("sum(pmod(id * 2654435761, 1048576))").collect()
            par_trials.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            acc = 0
            for i in range(3_000_000):
                acc += i * 31 & 0xFFFFFFFF
            py_trials.append(time.perf_counter() - t0)
        one = round(min(one_trials), 3)
        par = round(min(par_trials), 3)
        return {
            "jvm_sec": round(min(jvm_trials), 3),
            "jvm_1t_sec": one,
            "jvm_par_sec": par,
            "jvm_par_eff": round(one / par, 3) if par else None,
            "python_sec": round(min(py_trials), 3),
        }

    # Quiet-window gate (round-7 lesson: BENCH_r07 was snapshotted in a
    # ~2x CPU-degraded window — calib jvm 0.358 vs quiet 0.17-0.19 — and
    # recorded 37 phantom regressions). A run whose opening calib exceeds
    # CALIB_MAX is not a measurement of the engine, so don't take it:
    # sleep out the steal window and re-probe, up to a bounded number of
    # retries. If the window never quiets, still publish (the driver
    # needs its one JSON line) but stamp calib_ok=false so the record
    # self-identifies as degraded instead of masquerading as a regression.
    calib_max = float(os.environ.get("SPARK_GRAFT_CALIB_MAX", "0.25"))
    calib_retries = int(os.environ.get("SPARK_GRAFT_CALIB_RETRIES", "8"))
    calib = _calibrate()
    retries_used = 0
    while calib["jvm_sec"] > calib_max and retries_used < calib_retries:
        retries_used += 1
        print(
            f"calib jvm {calib['jvm_sec']} > {calib_max}: degraded window, "
            f"retry {retries_used}/{calib_retries} in 45s",
            file=sys.stderr,
        )
        time.sleep(45)
        calib = _calibrate()
    wu = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    (
        wu.join(wu.selectExpr("s_suppkey AS k", "s_acctbal AS b"),
                wu.s_suppkey == F.col("k"))
        .selectExpr(
            "s_nationkey",
            "CAST(s_acctbal AS DECIMAL(28,6)) AS d",
            "row_number() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn",
        )
        .groupBy("s_nationkey")
        .agg(F.sum("d"), F.max("rn"))
        .write.format("noop").mode("overwrite").save()
    )

    # min of N warm trials per query (timeit-style): this VM shows external
    # CPU-steal interference that can double or triple arbitrary trials, and
    # even 3-trial medians jump several x between runs. The minimum is the
    # least-interfered observation of the same deterministic work, so it is
    # the comparable number across rounds; the median/min ratio is emitted
    # as a per-run noise indicator.
    # 4 trials: this VM shows multi-second CPU-steal windows that can
    # inflate an entire 3-trial min; one extra warm trial per query is
    # cheap insurance that the min lands in a quiet window, while keeping
    # total bench wall time well inside the driver's budget.
    # CONSECUTIVE trials per query — measured decision (round 5): a
    # round-robin interleaved variant was tried and REVERTED. It added a
    # uniform ~0.2-0.3 s per trial to cheap queries (q1 0.46→0.80 s,
    # ref_minute_sum 0.28→0.53 s in the same quiet window, heavy queries
    # unchanged) — a fixed session-churn overhead that swamped the
    # steal-window decorrelation it was meant to buy, and broke
    # comparability with rounds 1-4. Consecutive min-of-N is the
    # round-over-round comparable stat.
    # Mid-run probes close the bracket gate's blind spot: a window can
    # degrade BETWEEN quiet open/close probes (observed r8: both brackets
    # quiet, 14 phantom ~1.3x regressions mid-run). One single-trial jvm
    # probe every ~15 queries; a probe above the mid threshold (quiet
    # singles run 0.17-0.22) marks the run degraded even if the brackets
    # were clean. The mid threshold tracks the bracket gate: single-trial
    # probes carry more variance than the bracket min-of-3, so it sits at
    # 1.2× calib_max (overridable via SPARK_GRAFT_CALIB_MID_MAX), keeping
    # a run tuned to a different calib_max self-consistent (ADVICE r8).
    calib_mid_max = float(
        os.environ.get("SPARK_GRAFT_CALIB_MID_MAX", str(round(calib_max * 1.2, 3)))
    )
    calib_probes: list[float] = []

    def _mid_probe() -> None:
        # steal-aware: a probe that lands on a steal burst reads high even
        # in an otherwise-fast window, so re-probe once if jiffies were
        # stolen during it (r8 attempt-5 lesson: per-query minimums were
        # clean via _clean_min, but raw probes still tripped the gate).
        # r9 addition: also re-probe once on a steal-CLEAN exceedance —
        # a single probe right after a GC-heavy query measures JVM
        # recovery, not the host (observed: probes 0.34/0.42 at 0.09%
        # run steal in a run whose queries beat every floor); a genuine
        # degraded window fails the retry too, a hiccup passes it.
        took = None
        clean_exceedances = 0
        for attempt in range(3):
            s0, _t = _steal()
            t0 = time.perf_counter()
            spark.range(100_000_000).selectExpr(
                "sum(pmod(id * 2654435761, 1048576))"
            ).collect()
            t = round(time.perf_counter() - t0, 3)
            s1, _t = _steal()
            took = t if took is None else min(took, t)
            if s1 - s0 >= 50:
                continue  # steal-stained reading never decides anything
            if t <= calib_mid_max:
                break
            # steal-clean exceedance: grant it one clean retry regardless
            # of earlier steal noise (ADVICE r10 — the old `attempt > 0`
            # let a stained attempt 0 consume the retry, so a single
            # clean over-reading marked the run degraded)
            clean_exceedances += 1
            if clean_exceedances >= 2:
                break
        calib_probes.append(took)

    # Hypervisor-steal ground truth (/proc/stat field 8): the probes infer
    # interference from a timing; steal jiffies MEASURE it. A controlled
    # idle-window experiment (r8) showed probes right after heavy queries
    # read 0.10-0.20 s, so an elevated probe is real contamination — and
    # per-trial steal deltas let min-of-N ignore stolen trials outright.
    def _steal() -> tuple[int, int]:
        try:
            vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
            return vals[7], sum(vals)
        except (OSError, ValueError, IndexError):
            return 0, 0

    run_steal0, run_total0 = _steal()

    def _timed_trials(fn, n: int) -> tuple[list[float], list[int]]:
        """n trials of fn; returns (seconds, per-trial steal jiffies)."""
        secs, steals = [], []
        for _ in range(n):
            s0, _t = _steal()
            t0 = time.perf_counter()
            fn()
            secs.append(time.perf_counter() - t0)
            s1, _t = _steal()
            steals.append(s1 - s0)
            spark.catalog.clearCache()
        return secs, steals

    def _clean_min(secs: list[float], steals: list[int]) -> float:
        """Min over trials with <100 steal jiffies (~1 stolen cpu-second);
        if every trial was stolen, fall back to the plain min."""
        clean = [s for s, j in zip(secs, steals) if j < 100]
        return min(clean) if clean else min(secs)

    n_trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "4"))
    if only:
        sel = {s.strip() for s in only.split(",") if s.strip()}
        headline_names = [n for n in headline_names if n in sel]
    times: dict[str, float] = {}
    noise: list[float] = []
    for name in headline_names:
        if len(times) % 15 == 14:
            _mid_probe()
        # queries that materialize intermediates (persist) pay for them
        # inside their own timing; _timed_trials drops the cache per trial
        got = _guarded_times(name, n_trials)
        if got is None:
            continue
        best, trials = got
        times[name] = round(best, 3)
        med = sorted(trials)[len(trials) // 2]
        noise.append(med / max(min(trials), 1e-9))

    # round-3 extension showcase: timed the same way but kept OUT of the
    # headline total so `value` stays comparable round over round
    ext_names = list(EXT)
    # the ext showcase is held to the regression bar but is not the
    # headline: 3 trials (vs the headline's 4) keep total bench wall time
    # inside the driver's budget as the section grows (63 queries in round
    # 5). Not fewer: trial 1 is always cold, so min-of-2 has a single warm
    # sample and measurably inflates every ext min; min-of-3 keeps two warm
    # samples and stays comparable with the min-of-4 history.
    n_ext_trials = min(n_trials, int(os.environ.get("SPARK_GRAFT_BENCH_EXT_TRIALS", "3")))
    if only:
        sel = {s.strip() for s in only.split(",") if s.strip()}
        ext_names = [n for n in ext_names if n in sel]
    ext_times: dict[str, float] = {}
    for name in ext_names:
        if len(ext_times) % 15 == 14:
            _mid_probe()
        got = _guarded_times(name, n_ext_trials)
        if got is None:
            continue
        ext_times[name] = round(got[0], 3)

    # Harness-subtracted streaming timings (r10 continuation; VERDICT r9
    # required this lane to exist before the ext exclusion set may grow).
    # Wall-clock on a streaming query times the replay HARNESS — staged
    # file synthesis, lockstep slicing, checkpoint setup — as much as the
    # operators; 16 of 25 stream queries were therefore not timed at all.
    # StreamingQueryProgress.durationMs["triggerExecution"] counts only
    # what the engine executed per micro-batch, so its total is the
    # operator+source cost with the staging subtracted. One run per
    # stream_* query, captured with the session-wide MetricsListener
    # (every internal stream of a chain reports; events are summed).
    # Single-trial by design: these numbers are drift context beside the
    # STREAMFP fingerprints, not gated floors.
    def _opsec_measure(names) -> dict[str, float]:
        """One harness-subtracted trigger-execution total per named
        stream query (factored out r13 so the rel-lane adjudication can
        re-measure a single flagged query with the exact machinery the
        main pass used)."""
        from aws_localstack_stream_processing_spark.streaming.metrics import (
            MetricsListener,
        )

        out: dict[str, float] = {}
        listener = MetricsListener()
        spark.streams.addListener(listener)
        try:
            for name in names:
                spark.catalog.clearCache()
                n0 = len(listener.rows)
                try:
                    qs[name].fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as e:  # opsec is drift CONTEXT — a
                    # transient stream failure (e.g. a Python worker
                    # spawn flake under load) must not kill the bench's
                    # one JSON line; the entry is omitted, visible as a
                    # gap vs STREAMFP coverage
                    print(f"stream opsec {name}: {e}", file=sys.stderr)
                    continue
                # listener delivery is async: wait until the bus drained
                # (total stable across one interval) before slicing the
                # buffer. Stability alone suffices (ADVICE r10): requiring
                # cur > 0 made a query with zero progress events burn the
                # full deadline and record a 0.0 indistinguishable from a
                # real near-zero timing — instead, OMIT the entry when no
                # events arrived.
                deadline = time.time() + 5
                last = None
                while time.time() < deadline:
                    cur = sum(r[3] for r in listener.rows[n0:])
                    if last is not None and cur == last:
                        break
                    last = cur
                    time.sleep(0.3)
                total_ms = sum(r[3] for r in listener.rows[n0:])
                if total_ms > 0:
                    out[name] = round(total_ms / 1000.0, 3)
        finally:
            spark.streams.removeListener(listener)
        return out

    stream_opsec: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_STREAM_OPSEC", "1") == "1":
        stream_opsec = _opsec_measure(
            sorted(q for q in qs if q.startswith("stream_"))
        )

    total = round(sum(times.values()), 3)
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    # The driver records only a 2000-char tail of stdout, and the in-line
    # per-query maps outgrew it in round 4 (BENCH_r04/05 both landed with
    # parsed=null). So: the FULL report — headline + ext per-query times and
    # the complete vs_prev ratio table — goes to the committed sidecar
    # BENCH_DETAIL.json; stdout carries one compact JSON line (headline map,
    # calib, regression names, counts) hard-guarded to < 1900 chars.
    prev_bench = _load_prev_bench()  # read BEFORE overwriting the sidecar
    detail = {
        "metric": "headline_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_ext": ext_times,
        "queries_stream_opsec": stream_opsec,
        "value_ext": round(sum(ext_times.values()), 3),
        "sf": sf,
        "trials_per_query": n_trials,
        "trials_per_ext_query": n_ext_trials,
        "stat": "min",
        "noise_med_over_min": round(
            sorted(noise)[len(noise) // 2], 3
        ) if noise else None,
        "excluded": sorted(BENCH_EXCLUDED),
        # queries that failed both attempts this run: their timings are
        # absent (so `value` under-counts by their cost — n_failed > 0
        # marks the headline total incomparable), their floors/streaks
        # untouched. Never kills the run (VERDICT r11 #1).
        "query_failures": query_failures,
        "calib": calib,
    }
    # closing probe: a window that degraded MID-run fools the opening gate;
    # calib_ok asserts the whole measurement sat inside a quiet window
    calib_end = _calibrate()
    run_steal1, run_total1 = _steal()
    steal_pct = (
        round(100.0 * (run_steal1 - run_steal0)
              / max(run_total1 - run_total0, 1), 3)
        if run_total1 > run_total0
        else 0.0
    )
    detail["calib_end"] = calib_end
    detail["calib_mid_probes"] = calib_probes
    detail["calib_retries"] = retries_used
    detail["steal_pct"] = steal_pct
    # steal_pct is a coarse fallback only (pervasive theft defeats the
    # per-trial _clean_min filter); per-trial filtering + steal-aware
    # probes carry the fine-grained verdict
    detail["calib_ok"] = (
        calib["jvm_sec"] <= calib_max
        and calib_end["jvm_sec"] <= calib_max
        and all(p <= calib_mid_max for p in calib_probes)
        and steal_pct <= 3.0
    )
    # vs_prev is computed AFTER the floor adjudication now: its window
    # normalization needs this run's board median (VERDICT r12 #4).

    # -- vs_floor: the adjudication-free regression verdict (round 9) -----
    # Compare against the rolling per-query minimum over gated history,
    # not last round's single window. A query over 1.25x its floor is a
    # REGRESSION only if its pinned plan fingerprint also changed;
    # plan-identical exceedances are weather by definition (the floor
    # proves the same plan once ran that fast on this host).
    floor_doc = _load_floor(sf)
    run_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    floors_mutable = True
    if floor_doc:
        floors_mutable = floor_mutation_allowed(floor_doc, run_cpus)
        if floors_mutable:
            floor_doc["cpus"] = int(floor_doc.get("cpus", 32))
            floor_doc.setdefault("opsec", {}).setdefault(
                "cpus", floor_doc["cpus"]
            )
        else:
            # report-only: ratios against the frozen floors still give the
            # variant-core run context, but nothing this window measures
            # may move a floor, streak, or history recorded at another
            # core count
            import copy

            floor_doc = copy.deepcopy(floor_doc)
    if floor_doc:
        root_ = os.path.dirname(os.path.abspath(__file__))
        # pins_ok: BOTH pin files must load (ADVICE r11 — a silent load
        # failure would make every query the failed file pins look
        # orphaned and wipe the accumulated floors in one run)
        cur_pins: dict = {}
        pins_ok = True
        for pin_file in ("PLANFP.json", "STREAMFP.json"):
            try:
                with open(os.path.join(root_, pin_file)) as f:
                    cur_pins.update(json.load(f))
            except (OSError, ValueError) as e:
                pins_ok = False
                print(f"pin file {pin_file} failed to load: {e}",
                      file=sys.stderr)
        cur_all = {**times, **ext_times}
        live_fp_cache: dict[str, object] = {}
        try:
            from aws_localstack_stream_processing_spark.plans.planfp import (
                fingerprint,
            )
        except ImportError:
            fingerprint = None
        # Fingerprint at the SAME SF the pins were generated at
        # (tests' sf0.001), NOT the bench SF: static join-strategy
        # selection is size-stats-driven, so the same code plans
        # broadcast at sf0.001 and sort-merge at sf0.1 — an sf0.1
        # live fingerprint diffs against the sf0.001 pin on scale
        # alone and flags phantom regressions (measured:
        # llm_filter_stack, 2 joins flip at sf0.1 with identical
        # code). A CODE-level plan change shows up at any SF.
        fp_sf = os.environ.get(
            "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
        )
        batch_pins: dict = {}
        try:
            with open(os.path.join(root_, "PLANFP.json")) as f:
                batch_pins = json.load(f)
        except (OSError, ValueError):
            pass

        def _live_fp(q: str):
            """Live batch-plan fingerprint at the pin-generation SF
            (cached per run); None when unavailable."""
            if fingerprint is None:
                return None
            if q not in live_fp_cache:
                spark.catalog.clearCache()
                try:
                    live_fp_cache[q] = fingerprint(
                        qs[q].fn(spark, fp_sf)
                        ._jdf.queryExecution().executedPlan().toString()
                    )
                except Exception:
                    live_fp_cache[q] = None
                spark.catalog.clearCache()
            return live_fp_cache[q]

        detail["vs_floor"] = adjudicate_floors(
            floor_doc,
            cur_all,
            cur_pins,
            batch_pins,
            _live_fp,
            detail["calib_ok"],
            par_eff=calib.get("jvm_par_eff"),
            par_sec=calib.get("jvm_par_sec"),
            pins_ok=pins_ok,
        )
        detail["vs_floor"]["floors_frozen_cpu_mismatch"] = not floors_mutable
        # Streaming opsec lane under the same floor discipline (VERDICT
        # r10 #4): harness-subtracted trigger-execution totals min-merge
        # into their own floor namespace with identical pin-reset
        # (STREAMFP is the pin), normalization, and sustained rules — the
        # 16 stream queries with no gated wall-clock timing get regression
        # coverage. Single-trial timings carry more variance than the
        # min-of-N lanes, which the >=3-consecutive-runs sustained rule
        # absorbs; there is no live batch fingerprint, so over-floor
        # entries adjudicate via streaks, not fp diffs.
        if stream_opsec:
            ops_doc = floor_doc.setdefault("opsec", {"floor": {}})
            detail["vs_floor_opsec"] = adjudicate_floors(
                ops_doc,
                stream_opsec,
                cur_pins,
                {},
                lambda q: None,
                detail["calib_ok"],
                par_eff=calib.get("jvm_par_eff"),
                par_sec=calib.get("jvm_par_sec"),
                pins_ok=pins_ok,
            )
            detail["vs_floor_opsec"]["floors_frozen_cpu_mismatch"] = (
                not floors_mutable
            )
        # -- rel-lane adjudication (VERDICT r12 #1): sustained_rel flags
        # are re-measured in-session, per-query, calib-bracketed, before
        # they reach the graded artifact — see remeasure_sustained_rel's
        # docstring for the protocol and verdicts. The bracket is a
        # single-trial jvm probe before/after the whole re-measure pass
        # (recorded, not gating: the board-median division is the
        # window-cancellation mechanism; the bracket documents what the
        # re-measure window looked like).
        def _probe_once() -> float:
            t0 = time.perf_counter()
            spark.range(100_000_000).selectExpr(
                "sum(pmod(id * 2654435761, 1048576))"
            ).collect()
            return round(time.perf_counter() - t0, 3)

        vf = detail["vs_floor"]
        # a frozen (cpu-mismatched) run skips the remeasure: its flags are
        # not persisted, so there is no streak to protect, and the extra
        # timed passes would only burn the variant-core lane's budget
        if vf["sustained_rel"] and floors_mutable:
            def _batch_timer(qname):
                trials, trial_steals = _timed_trials(
                    lambda: _q_fn(qname)(spark, SF_DIR)
                    .write.format("noop").mode("overwrite").save(),
                    n_trials,
                )
                return _clean_min(trials, trial_steals)

            bracket = {"jvm_pre": _probe_once()}
            confirmed, rec = remeasure_sustained_rel(
                vf["sustained_rel"],
                _batch_timer,
                floor_doc["floor"],
                vf["median_ratio"],
                floor_doc["rel_streak"],
            )
            bracket["jvm_post"] = _probe_once()
            vf["sustained_rel"] = confirmed
            detail["rel_adjudication"] = {
                "queries": rec,
                "bracket": bracket,
            }
        if floors_mutable and detail.get("vs_floor_opsec", {}).get(
            "sustained_rel"
        ):
            vo = detail["vs_floor_opsec"]
            ops_doc = floor_doc["opsec"]

            def _opsec_timer(qname):
                return _opsec_measure([qname]).get(qname)

            bracket = {"jvm_pre": _probe_once()}
            confirmed, rec = remeasure_sustained_rel(
                vo["sustained_rel"],
                _opsec_timer,
                ops_doc["floor"],
                vo["median_ratio"],
                ops_doc["rel_streak"],
            )
            bracket["jvm_post"] = _probe_once()
            vo["sustained_rel"] = confirmed
            detail["rel_adjudication_opsec"] = {
                "queries": rec,
                "bracket": bracket,
            }
        if floors_mutable:
            with open(
                os.path.join(_out_root(), "BENCH_FLOOR.json"), "w"
            ) as f:
                json.dump(floor_doc, f, indent=1, sort_keys=True)

    # -- vs_prev, window-normalized (VERDICT r12 #4): needs this run's
    # board median from the floor adjudication above, so it is computed
    # here rather than before it
    regressions: list[str] = []
    if prev_bench:
        ref_name, prev_times, prev_med = prev_bench
        cur_all_vp = {**times, **ext_times}
        vfd = detail.get("vs_floor", {})
        detail["vs_prev"] = {
            "ref": ref_name,
            **adjudicate_vs_prev(
                cur_all_vp,
                prev_times,
                cur_board_median=vfd.get("median_ratio"),
                prev_board_median=prev_med,
                board_degraded=bool(vfd.get("board_degraded", False)),
            ),
        }
        regressions = detail["vs_prev"]["regressions"]

    with open(os.path.join(_out_root(), "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    report = {
        k: detail[k]
        for k in (
            "metric", "value", "unit", "queries", "value_ext", "sf",
            "trials_per_query", "trials_per_ext_query", "stat",
            "noise_med_over_min", "excluded", "calib",
            "calib_end", "calib_mid_probes", "calib_retries", "calib_ok",
            "steal_pct",
        )
    }
    report["n_ext"] = len(ext_times)
    report["detail"] = "BENCH_DETAIL.json"
    if query_failures:
        report["n_failed"] = len(query_failures)
        report["failed"] = sorted(query_failures)[:8]
    if "vs_floor" in detail:
        vf = detail["vs_floor"]
        report["vs_floor"] = {
            "median_ratio": vf["median_ratio"],
            "median_ratio_norm": vf["median_ratio_norm"],
            "host_par_factor": vf["host_par_factor"],
            "pin_files_ok": vf["pin_files_ok"],
            "board_degraded": vf["board_degraded"],
            "board_sustained": vf["board_sustained"],
            "regressions": vf["regressions"][:10],
            "sustained": vf["sustained"][:10],
            "sustained_rel": vf["sustained_rel"][:10],
            "n_weather_over_floor": len(vf["weather_over_floor"]),
            "n_unpinned_over_floor": len(vf["over_floor_unpinned"]),
            "n_floor_resets": len(vf["floor_reset_on_pin_change"]),
        }
        if vf.get("floors_frozen_cpu_mismatch"):
            report["vs_floor"]["floors_frozen_cpu_mismatch"] = True
    if "vs_floor_opsec" in detail:
        vo = detail["vs_floor_opsec"]
        report["vs_floor_opsec"] = {
            "median_ratio_norm": vo["median_ratio_norm"],
            "sustained": vo["sustained"][:6],
            "sustained_rel": vo["sustained_rel"][:6],
            "n_over": len(vo["over_floor_unpinned"])
            + len(vo["regressions"])
            + len(vo["weather_over_floor"]),
        }
    if "rel_adjudication" in detail:
        rec = detail["rel_adjudication"]["queries"]
        report["rel_adjudication"] = {
            v: sorted(q for q, r in rec.items() if r["verdict"] == v)[:6]
            for v in ("confirmed", "popped", "unmeasured")
            if any(r["verdict"] == v for r in rec.values())
        }
    if prev_bench:
        report["vs_prev"] = {
            "ref": detail["vs_prev"]["ref"],
            "window_factor": detail["vs_prev"]["window_factor"],
            "board_degraded": detail["vs_prev"]["board_degraded"],
            "regressions": regressions[:15],
            "n_regressions": len(regressions),
            "n_new": len(detail["vs_prev"]["new"]),
        }
    line = json.dumps(report, separators=(",", ":"))
    if len(line) > 1900:  # degrade gracefully, never lose driver parsing
        report["queries"] = dict(
            sorted(times.items(), key=lambda kv: -kv[1])[:8]
        )
        report["queries_truncated"] = True
        if "vs_prev" in report:
            report["vs_prev"]["regressions"] = regressions[:5]
        line = json.dumps(report, separators=(",", ":"))
    print(line)
    # Regression report vs a prior round (SPARK_GRAFT_BENCH_COMPARE=path to
    # a BENCH_r*.json): the extension section is held to the same
    # no-regression bar as the headline set. stderr only — stdout stays one
    # JSON line for the driver.
    ref_path = os.environ.get("SPARK_GRAFT_BENCH_COMPARE")
    if ref_path and os.path.exists(ref_path):
        with open(ref_path) as f:
            prev = json.load(f)
        prev = prev.get("parsed", prev)  # driver BENCH_r*.json wraps the line
        prev_all = {**prev.get("queries", {}), **prev.get("queries_ext", {})}
        cur_all = {**times, **ext_times}
        print(f"-- vs {ref_path} --", file=sys.stderr)
        for name, cur in cur_all.items():
            old = prev_all.get(name)
            if old:
                flag = "  REGRESSION" if cur / old > 1.25 else ""
                print(f"{name:35s} {old:7.3f} -> {cur:7.3f}  "
                      f"x{cur / old:.2f}{flag}", file=sys.stderr)
            else:
                print(f"{name:35s}    new -> {cur:7.3f}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
