"""Unit tests for bench.py's floor adjudication (``adjudicate_floors``).

Every rule in this function was refined by a live-run incident — floor
poisoning by a broken query, pin-change staleness, the degraded-window
streak poison — and until r10 it was validated ONLY by gated runs. These
tests pin the rules on plain dicts (no Spark, no filesystem): pin-change
reset, fingerprint weather/regression split, the board-level weather
detector, the sustained-over-floor streak rule, board/eff histories, and
the fingerprint-guarded min-merge.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
_spec.loader.exec_module(bench)


def _doc(floor, pins=None, streaks=None, hist=None):
    d = {"floor": dict(floor), "sf": 0.1}
    if pins is not None:
        d["pins"] = dict(pins)
    if streaks is not None:
        d["over_streak"] = dict(streaks)
    if hist is not None:
        d["board_history"] = list(hist)
    return d


def _run(doc, cur, *, cur_pins=None, batch_pins=None, live=None,
         calib_ok=True, par_eff=0.5, min_board=1):
    live = live or {}
    return bench.adjudicate_floors(
        doc, cur, cur_pins or {}, batch_pins or {},
        lambda q: live.get(q), calib_ok, par_eff=par_eff,
        min_board=min_board,
    )


def test_pin_change_resets_floor_and_streak():
    """An intentional plan change (committed pin differs from the pin the
    floor was measured under) must drop the stale floor entry and its
    streak — the new plan re-seeds its own floor this run."""
    doc = _doc({"q": 1.0}, pins={"q": "old"}, streaks={"q": 2})
    rep = _run(doc, {"q": 3.0}, cur_pins={"q": "new"},
               batch_pins={"q": "new"}, live={"q": "new"})
    assert rep["floor_reset_on_pin_change"] == ["q"]
    assert "q" not in rep["ratio"]  # no stale ratio computed
    assert doc["floor"]["q"] == 3.0  # re-seeded from this run
    assert doc["pins"]["q"] == "new"
    assert doc["over_streak"] == {}


def test_fingerprint_splits_weather_from_regression():
    """Over-floor + unchanged fingerprint = weather; over-floor + changed
    fingerprint = regression; over-floor with no batch pin = unpinned."""
    doc = _doc({"same": 1.0, "diff": 1.0, "stream": 1.0},
               pins={}, streaks={})
    rep = _run(
        doc, {"same": 2.0, "diff": 2.0, "stream": 2.0},
        batch_pins={"same": "A", "diff": "A"},
        live={"same": "A", "diff": "B"},
    )
    assert rep["weather_over_floor"] == ["same"]
    assert rep["regressions"] == ["diff"]
    assert rep["over_floor_unpinned"] == ["stream"]


def test_quiet_run_increments_and_resets_streaks():
    doc = _doc({"hot": 1.0, "cool": 1.0, "c2": 1.0, "c3": 1.0},
               streaks={"cool": 2})
    rep = _run(doc, {"hot": 1.5, "cool": 1.0, "c2": 1.0, "c3": 1.0})
    assert rep["board_degraded"] is False  # median 1.0, window is quiet
    assert doc["over_streak"] == {"hot": 1}  # cool's streak reset
    assert rep["sustained"] == []


def test_board_degraded_blocks_increments_but_not_resets():
    """A run whose board median exceeds the threshold must not increment
    any streak (the window, not the queries, is slow) — but a query
    reading fast in that slow window still resets its streak."""
    floor = {f"q{i}": 1.0 for i in range(10)}
    doc = _doc(floor, streaks={"q0": 2, "q9": 2})
    cur = {f"q{i}": 1.5 for i in range(9)}  # board median 1.5
    cur["q9"] = 1.0  # fast even in the slow window
    rep = _run(doc, cur)
    assert rep["board_degraded"] is True
    assert doc["over_streak"] == {"q0": 2}  # frozen, not incremented
    assert "q9" not in doc["over_streak"]  # reset still applied
    assert rep["sustained"] == []


def test_sustained_needs_three_quiet_runs():
    """Streak 2 → a quiet over-floor run makes 3 → sustained flag; the
    same run arriving board-degraded must NOT produce the flag."""
    floor = {f"q{i}": 1.0 for i in range(10)}
    quiet = {f"q{i}": 1.0 for i in range(9)}
    quiet["q0"] = 1.5  # only q0 over: median stays 1.0
    doc = _doc(floor, streaks={"q0": 2})
    rep = _run(doc, quiet)
    assert rep["board_degraded"] is False
    assert rep["sustained"] == ["q0"]


def test_non_gated_run_touches_nothing():
    """calib_ok=False: no streak changes, no history appends — the run's
    timings carry no evidence either way."""
    doc = _doc({"q": 1.0}, streaks={"q": 2}, hist=[1.0])
    _run(doc, {"q": 2.0}, calib_ok=False)
    assert doc["over_streak"] == {"q": 2}
    assert doc["board_history"] == [1.0]
    assert "eff_history" not in doc


def test_board_and_eff_histories_are_capped():
    doc = _doc({"q": 1.0}, hist=[1.0] * 8)
    doc["eff_history"] = [0.9] * 8
    _run(doc, {"q": 1.0}, par_eff=0.42)
    assert len(doc["board_history"]) == 8
    assert doc["board_history"][-1] == 1.0
    assert len(doc["eff_history"]) == 8
    assert doc["eff_history"][-1] == 0.42


def test_board_sustained_after_three_degraded_runs():
    floor = {f"q{i}": 1.0 for i in range(10)}
    doc = _doc(floor, hist=[1.31, 1.38])
    rep = _run(doc, {f"q{i}": 1.3 for i in range(10)})
    assert rep["board_degraded"] is True
    assert rep["board_sustained"] is True
    # two degraded + one quiet does not
    doc2 = _doc(floor, hist=[1.31, 1.38])
    rep2 = _run(doc2, {f"q{i}": 1.0 for i in range(10)})
    assert rep2["board_sustained"] is False


def test_min_merge_requires_matching_fingerprint():
    """A new minimum only lowers the floor when the live fingerprint
    matches the committed pin — a transiently-broken query (doing less
    work on a different plan) cannot poison the floor. Unpinned
    (streaming) queries still min-merge."""
    doc = _doc({"ok": 1.0, "broken": 1.0, "stream": 1.0},
               pins={}, streaks={})
    rep = _run(
        doc, {"ok": 0.8, "broken": 0.5, "stream": 0.7},
        cur_pins={"ok": "A", "broken": "A"},
        batch_pins={"ok": "A", "broken": "A"},
        live={"ok": "A", "broken": "X"},
    )
    assert doc["floor"] == {"broken": 1.0, "ok": 0.8, "stream": 0.7}
    assert rep["floor_entries_lowered"] == 2
    assert rep["lower_blocked_fp_mismatch"] == ["broken"]
    assert doc["pins"]["ok"] == "A"  # pin refreshed with the new floor


def test_min_board_gate_disables_detector_on_tiny_boards():
    """With fewer pinned queries than min_board, a high median must not
    be called board-degraded (no statistical control group)."""
    doc = _doc({"a": 1.0, "b": 1.0})
    rep = bench.adjudicate_floors(
        doc, {"a": 1.5, "b": 1.5}, {}, {}, lambda q: None, True,
        min_board=20,
    )
    assert rep["board_degraded"] is False
    assert doc["over_streak"] == {"a": 1, "b": 1}


def test_replay_of_identical_quiet_run_is_stable():
    """Plan-identical re-run at floor speed: zero regressions, zero
    sustained, no streaks — the 'zero false positives' contract."""
    floor = {f"q{i}": 1.0 for i in range(25)}
    doc = _doc(floor)
    rep = _run(doc, dict(floor), min_board=20)
    assert rep["regressions"] == [] and rep["sustained"] == []
    assert rep["board_degraded"] is False
    assert doc["over_streak"] == {}
    assert rep["floor_entries_lowered"] == 0


# ---------------------------------------------------------------------------
# Property tests: invariants that must hold for ANY timing board, not just
# the handcrafted scenarios above.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_times = st.dictionaries(
    st.sampled_from([f"q{i}" for i in range(30)]),
    st.floats(min_value=0.05, max_value=10.0, allow_nan=False),
    min_size=1,
    max_size=30,
)


@settings(max_examples=60, deadline=None)
@given(floor=_times, cur=_times, calib_ok=st.booleans())
def test_floors_never_raise_without_pin_change(floor, cur, calib_ok):
    """Min-merge monotonicity: absent a pin change, no floor entry may
    ever increase, and every lowered entry must equal the run's time."""
    doc = {"floor": dict(floor), "sf": 0.1}
    bench.adjudicate_floors(
        doc, cur, {}, {}, lambda q: None, calib_ok, min_board=5,
    )
    for q, f in doc["floor"].items():
        if q in floor:
            assert f <= floor[q] + 1e-12
            if f < floor[q]:
                assert f == cur[q]
        else:
            assert f == cur[q]  # new entries seed from this run


@settings(max_examples=60, deadline=None)
@given(floor=_times, cur=_times)
def test_degraded_board_never_grows_any_streak(floor, cur):
    """Whatever the inputs: if the run is adjudicated board-degraded, no
    streak is larger afterwards than before."""
    before = {q: 1 for q in floor}
    doc = {"floor": dict(floor), "sf": 0.1, "over_streak": dict(before)}
    rep = bench.adjudicate_floors(
        doc, cur, {}, {}, lambda q: None, True, min_board=1,
    )
    if rep["board_degraded"]:
        for q, s in doc["over_streak"].items():
            assert s <= before.get(q, 0)


@settings(max_examples=60, deadline=None)
@given(floor=_times, cur=_times)
def test_report_partitions_over_floor_queries(floor, cur):
    """Every over-threshold query lands in exactly one of regressions /
    weather / unpinned, and sustained ⊆ currently-rated queries."""
    doc = {"floor": dict(floor), "sf": 0.1}
    pins = {q: "A" for i, q in enumerate(sorted(floor)) if i % 2 == 0}
    live = {q: ("A" if i % 4 else "B") for i, q in enumerate(sorted(floor))}
    rep = bench.adjudicate_floors(
        doc, cur, pins, pins, lambda q: live.get(q), True, min_board=5,
    )
    over = {q for q, r in rep["ratio"].items() if r > 1.25}
    buckets = (
        set(rep["regressions"])
        | set(rep["weather_over_floor"])
        | set(rep["over_floor_unpinned"])
    )
    assert buckets == over
    assert not (
        set(rep["regressions"]) & set(rep["weather_over_floor"])
    ) and not (set(rep["regressions"]) & set(rep["over_floor_unpinned"]))
    assert set(rep["sustained"]) <= set(rep["ratio"])


@settings(max_examples=40, deadline=None)
@given(floor=_times, cur=_times)
def test_adjudication_is_idempotent_on_state_copies(floor, cur):
    """Two identical runs from identical starting state produce identical
    reports except histories/streaks (which are defined to accumulate)."""
    import copy

    d1 = {"floor": dict(floor), "sf": 0.1}
    d2 = copy.deepcopy(d1)
    r1 = bench.adjudicate_floors(
        d1, dict(cur), {}, {}, lambda q: None, True, min_board=5,
    )
    r2 = bench.adjudicate_floors(
        d2, dict(cur), {}, {}, lambda q: None, True, min_board=5,
    )
    assert r1 == r2
    assert d1 == d2


# ---------------------------------------------------------------------------
# round 11: parallel-throughput normalization (VERDICT r10 #2), orphan
# pruning (ADVICE r10), and the stream-opsec floor lane (VERDICT r10 #4).
# ---------------------------------------------------------------------------


def _runp(doc, cur, par_sec, *, streaks=None, calib_ok=True, min_board=1,
          cur_pins=None, batch_pins=None, live=None):
    if streaks is not None:
        doc["over_streak"] = dict(streaks)
    live = live or {}
    return bench.adjudicate_floors(
        doc, cur, cur_pins or {}, batch_pins or {},
        lambda q: live.get(q), calib_ok, par_eff=0.5, par_sec=par_sec,
        min_board=min_board,
    )


def test_degraded_window_normalizes_to_one():
    """Floors set at jvm_par_floor=1.0; a window where parallel
    throughput halved (par_sec=1.4) inflates every raw ratio to 1.4 —
    normalization must read the board as quiet (norm median ~1.0), with
    the raw median still reported for board_history."""
    floor = {f"q{i}": 1.0 for i in range(25)}
    doc = {"floor": dict(floor), "sf": 0.1, "jvm_par_floor": 1.0}
    rep = _runp(doc, {q: 1.4 for q in floor}, par_sec=1.4, min_board=20)
    assert rep["host_par_factor"] == 1.4
    assert rep["median_ratio"] == 1.4 and rep["board_degraded"] is True
    assert rep["median_ratio_norm"] == 1.0
    assert rep["board_degraded_norm"] is False
    assert rep["regressions"] == [] and rep["sustained"] == []
    assert doc["over_streak"] == {}  # nothing flagged: window explained


def test_slowed_query_still_flagged_in_degraded_window():
    """THE point of normalization: a genuinely slowed query (injected
    stall — its exceedance does not shrink with the host factor) must
    still accumulate streak and reach sustained, even while the whole
    board sits 1.4x over raw floor. Pre-r11 rules froze the streak here
    indefinitely."""
    floor = {f"q{i}": 1.0 for i in range(25)}
    doc = {"floor": dict(floor), "sf": 0.1, "jvm_par_floor": 1.0}
    cur = {q: 1.4 for q in floor}
    cur["q0"] = 2.8  # 2x over even AFTER normalization
    _runp(doc, cur, par_sec=1.4, min_board=20, streaks={"q0": 2})
    assert doc["over_streak"]["q0"] == 3
    rep = _runp(doc, cur, par_sec=1.4, min_board=20)
    assert "q0" in rep["sustained"]


def test_normalization_never_inflates_and_caps():
    """A window FASTER than the par floor must not inflate ratios
    (factor clamps at 1.0 — otherwise fast windows flag phantom
    regressions), and an absurd par reading clamps at the cap."""
    floor = {f"q{i}": 1.0 for i in range(5)}
    doc = {"floor": dict(floor), "sf": 0.1, "jvm_par_floor": 2.0}
    rep = _runp(dict(doc, floor=dict(floor)), {q: 1.0 for q in floor},
                par_sec=1.0)
    assert rep["host_par_factor"] == 1.0  # faster than floor: no shrink
    doc2 = {"floor": dict(floor), "sf": 0.1, "jvm_par_floor": 1.0}
    rep2 = _runp(doc2, {q: 1.0 for q in floor}, par_sec=50.0)
    assert rep2["host_par_factor"] == 5.0  # capped


def test_par_floor_min_merges():
    doc = {"floor": {"q": 1.0}, "sf": 0.1, "jvm_par_floor": 1.4}
    _runp(doc, {"q": 1.0}, par_sec=1.1)
    assert doc["jvm_par_floor"] == 1.1
    _runp(doc, {"q": 1.0}, par_sec=1.9)
    assert doc["jvm_par_floor"] == 1.1  # min-merge: never raised


def test_plan_identical_rerun_no_false_positives_under_normalization():
    """The 'zero false positives' contract survives normalization: a
    plan-identical re-run at raw floor speed in a quiet window reports
    nothing, streaks stay empty."""
    floor = {f"q{i}": 1.0 for i in range(25)}
    doc = {"floor": dict(floor), "sf": 0.1, "jvm_par_floor": 1.0}
    for _ in range(3):
        rep = _runp(doc, dict(floor), par_sec=1.0, min_board=20)
        assert rep["regressions"] == [] and rep["sustained"] == []
        assert doc["over_streak"] == {}


def test_orphaned_pin_prunes_floor_entry():
    """ADVICE r10: a floor entry whose recorded pin vanished from the
    committed pin files (query removed/renamed) is pruned — floor, pin
    record, and streak — instead of living in BENCH_FLOOR.json forever."""
    doc = _doc({"gone": 1.0, "kept": 1.0},
               pins={"gone": "X", "kept": "A"}, streaks={"gone": 2})
    rep = _run(doc, {"kept": 1.0}, cur_pins={"kept": "A"},
               batch_pins={"kept": "A"}, live={"kept": "A"})
    assert rep["floor_pruned_orphaned"] == ["gone"]
    assert "gone" not in doc["floor"] and "gone" not in doc["pins"]
    assert doc["over_streak"] == {}
    # a floor entry with NO recorded pin (pre-pin legacy) is kept
    doc2 = _doc({"legacy": 1.0}, pins={})
    rep2 = _run(doc2, {"legacy": 1.0})
    assert rep2["floor_pruned_orphaned"] == []
    assert "legacy" in doc2["floor"]


def test_opsec_lane_flags_deliberate_slowdown():
    """VERDICT r10 #4 done-criterion: the stream-opsec lane (same
    adjudicator, own namespace, STREAMFP pins, no live fingerprint) must
    flag a deliberately slowed streaming query via the sustained rule,
    and reset it when the cost returns to floor."""
    ops = {"floor": {"stream_x": 2.0, "stream_y": 1.0}}
    pins = {"stream_x": "S1", "stream_y": "S2"}
    slow = {"stream_x": 3.2, "stream_y": 1.0}  # extra state op: 1.6x
    for _ in range(3):
        rep = bench.adjudicate_floors(
            ops, slow, pins, {}, lambda q: None, True, min_board=20,
        )
    assert rep["over_floor_unpinned"] == ["stream_x"]
    assert rep["sustained"] == ["stream_x"]
    # an intentional plan change (STREAMFP pin regenerates) resets it
    ops["pins"]["stream_x"] = "S1"
    rep2 = bench.adjudicate_floors(
        ops, slow, {"stream_x": "S1-new", "stream_y": "S2"}, {},
        lambda q: None, True, min_board=20,
    )
    assert rep2["floor_reset_on_pin_change"] == ["stream_x"]
    assert ops["floor"]["stream_x"] == 3.2  # re-seeded
    assert "stream_x" not in ops["over_streak"]


# ---------------------------------------------------------------------------
# round 12: orphan-prune guard on pin-load failure (ADVICE r11 #1) and the
# freeze-don't-pop streak rule for raw-over/normalized-under readings
# (ADVICE r11 #5).
# ---------------------------------------------------------------------------


def test_pin_load_failure_skips_orphan_prune():
    """pins_ok=False (a pin file failed to load): every floor entry would
    look orphaned against the partial/empty cur_pins — the prune must be
    skipped entirely and the failure surfaced, not wipe the accumulated
    floors and re-seed them from the current run."""
    doc = _doc({"a": 1.0, "b": 1.0},
               pins={"a": "A", "b": "B"}, streaks={"a": 2})
    rep = bench.adjudicate_floors(
        doc, {"a": 3.0, "b": 3.0}, {}, {}, lambda q: None, True,
        min_board=1, pins_ok=False,
    )
    assert rep["pin_files_ok"] is False
    assert rep["floor_pruned_orphaned"] == []
    assert doc["floor"]["a"] == 1.0 and doc["floor"]["b"] == 1.0
    assert doc["pins"] == {"a": "A", "b": "B"}
    assert doc["over_streak"]["a"] >= 2  # streak evidence preserved


def test_partial_pin_set_does_not_prune_missing_halves():
    """Even with pins_ok defaulting True, an EMPTY cur_pins (both files
    unreadable but swallowed) must not prune: the guard requires a
    non-empty committed pin set before trusting absence as orphanhood."""
    doc = _doc({"a": 1.0}, pins={"a": "A"})
    rep = bench.adjudicate_floors(
        doc, {"a": 1.0}, {}, {}, lambda q: None, True, min_board=1,
    )
    assert rep["floor_pruned_orphaned"] == []
    assert "a" in doc["floor"]


def test_raw_over_normalized_under_freezes_streak():
    """ADVICE r11: a query whose raw ratio is over threshold but whose
    normalized ratio is under must FREEZE its accumulated streak, not pop
    it — a fixed-cost query (cost does not scale with parallel
    throughput) in a degraded window would otherwise launder a genuine
    same-plan regression by popping its evidence every degraded run."""
    floor = {f"q{i}": 1.0 for i in range(25)}
    doc = {"floor": dict(floor), "sf": 0.1, "jvm_par_floor": 1.0,
           "over_streak": {"q0": 2}}
    cur = {q: 1.4 for q in floor}  # raw 1.4, normalized 1.0 at factor 1.4
    bench.adjudicate_floors(
        doc, cur, {}, {}, lambda q: None, True, par_sec=1.4, min_board=20,
    )
    assert doc["over_streak"]["q0"] == 2  # frozen: neither popped nor grown
    # ... and a genuinely-at-raw-floor reading still resets it
    quiet = dict(cur)
    quiet["q0"] = 1.0
    bench.adjudicate_floors(
        doc, quiet, {}, {}, lambda q: None, True, par_sec=1.4, min_board=20,
    )
    assert "q0" not in doc["over_streak"]


def test_board_history_norm_recorded_alongside_raw():
    """VERDICT r11 #3: gated runs append the NORMALIZED board median to
    its own capped history so the freeze-vs-live question is answerable
    from BENCH_FLOOR.json alone."""
    floor = {f"q{i}": 1.0 for i in range(25)}
    doc = {"floor": dict(floor), "sf": 0.1, "jvm_par_floor": 1.0}
    bench.adjudicate_floors(
        doc, {q: 1.4 for q in floor}, {}, {}, lambda q: None, True,
        par_sec=1.4, min_board=20,
    )
    assert doc["board_history"][-1] == 1.4
    assert doc["board_history_norm"][-1] == 1.0
    doc["board_history_norm"] = [1.0] * 8
    bench.adjudicate_floors(
        doc, {q: 1.4 for q in floor}, {}, {}, lambda q: None, True,
        par_sec=1.4, min_board=20,
    )
    assert len(doc["board_history_norm"]) == 8  # capped like the raw lane


# ---------------------------------------------------------------------------
# round 12: the board-relative lane (VERDICT r11 #3 — regression teeth that
# survive a host with NO quiet windows: normalize by the run's own board
# median, streaks live in every window).
# ---------------------------------------------------------------------------


def test_slowed_query_still_flagged_via_board_relative_lane():
    """THE case ten straight frozen windows could not adjudicate: every
    window degraded (board 1.5-2.1x, calib_ok False), one query carries
    a genuine same-plan 2x regression on top. The absolute lanes freeze
    (correctly — the window lies), but the board-relative ratio cancels
    the window: rel(q0) ≈ 2.0 while the board reads 1.0, and three such
    runs — even non-gated — raise sustained_rel."""
    floor = {f"q{i}": 1.0 for i in range(25)}
    doc = {"floor": dict(floor), "sf": 0.1, "jvm_par_floor": 1.0}
    for run in range(3):
        cur = {q: 1.5 + 0.3 * run for q in floor}  # varying bad weather
        cur["q0"] = 2 * (1.5 + 0.3 * run)  # 2x over the board, every run
        rep = bench.adjudicate_floors(
            doc, cur, {}, {}, lambda q: None, False,  # never gated
            par_sec=1.0, min_board=20,
        )
        assert doc["over_streak"] == {}  # absolute lane frozen (non-gated)
    assert doc["rel_streak"]["q0"] == 3
    assert rep["sustained_rel"] == ["q0"]
    # ... and the board itself reads as the control group
    assert rep["ratio_rel"]["q0"] == 2.0


def test_board_relative_lane_zero_false_positives_in_degraded_windows():
    """A plan-identical board moving TOGETHER through arbitrary weather
    must never accumulate a rel streak: every rel ratio ≈ 1.0."""
    floor = {f"q{i}": 1.0 for i in range(25)}
    doc = {"floor": dict(floor), "sf": 0.1}
    for mult in (1.0, 1.6, 2.1, 1.3):
        rep = bench.adjudicate_floors(
            doc, {q: mult for q in floor}, {}, {}, lambda q: None,
            mult == 1.0, min_board=20,
        )
        assert rep["sustained_rel"] == []
    assert doc["rel_streak"] == {}


def test_board_relative_recovery_resets_streak():
    """A query back at board parity pops its rel streak — evidence of
    recovery is recovery relative to the board, not to the floor."""
    floor = {f"q{i}": 1.0 for i in range(25)}
    doc = {"floor": dict(floor), "sf": 0.1, "rel_streak": {"q0": 2}}
    cur = {q: 1.5 for q in floor}  # q0 back in line with the board
    bench.adjudicate_floors(
        doc, cur, {}, {}, lambda q: None, False, min_board=20,
    )
    assert "q0" not in doc["rel_streak"]


def test_board_relative_needs_min_board():
    """Below min_board there is no statistical control group: rel
    streaks must be left untouched, not adjudicated on noise."""
    doc = {"floor": {"a": 1.0, "b": 1.0}, "sf": 0.1,
           "rel_streak": {"a": 2}}
    rep = bench.adjudicate_floors(
        doc, {"a": 9.0, "b": 1.0}, {}, {}, lambda q: None, True,
        min_board=20,
    )
    assert rep["ratio_rel"] == {}
    assert doc["rel_streak"] == {"a": 2}  # untouched


def test_pin_change_resets_rel_streak_too():
    doc = _doc({"q": 1.0}, pins={"q": "old"})
    doc["rel_streak"] = {"q": 2}
    bench.adjudicate_floors(
        doc, {"q": 3.0}, {"q": "new"}, {"q": "new"}, lambda q: "new",
        True, min_board=1,
    )
    assert "q" not in doc["rel_streak"]


# -- rel-lane adjudication protocol (VERDICT r12 #1) -----------------------


def test_remeasure_pops_streak_when_under_threshold():
    """A sustained_rel flag whose targeted re-measure reads at/under the
    board-relative threshold is POPPED: the flag is dropped and the
    streak resets to zero — three NEW over-windows required to
    re-accuse. This is the burst-absorption case the protocol exists
    for (r12: ~30% of a bursty board seeded streaks with no code
    change)."""
    streaks = {"q": 3, "other": 1}
    confirmed, rec = bench.remeasure_sustained_rel(
        ["q"], lambda n: 1.1, {"q": 1.0}, 2.0, streaks
    )
    assert confirmed == []
    assert rec["q"]["verdict"] == "popped"
    assert rec["q"]["rel_ratio"] == 0.55  # (1.1/1.0)/2.0
    assert "q" not in streaks
    assert streaks["other"] == 1  # untouched


def test_remeasure_confirms_reproducing_slowdown():
    """A flag that reproduces under targeted re-measure is CONFIRMED and
    keeps its accumulated streak — the lane's first real positive would
    look exactly like this."""
    streaks = {"q": 3}
    confirmed, rec = bench.remeasure_sustained_rel(
        ["q"], lambda n: 4.0, {"q": 1.0}, 2.0, streaks
    )
    assert confirmed == ["q"]
    assert rec["q"]["verdict"] == "confirmed"
    assert rec["q"]["rel_ratio"] == 2.0
    assert streaks["q"] == 3  # evidence kept


def test_remeasure_failure_keeps_flag_conservatively():
    """A re-measure that crashes or returns None cannot adjudicate —
    the flag stands (conservative) and the record says why, so the
    graded artifact never silently drops an accusation."""
    streaks = {"a": 3, "b": 3}

    def _timer(n):
        if n == "a":
            raise RuntimeError("worker spawn flake")
        return None

    confirmed, rec = bench.remeasure_sustained_rel(
        ["a", "b"], _timer, {"a": 1.0, "b": 1.0}, 2.0, streaks
    )
    assert confirmed == ["a", "b"]
    assert rec["a"]["verdict"] == "unmeasured"
    assert "worker spawn flake" in rec["a"]["error"]
    assert rec["b"]["verdict"] == "unmeasured"
    assert streaks == {"a": 3, "b": 3}


def test_remeasure_after_adjudicate_floors_end_to_end():
    """The wiring invariant: adjudicate_floors raises sustained_rel at
    streak >= 3; remeasure_sustained_rel then pops the burst-born flag
    from the SAME floor_doc the bench writes back, so BENCH_FLOOR.json
    records the post-adjudication state."""
    doc = {"floor": {"a": 1.0, "b": 1.0, "c": 1.0}, "sf": 0.1,
           "rel_streak": {"a": 2}}
    # window 2x-degraded board-wide; 'a' additionally reads 2x the board
    rep = bench.adjudicate_floors(
        doc, {"a": 8.0, "b": 2.0, "c": 2.0}, {}, {}, lambda q: None,
        True, min_board=1,
    )
    assert rep["sustained_rel"] == ["a"]
    confirmed, rec = bench.remeasure_sustained_rel(
        rep["sustained_rel"], lambda n: 2.1, doc["floor"],
        rep["median_ratio"], doc["rel_streak"],
    )
    rep["sustained_rel"] = confirmed
    assert rep["sustained_rel"] == []
    assert rec["a"]["verdict"] == "popped"
    assert "a" not in doc["rel_streak"]


# -- vs_prev window normalization (VERDICT r12 #4) -------------------------


def test_vs_prev_degraded_window_identical_code_no_regressions():
    """The r12 artifact bug in miniature: identical code, current window
    2x the previous one board-wide — every raw ratio reads 2.0, zero
    may be flagged once the board-median ratio divides them out."""
    prev = {f"q{i}": 1.0 for i in range(10)}
    cur = {f"q{i}": 2.0 for i in range(10)}
    rep = bench.adjudicate_vs_prev(
        cur, prev, cur_board_median=2.5, prev_board_median=1.25,
        board_degraded=True,
    )
    assert rep["window_factor"] == 2.0
    assert rep["regressions"] == []
    assert rep["board_degraded"] is True
    assert all(r == 2.0 for r in rep["ratio"].values())  # raw preserved
    assert all(r == 1.0 for r in rep["ratio_norm"].values())


def test_vs_prev_real_regression_survives_normalization():
    """A query 4x its previous reading in a 2x-degraded window carries a
    genuine 2x residual — normalization must NOT launder it."""
    prev = {"slow": 1.0, "ok": 1.0}
    cur = {"slow": 4.0, "ok": 2.0}
    rep = bench.adjudicate_vs_prev(
        cur, prev, cur_board_median=2.5, prev_board_median=1.25,
    )
    assert rep["regressions"] == ["slow"]
    assert rep["ratio_norm"]["slow"] == 2.0


def test_vs_prev_faster_window_never_inflates():
    """The factor clamps at 1: a current window FASTER than the previous
    one must not manufacture regressions out of equal wall-clock."""
    rep = bench.adjudicate_vs_prev(
        {"q": 1.0}, {"q": 1.0}, cur_board_median=1.0,
        prev_board_median=2.0,
    )
    assert rep["window_factor"] == 1.0
    assert rep["regressions"] == []


def test_vs_prev_missing_medians_falls_back_to_stamp():
    """No board medians (first gated run, tiny board): behavior is the
    pre-r13 raw comparison, but the degraded stamp still travels."""
    rep = bench.adjudicate_vs_prev(
        {"q": 2.0}, {"q": 1.0}, board_degraded=True,
    )
    assert rep["window_factor"] == 1.0
    assert rep["regressions"] == ["q"]
    assert rep["board_degraded"] is True
    assert rep["new"] == []


# -- per-core-count floor integrity (VERDICT r13 what's-wrong #3): the r13
# driver's 8-core scaling run silently lowered 13 floors and advanced 25
# rel-streaks because the floor store did not key on core count --------------


def test_floor_mutation_keyed_on_cpus():
    """Only a run at the doc's recorded core count may mutate it; docs
    that predate the stamp are 32-core by provenance."""
    assert bench.floor_mutation_allowed({"cpus": 32}, 32)
    assert not bench.floor_mutation_allowed({"cpus": 32}, 8)
    assert not bench.floor_mutation_allowed({}, 8)  # legacy doc == 32-core
    assert bench.floor_mutation_allowed({}, 32)
    assert bench.floor_mutation_allowed({"cpus": 8}, 8)


def test_8core_bench_run_cannot_move_32core_floor(tmp_path):
    """End-to-end: a bench subprocess at SPARK_GRAFT_CPUS=8 against a
    32-core floor doc (planted in OUT_DIR) must leave the doc
    byte-identical — no floor lowering, no streak advance, no history
    append — while still printing its one JSON line with the frozen flag."""
    import json as _json
    import subprocess as _sp

    q = "tpch_q6_forecast_revenue"
    doc = {
        "sf": 0.001,
        "cpus": 32,
        "floor": {q: 999.0},  # absurdly high: any trial would min-merge
        "pins": {},
        "over_streak": {},
        "rel_streak": {q: 2},
        "board_history": [1.0],
        "opsec": {"floor": {}, "cpus": 32},
    }
    floor_path = tmp_path / "BENCH_FLOOR.json"
    floor_path.write_text(_json.dumps(doc, indent=1, sort_keys=True))
    before = floor_path.read_bytes()
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": SF_DIR,
            "SPARK_GRAFT_BENCH_ONLY": q,
            "SPARK_GRAFT_BENCH_TRIALS": "1",
            "SPARK_GRAFT_BENCH_EXT_TRIALS": "1",
            "SPARK_GRAFT_BENCH_STREAM_OPSEC": "0",
            "SPARK_GRAFT_CALIB_MAX": "999",
            "SPARK_GRAFT_CALIB_RETRIES": "0",
            "SPARK_GRAFT_BENCH_OUT_DIR": str(tmp_path),
            "SPARK_GRAFT_CPUS": "8",
        }
    )
    proc = _sp.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()][-1]
    report = _json.loads(line)
    assert report["vs_floor"]["floors_frozen_cpu_mismatch"] is True
    assert floor_path.read_bytes() == before  # nothing moved
    with open(tmp_path / "BENCH_DETAIL.json") as f:
        detail = _json.load(f)
    # the frozen run still reports ratios against the frozen floors
    assert detail["vs_floor"]["floors_frozen_cpu_mismatch"] is True
    assert q in detail["vs_floor"]["ratio"]
