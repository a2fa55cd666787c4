"""Unit tests for the steal-qualified benchmark statistics (no Spark).

The scaling gate and the headline bench both summarize rep series through
``benchlib.warm_median`` and qualify reps through
``benchlib.steal_qualified`` — the round-6 measurement doctrine (VERDICT
r5 tasks #1/#3): a rep that ran during a host-steal wave measures the
host, not the engine, and must not enter the reported statistic.
"""

from __future__ import annotations

from np_data_validation_spark import benchlib


def _rep(sec: float, steal_ms: int | None, rps: float | None = None) -> dict:
    return {
        "sec": sec,
        "rows_per_sec": rps if rps is not None else 1000.0 / sec,
        "steal_ms": steal_ms,
    }


def test_steal_qualified_budget_boundary():
    # budget is a fraction of the rep's own wall: 5% of 100s = 5000 ms
    assert benchlib.steal_qualified(_rep(100.0, 5000), 0.05)
    assert not benchlib.steal_qualified(_rep(100.0, 5001), 0.05)
    # missing telemetry (no /proc/stat) cannot disqualify
    assert benchlib.steal_qualified(_rep(100.0, None), 0.05)


def test_steal_budget_floor_for_short_reps():
    # /proc/stat steal has 10ms jiffy resolution summed host-wide; for a
    # 0.3s query rep the 5% budget is 15ms = 1-2 ticks, so a single
    # background tick would disqualify a clean rep. The absolute floor
    # (50ms default) absorbs tick-granularity noise...
    assert benchlib.steal_qualified(_rep(0.3, 20), 0.05)
    assert benchlib.steal_qualified(_rep(0.3, 50), 0.05)
    assert not benchlib.steal_qualified(_rep(0.3, 51), 0.05)
    # ...and never engages for long reps, where the fractional budget
    # dominates (gate semantics unchanged: 5% of 100s = 5000ms >> floor)
    assert benchlib.steal_qualified(_rep(100.0, 5000), 0.05)
    assert not benchlib.steal_qualified(_rep(100.0, 5001), 0.05)


def test_warm_median_covers_only_qualified_warm_reps():
    reps = [
        _rep(12.0, 100),  # cold (JIT) — never in the statistic
        _rep(8.0, 100),
        _rep(30.0, 9000),  # steal wave — excluded
        _rep(9.0, 100),
    ]
    m = benchlib.warm_median(reps, budget_frac=0.05)
    assert m["stat"] == "median_steal_qualified"
    assert m["sec"] == 8.5  # median of the two qualified warm reps
    assert m["qualified_reps"] == "2/3"
    assert m["cold_sec"] == 12.0
    assert m["all_sec"] == [12.0, 8.0, 30.0, 9.0]


def test_warm_median_flags_fully_degraded_window():
    reps = [_rep(10.0, 100), _rep(18.0, 5000), _rep(20.0, 6000)]
    m = benchlib.warm_median(reps, budget_frac=0.05)
    # falls back to the plain warm median, flagged; the cold-faster
    # inversion is also flagged because rep 0 beat the covered median
    assert m["stat"] == "median_warm_no_qualified_rep_inverted"
    assert m["sec"] == 19.0
    assert m["qualified_reps"] == "0/2"


def test_warm_median_inversion_never_mixes_cold_rep():
    # ADVICE r5 benchlib:185 — the old fallback medianed over ALL reps on
    # inversion, which only ever made the headline faster. The cold rep
    # must stay out of the statistic even when it is the fastest rep.
    reps = [_rep(5.0, 100), _rep(9.0, 100), _rep(11.0, 100)]
    m = benchlib.warm_median(reps, budget_frac=0.05)
    assert m["stat"] == "median_steal_qualified_inverted"
    assert m["sec"] == 10.0  # median of warm reps only — 5.0 excluded
    assert m["cold_sec"] == 5.0


def test_warm_median_labels_unmeasured_telemetry():
    # VERDICT r6 task #4: a host with no /proc/stat "qualifies" every rep
    # by absence of telemetry — the stat label must not claim the budget
    # was enforced.
    reps = [_rep(12.0, None), _rep(8.0, None), _rep(9.0, None)]
    m = benchlib.warm_median(reps, budget_frac=0.05)
    assert m["stat"] == "median_steal_unmeasured"
    assert m["sec"] == 8.5
    # one measured rep among the covered ones restores the qualified label
    reps = [_rep(12.0, None), _rep(8.0, 100), _rep(9.0, None)]
    m = benchlib.warm_median(reps, budget_frac=0.05)
    assert m["stat"] == "median_steal_qualified"


def test_memory_canary_is_memory_sized_and_disable_gated():
    # tiny shape so the test is fast; the canary must return a positive
    # wall time, reuse its array across calls, and honor the disable gate
    t1 = benchlib.memory_canary_sec(mb=8, passes=2)
    assert t1 is not None and t1 > 0
    arr = benchlib._CANARY_ARR
    assert arr is not None and arr.nbytes == 8 * 1024 * 1024
    t2 = benchlib.memory_canary_sec(mb=8, passes=2)
    assert benchlib._CANARY_ARR is arr  # no realloc between reps
    assert t2 is not None
    assert benchlib.memory_canary_sec(mb=0) is None
    assert benchlib.memory_canary_sec(mb=8, passes=0) is None


def test_clk_tck_scaling_is_sysconf_derived():
    import os

    assert benchlib._CLK_TCK == int(os.sysconf("SC_CLK_TCK"))
    s = benchlib._steal_ms()
    # on this Linux sandbox /proc/stat is present and monotonic
    assert s is not None and s >= 0
    assert benchlib._steal_ms() >= s


def _scaling_module():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH", "scaling.py")
    spec = importlib.util.spec_from_file_location("npdv_bench_scaling", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_state_roundtrip_skips_degraded_rounds(tmp_path):
    # Crash-resume doctrine: a saved level-round is only reused if it was
    # steal-qualified; a round that exhausted its retries in a degraded
    # window must be re-measured on resume, not locked in.
    scaling = _scaling_module()
    state = str(tmp_path / "state.jsonl")
    good = {"sec": 100.0, "rows_per_sec": 1.0, "round_steal_qualified": True}
    bad = {"sec": 300.0, "rows_per_sec": 0.3, "round_steal_qualified": False}
    scaling.append_gate_state(state, 4, 0, good)
    scaling.append_gate_state(state, 16, 0, bad)
    scaling.append_gate_state(state, 4, 1, good)
    loaded = scaling.load_gate_state(state)
    assert set(loaded) == {(4, 0), (4, 1)}
    assert loaded[(4, 0)] == good


def test_gate_state_drops_rounds_from_a_different_budget(tmp_path):
    # ADVICE r6 scaling:249 — the state filename doesn't key the steal
    # budget, so a resume must drop rounds qualified under a different
    # NPDV_STEAL_BUDGET_FRAC than the current run reports. Legacy entries
    # with no recorded budget are kept (they predate the field).
    scaling = _scaling_module()
    state = str(tmp_path / "state.jsonl")
    loose = {
        "sec": 100.0,
        "rows_per_sec": 1.0,
        "round_steal_qualified": True,
        "steal_budget_frac": 0.25,
    }
    matching = dict(loose, steal_budget_frac=0.05)
    legacy = {"sec": 90.0, "rows_per_sec": 1.1, "round_steal_qualified": True}
    scaling.append_gate_state(state, 4, 0, loose)
    scaling.append_gate_state(state, 4, 1, matching)
    scaling.append_gate_state(state, 16, 0, legacy)
    loaded = scaling.load_gate_state(state, budget_frac=0.05)
    assert set(loaded) == {(4, 1), (16, 0)}
    # no budget passed -> everything qualified is reused (old behavior)
    assert set(scaling.load_gate_state(state)) == {(4, 0), (4, 1), (16, 0)}


def test_gate_state_drops_rounds_from_a_different_budget_floor(tmp_path):
    # The absolute budget floor (NPDV_STEAL_BUDGET_FLOOR_MS) also changes
    # qualification, so a resume drops rounds banked under a different
    # floor than the current run's. Entries with no recorded floor
    # qualified under the pure fraction — strictly tighter than any floor
    # for minutes-long gate reps — and are kept.
    scaling = _scaling_module()
    state = str(tmp_path / "state.jsonl")
    base = {"sec": 100.0, "rows_per_sec": 1.0, "round_steal_qualified": True}
    loose = dict(base, steal_budget_floor_ms=20000.0)
    matching = dict(base, steal_budget_floor_ms=benchlib.STEAL_BUDGET_FLOOR_MS)
    legacy = dict(base)  # predates the field
    scaling.append_gate_state(state, 4, 0, loose)
    scaling.append_gate_state(state, 4, 1, matching)
    scaling.append_gate_state(state, 16, 0, legacy)
    assert set(scaling.load_gate_state(state)) == {(4, 1), (16, 0)}


def test_gate_state_tolerates_torn_final_line(tmp_path):
    # The writer can be killed mid-append; the truncated line must not
    # poison the resume of the completed rounds before it.
    scaling = _scaling_module()
    state = str(tmp_path / "state.jsonl")
    scaling.append_gate_state(
        state, 4, 0, {"sec": 1.0, "round_steal_qualified": True}
    )
    with open(state, "a") as f:
        f.write('{"level": 16, "round": 0, "result": {"sec"')
    loaded = scaling.load_gate_state(state)
    assert set(loaded) == {(4, 0)}


def test_gate_state_missing_file_is_empty():
    scaling = _scaling_module()
    assert scaling.load_gate_state("/nonexistent/state.jsonl") == {}
