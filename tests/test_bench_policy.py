"""No-Spark tests for bench.py's record-integrity policy (VERDICT r11
Next #1): the load gate that refuses to start a sweep on a busy machine,
and the solo-substitution rule that keeps ambient-load spikes out of the
committed headline while letting real regressions through.

These import bench.py but never build a SparkSession — the policy
functions are pure (injectable loadavg/sleep), so this file runs in
milliseconds and gates commits cheaply.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


# ---------------------------------------------------------------- load gate

def test_wait_for_quiet_passes_immediately_when_idle():
    calls = []
    gate = bench.wait_for_quiet(
        threshold=2.0, timeout_s=900, poll_s=30,
        getloadavg=lambda: (0.5, 0.4, 0.3),
        sleep=calls.append,
        read_steal=lambda: None,
    )
    assert gate["timed_out"] is False
    assert gate["waited_s"] == 0.0
    assert calls == []  # never slept


def test_wait_for_quiet_backs_off_until_load_drops():
    loads = iter([(5.0,), (4.0,), (1.2,)])
    slept = []
    gate = bench.wait_for_quiet(
        threshold=2.0, timeout_s=900, poll_s=30,
        getloadavg=lambda: next(loads),
        sleep=slept.append,
        read_steal=lambda: None,
    )
    assert gate["timed_out"] is False
    assert gate["load_at_start"] == 5.0
    assert gate["load_at_go"] == 1.2
    assert slept == [30, 30]
    assert gate["waited_s"] == 60.0


def test_wait_for_quiet_times_out_and_flags():
    gate = bench.wait_for_quiet(
        threshold=2.0, timeout_s=90, poll_s=30,
        getloadavg=lambda: (4.4, 4.0, 3.9),
        sleep=lambda s: None,
        read_steal=lambda: None,
    )
    assert gate["timed_out"] is True
    assert gate["waited_s"] == 90.0  # capped at timeout, partial last step
    assert gate["load_at_go"] == 4.4


# ------------------------------------------------------------ steal gate

def test_wait_for_quiet_measures_one_steal_interval_before_go():
    """With a steal counter present and no steal occurring, the gate
    must still sleep exactly one poll interval (steal is a rate: two
    samples needed) and then pass."""
    slept = []
    gate = bench.wait_for_quiet(
        threshold=2.0, timeout_s=900, poll_s=30,
        getloadavg=lambda: (0.5, 0.4, 0.3),
        sleep=slept.append,
        steal_threshold=0.5,
        read_steal=iter([100.0, 100.0]).__next__,  # zero delta
    )
    assert gate["timed_out"] is False
    assert slept == [30]
    assert gate["steal_rate_at_go"] == 0.0


def test_wait_for_quiet_waits_out_steal_burst():
    """loadavg idle but the hypervisor is stealing 2 vCPU: the gate must
    hold until the steal rate drops under the threshold."""
    # deltas over 30 s polls: 60 s (rate 2.0), 30 s (1.0), 3 s (0.1)
    steals = iter([0.0, 60.0, 90.0, 93.0])
    slept = []
    gate = bench.wait_for_quiet(
        threshold=2.0, timeout_s=900, poll_s=30,
        getloadavg=lambda: (0.2, 0.2, 0.2),
        sleep=slept.append,
        steal_threshold=0.5,
        read_steal=steals.__next__,
    )
    assert gate["timed_out"] is False
    assert slept == [30, 30, 30]
    assert gate["steal_rate_at_go"] == 0.1


def test_wait_for_quiet_steal_timeout_flags():
    """Steal that never stops flags the record (timed_out)."""
    t = [0.0]
    def fake_steal():
        t[0] += 45.0  # 1.5 vCPU stolen per 30 s poll, forever
        return t[0]
    gate = bench.wait_for_quiet(
        threshold=2.0, timeout_s=90, poll_s=30,
        getloadavg=lambda: (0.2, 0.2, 0.2),
        sleep=lambda s: None,
        steal_threshold=0.5,
        read_steal=fake_steal,
    )
    assert gate["timed_out"] is True
    assert gate["steal_rate_at_go"] == 1.5


# ------------------------------------------------------- solo substitution

def test_solo_substitution_exonerates_load_spike():
    # sweep saw 2.67 s, committed prior 1.18 s, solo retest reproduced the
    # prior exactly (the r11 ann_topk_sq8_exact case) -> headline takes the
    # solo median, sweep value stays only in the sidecar
    sweep = {"a": 2.671, "b": 1.0}
    solo = {"a": {"prior": 1.178, "sweep_median": 2.671, "solo_median": 1.179}}
    headline, subst = bench.apply_solo_substitution(sweep, solo)
    assert headline == {"a": 1.179, "b": 1.0}
    assert subst == ["a"]


def test_solo_substitution_keeps_real_regression():
    # solo retest STAYS high (2.4 s vs prior 1.0): a real regression —
    # the sweep median remains the headline number
    sweep = {"a": 2.5}
    solo = {"a": {"prior": 1.0, "sweep_median": 2.5, "solo_median": 2.4}}
    headline, subst = bench.apply_solo_substitution(sweep, solo)
    assert headline == {"a": 2.5}
    assert subst == []


def test_solo_substitution_tolerance_boundary():
    # at exactly tol*prior the entry is exonerated; just above it is not
    sweep = {"a": 2.0, "b": 2.0}
    solo = {
        "a": {"prior": 1.0, "solo_median": round(bench.SOLO_CONFIRM_TOL, 3)},
        "b": {"prior": 1.0, "solo_median": bench.SOLO_CONFIRM_TOL + 0.01},
    }
    headline, subst = bench.apply_solo_substitution(sweep, solo)
    assert subst == ["a"]
    assert headline["a"] == round(bench.SOLO_CONFIRM_TOL, 3)
    assert headline["b"] == 2.0


def test_solo_substitution_never_raises_headline():
    # pathological: solo median ABOVE the sweep median (machine got busier
    # during the retest) — keep the lower sweep value
    sweep = {"a": 1.05}
    solo = {"a": {"prior": 1.0, "solo_median": 1.09}}
    headline, subst = bench.apply_solo_substitution(sweep, solo)
    assert headline == {"a": 1.05}
    assert subst == []


def test_solo_substitution_ignores_malformed_entries():
    sweep = {"a": 2.0}
    headline, subst = bench.apply_solo_substitution(
        sweep,
        {"a": {"sweep_median": 2.0}, "ghost": {"prior": 1, "solo_median": 1}},
    )
    assert headline == {"a": 2.0}
    assert subst == []


# ------------------------------------------------------------ history ledger

def test_append_history_is_append_only_jsonl(tmp_path):
    rec1 = {"ts": 1.0, "sf": 0.1, "queries": {"a": 1.0}}
    rec2 = {"ts": 2.0, "sf": 0.1, "queries": {"a": 1.1}, "subset": ["a"]}
    bench.append_history(str(tmp_path), rec1)
    bench.append_history(str(tmp_path), rec2)
    lines = (tmp_path / "BENCH_HISTORY.jsonl").read_text().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["ts"] == 1.0
    assert json.loads(lines[1])["subset"] == ["a"]
