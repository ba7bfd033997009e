"""Units for the r14 bench contention guard (bench.py).

The guard's job: a rep bracketed by constant-work probes that read
above 1.75x the run's P10 probe floor was measured during a co-tenant
burst and must be discarded/retried; a quiet run must discard nothing
(BASELINE.md r14). These tests pin the floor and threshold arithmetic
so a future edit cannot silently turn the guard trigger-happy (a
single CPU-boost probe poisoning a min-based floor was the shakedown
failure mode) or blind."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _CONTENTION_FACTOR, _probe_floor, _short_cpu_probe  # noqa: E402


def test_probe_floor_is_p10_not_min():
    # one boost-fast outlier among 19 steady probes must NOT set the
    # floor (min-based floors marked quiet reps contended, r14
    # shakedown: min 0.043 vs steady 0.06 on an idle machine)
    probes = [0.043] + [0.06] * 19
    assert _probe_floor(sorted(probes)) == 0.06
    assert _probe_floor(probes) == 0.06  # order-insensitive
    # tiny samples degrade to near-min, never out of range
    assert _probe_floor([0.05]) == 0.05
    assert _probe_floor([0.07, 0.05]) == 0.05


def test_quiet_jitter_stays_clean_and_bursts_trip():
    floor = 0.06
    thresh = _CONTENTION_FACTOR * floor
    # measured quiet-machine jitter tops out ~1.41x min — clean
    assert 0.06 * 1.41 <= thresh
    # the burst class this guard exists for reads 2-6x — contended
    assert 0.06 * 2.0 > thresh


def test_short_probe_is_short_and_positive():
    t = _short_cpu_probe()
    assert 0.005 < t < 2.0  # ~70 ms nominal; bounded even under load

def test_run_level_flag_uses_p10_floor_not_min():
    """r15 (r14 ADVICE item 3): the run-level contention_flag must
    compare the probe mean against the P10 floor — the idle-machine
    shakedown sample (one boost-fast probe among steady ones) must
    NOT trip it."""
    # idle-machine shakedown shape: min 0.043, steady 0.06 → mean
    # 0.059; a min-based 1.3x threshold (0.0559) trips, the P10-floor
    # threshold (0.078) does not.
    probes = [0.043] + [0.06] * 19
    mean = sum(probes) / len(probes)
    assert mean > 1.3 * min(probes)          # the old rule false-positives
    assert mean <= 1.3 * _probe_floor(probes)  # the r15 rule stays quiet
    # genuine load (mean 2x steady) still trips
    loaded = [0.06] * 10 + [0.18] * 10
    assert sum(loaded) / len(loaded) > 1.3 * _probe_floor(sorted(loaded))


def test_clean_subset_total_arithmetic():
    """clean_subset_total = sum over unflagged queries only; equals
    the full total when nothing is flagged (quiet run)."""
    timings = {"a": 1.0, "b": 2.0, "c": 4.0}
    flagged = ["b"]
    clean = round(
        sum(s for q, s in timings.items() if q not in set(flagged)), 3
    )
    assert clean == 5.0
    assert round(
        sum(s for q, s in timings.items() if q not in set([])), 3
    ) == 7.0
