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
