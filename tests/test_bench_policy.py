"""Forced-branch smoke tests for bench.py's contended-window rerun
policy (r9 verdict ask #1).

The policy decision is a pure function (`bench._rerun_reason`), so every
branch — including the exact sub-threshold-q1 / high-total window that
evaded the r9 marker-only policy — is pinned without a SparkSession.
No Spark fixtures: this module runs in milliseconds.
"""

from __future__ import annotations

import bench


def test_quiet_window_no_rerun():
    # The committed r10 quiet artifact: q1 = 0.73 s, legacy-19 = 12.111 s.
    assert bench._rerun_reason(0.73, 12.111) is None


def test_q1_marker_breach_fires():
    # My-run shape from r9: contended first pass with q1 = 1.739 s.
    assert bench._rerun_reason(1.739, 32.2) == "q1_marker+legacy19_total"
    assert bench._rerun_reason(1.739, 15.0) == "q1_marker"


def test_evasion_window_now_fires_on_total():
    # THE r9 evasion window (driver's BENCH_r09): q1 = 1.482 s sat
    # 0.018 s under r9's 1.5 s marker trigger while legacy-19 published
    # 21.768 s.  After the r10 recalibration the MARKER alone catches
    # it too, so both witnesses fire.
    assert bench._rerun_reason(1.482, 21.768) == "q1_marker+legacy19_total"
    # The r10-shaped evasion twin: q1 just under the new 1.1 s trigger
    # while the total reads far above the quiet record — the total
    # backstop must still fire alone.
    assert bench._rerun_reason(1.09, 16.4) == "legacy19_total"


def test_boundaries_are_strict():
    # Exactly at-threshold readings do NOT fire (strict >, matching the
    # r9 marker semantics); epsilon above does.
    assert bench._rerun_reason(bench.Q1_BAND_MAX_SEC,
                               bench.LEGACY19_TRIGGER_SEC) is None
    assert bench._rerun_reason(bench.Q1_BAND_MAX_SEC + 1e-9,
                               bench.LEGACY19_TRIGGER_SEC) == "q1_marker"
    assert (bench._rerun_reason(0.9, bench.LEGACY19_TRIGGER_SEC + 1e-9)
            == "legacy19_total")


def test_trigger_calibration_vs_committed_record():
    # The backstop is 1.25x the best committed quiet legacy-19 on
    # record (12.111 s, round-10 close BENCH_DETAIL); if a future round
    # re-baselines, this pin forces the constant to be revisited
    # alongside it.
    assert abs(bench.LEGACY19_TRIGGER_SEC - 1.25 * 12.111) < 0.02
