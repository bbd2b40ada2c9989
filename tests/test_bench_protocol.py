"""Pins for the bench.py interleaved-control protocol (round 14).

Pure-Python: no SparkSession.  Guards the invariants the recorded BENCH
artifacts depend on — one CONTROLS definition shared by the quiet gate and
the controls_sec subtotal, a reference epoch that matches the recorded
BENCH_r11.json artifact byte-for-byte, and normalization math that projects
an adjacent-control-bracketed reading onto that epoch.
"""

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_controls_is_single_source_of_truth():
    # the gate fires once every CONTROLS member has been timed, so every
    # control must be a headline query — otherwise the gate never fires
    # and a poller run silently pays the full ~5min
    assert set(bench.CONTROLS) <= set(bench.HEADLINE)
    # the gate must be reachable before any non-control work dominates:
    # controls are the headline prefix (cheap ~90s abort is the contract)
    assert bench.HEADLINE[: len(bench.CONTROLS)] == bench.CONTROLS


def test_r11_reference_epoch_matches_recorded_artifact():
    with open(os.path.join(REPO, "BENCH_r11.json")) as f:
        parsed = json.load(f)["parsed"]
    recorded = {**parsed["queries"], **parsed["extended"]}
    assert bench.R11_REF == recorded


def test_r11_reference_covers_every_benched_query():
    assert set(bench.R11_REF) == set(bench.HEADLINE) | set(bench.EXTENDED)


def test_streaming_warm_twice_is_module_level_and_benched():
    # scripts_cluster_min_probe.py imports this set (and R11_REF) instead
    # of carrying drift-prone copies; its members must be benched queries
    assert bench.STREAMING_WARM_TWICE <= set(bench.HEADLINE) | set(bench.EXTENDED)


def test_interleave_yardsticks():
    # q1 (CPU-bound) brackets everything except itself; q3 (exchange-bound)
    # brackets q1.  Both are untouched TPC-H controls.
    assert bench.INTERLEAVE_CTRL in bench.CONTROLS
    assert bench.INTERLEAVE_CTRL_ALT in bench.CONTROLS
    assert bench.interleave_ctrl_for("dedup_exact") == bench.INTERLEAVE_CTRL
    assert bench.interleave_ctrl_for(bench.INTERLEAVE_CTRL) == bench.INTERLEAVE_CTRL_ALT
    # the secondary (exchange-bound) bracket covers every non-yardstick
    # query; the yardsticks bracket each other only once
    assert bench.interleave_ctrl2_for("dedup_exact") == bench.INTERLEAVE_CTRL_ALT
    assert bench.interleave_ctrl2_for(bench.INTERLEAVE_CTRL) is None
    assert bench.interleave_ctrl2_for(bench.INTERLEAVE_CTRL_ALT) is None
    for name in bench.HEADLINE + bench.EXTENDED:
        assert bench.interleave_ctrl_for(name) != name
        assert bench.interleave_ctrl2_for(name) != name


def test_normalization_math():
    q1 = bench.INTERLEAVE_CTRL
    ref = bench.R11_REF[q1]
    # a query reading exactly its bracketing control's wall maps to the
    # control's epoch value
    assert bench.normalized_sec(0.5, 0.5, q1) == round(ref, 3)
    # 2x the control under 2x contention cancels: same normalized value
    assert bench.normalized_sec(1.0, 1.0, q1) == bench.normalized_sec(0.5, 0.5, q1)
    # degenerate control reading must not divide by zero
    assert bench.normalized_sec(0.5, 0.0, q1) == 0.0
