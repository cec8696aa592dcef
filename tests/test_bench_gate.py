"""Window-gate logic in bench.py (VERDICT r4 #1): the recorded bench
must either land in an acceptable co-tenancy window or say explicitly
that every attempt was degraded. Pure-python tests — run_pipeline is
monkeypatched, no Spark session."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _fake_pipeline(seconds_seq):
    """run_pipeline stub: each call pops the next per-trial seconds."""
    seq = list(seconds_seq)

    def fake(spark, n_files, trials=1, input_partitions=None):
        if n_files == 2_000:
            return 1, [0.0]  # the gate's untimed JIT warm pass
        out = [seq.pop(0) for _ in range(max(1, trials))]
        return 207_650, out  # n_triples == quiet ref → quality = 1/sec

    return fake


def test_gate_passes_on_quiet_window(monkeypatch):
    # first control lands in a degraded window (quality 0.2), second is
    # quiet (1.0) — the gate must retry once and pass, keeping BOTH
    # trials in the pool (each is a full execution)
    monkeypatch.setattr(bench, "run_pipeline", _fake_pipeline([5.0, 1.0]))
    monkeypatch.setenv("SPARK_GRAFT_RETRY_SLEEP", "0")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET_S", "60")
    secs, record = bench._window_gate(None, 500_000, "32")
    assert record["passed"] is True
    # cpus=32 == the data-sized 32-partition layout → poolable
    assert secs == [5.0, 1.0]
    assert [a["quality"] for a in record["attempts"]] == [0.2, 1.0]


def test_gate_flags_all_degraded(monkeypatch):
    # budget of 0 → one attempt, degraded → passed False, attempt kept
    monkeypatch.setattr(bench, "run_pipeline", _fake_pipeline([4.0]))
    monkeypatch.setenv("SPARK_GRAFT_RETRY_SLEEP", "0")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET_S", "0")
    secs, record = bench._window_gate(None, 500_000, "32")
    assert record["passed"] is False
    assert secs == [4.0]
    assert record["attempts"][0]["quality"] == 0.25


def test_gate_inactive_without_reference(monkeypatch):
    # unknown config → gate skips rather than inventing a reference
    monkeypatch.setattr(
        bench, "run_pipeline",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("must not run")),
    )
    secs, record = bench._window_gate(None, 123, "7")
    assert secs == [] and "skipped" in record


def test_headline_carries_window_flags():
    res = {
        "metric": "m", "value": 1.0, "unit": "u", "queries": {}, "sf": "0.1",
        "cpus": "32", "total_seconds": 1.0,
        "pipeline": {"seconds": 1.0, "n_triples": 1, "trials": 4},
        "window_quality_vs_quiet_ref": 0.91,
        "window_all_attempts_degraded": False,
        "window_gate": {"attempts": [{"seconds": 5.0}, {"seconds": 1.0}]},
    }
    head = bench._headline(res)
    assert head["window_all_attempts_degraded"] is False
    assert head["window_gate_attempts"] == 2
    # the driver's tail capture is ~2,000 chars; the headline must stay
    # far under it even with the new fields
    import json

    assert len(json.dumps(head)) < 1200


def test_gate_controls_not_pooled_on_layout_mismatch(monkeypatch):
    # cpus=16: the control replicates the 16-partition reference layout
    # while the battery runs the 32-partition data-sized layout — the
    # control seconds must NOT join the battery's min-over-trials pool
    monkeypatch.setattr(bench, "run_pipeline", _fake_pipeline([1.0]))
    monkeypatch.setenv("SPARK_GRAFT_RETRY_SLEEP", "0")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET_S", "60")
    secs, record = bench._window_gate(None, 500_000, "16")
    assert record["passed"] is True
    assert secs == []
    assert record["attempts"][0]["seconds"] == 1.0


def test_gate_fallback_quality_and_headline_passthrough():
    """When the battery layout has no quiet reference (e.g. cpus=16 with
    a data-sized 32-partition pipeline), the headline must still carry a
    window quality — the best LAYOUT-PINNED gate control — or the
    explicit degraded flag, never null (VERDICT r4 #1)."""
    import bench

    gate = {"attempts": [{"quality": 0.41}, {"quality": 0.55}], "passed": False}
    assert bench._gate_fallback_quality(gate) == 0.55
    assert bench._gate_fallback_quality({"attempts": []}) is None
    assert bench._gate_fallback_quality({}) is None

    res = {
        "metric": "m", "value": 1.0, "unit": "u", "queries": {}, "sf": "0.1",
        "cpus": "16",
        "pipeline": {"seconds": 1, "n_triples": 1, "trials": 1},
        "total_seconds": 1.0,
        "window_quality_vs_quiet_ref": 0.55,
        "window_quality_source": "best layout-pinned gate control",
        "window_all_attempts_degraded": True,
        "window_gate": gate,
    }
    h = bench._headline(res)
    assert h["window_quality_vs_quiet_ref"] == 0.55
    assert h["window_quality_source"] == "best layout-pinned gate control"
    assert h["window_all_attempts_degraded"] is True
    assert h["window_gate_attempts"] == 2
