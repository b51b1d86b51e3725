"""bench.py partial-result checkpoint/recovery (tunnel-outage resilience).

A mid-phase tunnel outage kills the phase subprocess after real measurements
were taken; the orchestrator must salvage the checkpointed metrics instead of
reporting nothing (observed: a 50-min serving phase lost to an outage at the
final streaming stage).
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # isolate from a concurrently-running real bench's checkpoint files
    monkeypatch.setattr(
        mod, "_partial_path",
        lambda label: str(tmp_path / f"bench_partial_{label}.json"))
    return mod


def test_checkpoint_then_recover(bench):
    metrics = {"reconstruction_rtf": 0.025, "decode_tokens_per_sec": 400.0}
    bench._checkpoint_partial("serving", metrics)
    rec = bench._recover_partial("serving")
    assert rec is not None
    assert rec["reconstruction_rtf"] == 0.025
    assert rec["serving_partial"] is True
    os.remove(bench._partial_path("serving"))


def test_recover_missing_or_empty_returns_none(bench):
    try:
        os.remove(bench._partial_path("train"))
    except OSError:
        pass
    assert bench._recover_partial("train") is None
    bench._checkpoint_partial("train", {})
    assert bench._recover_partial("train") is None
    os.remove(bench._partial_path("train"))


def test_orchestrator_merges_recovered_partial(bench, monkeypatch, capsys):
    """main() with both phases failing must emit one JSON line carrying the
    recovered serving metrics plus the stable driver-facing schema keys."""
    monkeypatch.setenv("BENCH_TINY", "1")       # skip backend preflight
    monkeypatch.setenv("BENCH_TRAIN", "1")

    def fake_phase(flag, timeout, label):
        # child measured two stages, checkpointed, then "died"
        if label == "serving":
            bench._checkpoint_partial(
                "serving", {"reconstruction_rtf": 0.03})
        return None

    monkeypatch.setattr(bench, "_run_phase_subprocess", fake_phase)
    bench.main()
    line = [l for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["reconstruction_rtf"] == 0.03
    assert out["serving_partial"] is True
    assert out["metric"] == "completion_rtf" and out["value"] is None
    assert out["unit"] == "wall_s_per_audio_s"


def test_orchestrator_clears_stale_partials(bench, monkeypatch, capsys):
    """Partials from a PREVIOUS run must not leak into a run whose phases
    genuinely fail before checkpointing anything."""
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_TRAIN", "0")
    bench._checkpoint_partial("serving", {"reconstruction_rtf": 0.999})
    monkeypatch.setattr(bench, "_run_phase_subprocess",
                        lambda flag, timeout, label: None)
    bench.main()
    line = [l for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")][-1]
    out = json.loads(line)
    assert "reconstruction_rtf" not in out
    assert out["value"] is None and "error" in out
