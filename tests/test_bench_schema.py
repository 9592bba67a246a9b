"""Outage-proofing gates for the bench harness (bench.py).

Round 3's driver capture was zeroed by a single backend-init failure
(BENCH_r03.json rc=1, one traceback, nothing parseable). These tests force
each failure mode — a section raising, the backend probe reporting an
outage, and a section hanging past the deadline — and require that the
emitted artifact still parses and preserves every completed section.
"""

import json
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


PROBE_OK = {"ok": True, "seconds": 0.0, "error": None}
PROBE_DOWN = {"ok": False, "seconds": 600.0,
              "error": "probe timed out after 600s (relay outage?)"}


def _baseline_stub():
    return {"rate": 1000.0, "single_core_rate": 1000.0, "cores": 1,
            "evals": 10, "seconds": 0.01}


def _tpu_stub():
    return {"rate": 5e6, "unfused_rate": 2e6, "fused_error": None,
            "gather_kernel_rate": None, "gather_kernel_error": None,
            "steps": 10, "nwalkers": 128, "dispatch_overhead_ms": 25.0,
            "acceptance": 0.5, "achieved_gflops": 1.0,
            "pct_vpu_f32_peak": 1.0, "device": "stub"}


def test_section_failure_preserves_other_sections(tmp_path):
    """One raising section must not destroy the artifact: completed
    sections keep their values; the failed one records ok=False + error."""
    def boom():
        raise RuntimeError("synthetic section failure")

    partial = tmp_path / "partial.json"
    sections = [("baseline", _baseline_stub, False),
                ("tpu", _tpu_stub, True),
                ("dense", boom, True)]
    results = bench.run_sections(sections, PROBE_OK, deadline_s=60,
                                 partial_path=str(partial))
    out = bench._assemble(results, PROBE_OK)
    assert out["value"] == 5e6
    assert out["vs_baseline"] == 5000.0
    assert out["dense_catalog_1cyanonaphthalene"]["ok"] is False
    assert "synthetic section failure" in (
        out["dense_catalog_1cyanonaphthalene"]["error"])
    # Partial sidecar parses and already holds the completed sections.
    disk = json.loads(partial.read_text())
    assert disk["value"] == 5e6
    # The artifact is one parseable JSON object end-to-end.
    json.loads(json.dumps(out))


def test_backend_outage_marks_tpu_sections_and_keeps_cpu(tmp_path):
    """Probe failure (the BENCH_r03 failure mode): TPU sections are skipped
    with the outage recorded as data; the CPU baseline still runs; the
    headline value degrades to null instead of the process dying."""
    calls = []

    def tpu_should_not_run():
        calls.append("tpu")
        return _tpu_stub()

    sections = [("baseline", _baseline_stub, False),
                ("tpu", tpu_should_not_run, True)]
    results = bench.run_sections(sections, PROBE_DOWN, deadline_s=60,
                                 partial_path=str(tmp_path / "p.json"))
    out = bench._assemble(results, PROBE_DOWN)
    assert calls == []  # no in-process dispatch against a wedged relay
    assert out["value"] is None
    assert out["backend_probe"]["ok"] is False
    assert "outage" in out["backend_probe"]["error"]
    assert "backend unavailable" in out["tpu_error"]
    assert out["baseline_walker_steps_per_sec"] == 1000.0


def test_watchdog_emits_partial_json_on_hang():
    """A section hanging past the deadline (a wedged relay call cannot be
    interrupted in-process) force-emits the completed sections and exits 0.
    Runs in a subprocess because the watchdog uses os._exit."""
    code = """
import sys, time
sys.path.insert(0, {repo!r})
import bench

def ok():
    return {{"rate": 1.0, "single_core_rate": 1.0, "cores": 1,
             "evals": 1, "seconds": 0.0}}

def hang():
    time.sleep(60)

probe = {{"ok": True, "seconds": 0.0, "error": None}}
bench.run_sections([("baseline", ok, False), ("tpu", hang, True)],
                   probe, deadline_s=1.0, partial_path=None)
print("UNREACHABLE")
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ, CHA1_PLATFORM="cpu")
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=30, env=env)
    assert proc.returncode == 0
    assert "UNREACHABLE" not in proc.stdout
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["watchdog_fired"] is True
    assert out["baseline_walker_steps_per_sec"] == 1.0
    assert "watchdog" in out["tpu_error"]
    assert time.time() - t0 < 25


def test_main_emits_single_json_line_with_stubbed_sections(capsys, monkeypatch):
    """main() end-to-end with stub sections: exactly one JSON line on
    stdout, probe skippable via env for offline runs."""
    monkeypatch.setenv("CHA1_BENCH_SKIP_PROBE", "1")
    monkeypatch.setenv("CHA1_BENCH_PARTIAL", "")
    bench.main(sections=[("baseline", _baseline_stub, False),
                         ("tpu", _tpu_stub, True)])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    out = json.loads(lines[0])
    assert out["metric"] == "walker_steps_per_sec_hc5n"
    assert out["value"] == 5e6
    assert out["backend_probe"]["skipped"] is True
