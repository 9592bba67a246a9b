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


def test_main_streams_sections_and_ends_with_artifact(capsys, monkeypatch,
                                                      tmp_path):
    """main() end-to-end with stub sections: one JSON line per section as
    it completes (the hard-kill survival channel), artifact LAST."""
    monkeypatch.setenv("CHA1_BENCH_SKIP_PROBE", "1")
    monkeypatch.setenv("CHA1_BENCH_PARTIAL", "")
    monkeypatch.setenv("CHA1_BENCH_SENTINEL", str(tmp_path / "warm.json"))
    bench.main(sections=[("baseline", _baseline_stub, False),
                         ("tpu", _tpu_stub, True)])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 3
    sections = [json.loads(l) for l in lines[:-1]]
    assert [s["bench_section"] for s in sections] == ["baseline", "tpu"]
    assert all(s["ok"] for s in sections)
    out = json.loads(lines[-1])
    assert out["metric"] == "walker_steps_per_sec_hc5n"
    assert out["value"] == 5e6
    assert out["backend_probe"]["skipped"] is True
    assert out["warm"]["digest"]


def test_hard_kill_leaves_streamed_sections_parseable(tmp_path):
    """The BENCH_r04 failure mode: an external SIGKILL mid-section. The
    already-streamed per-section JSON lines must be recoverable from the
    (possibly truncated) captured output even though no final artifact was
    ever emitted."""
    import signal

    code = """
import sys, time
sys.path.insert(0, {repo!r})
import bench

def ok():
    return {{"rate": 1.0, "single_core_rate": 1.0, "cores": 1,
             "evals": 1, "seconds": 0.0}}

def tpu():
    return {{"rate": 5e6, "unfused_rate": 2e6, "fused_error": None,
             "gather_kernel_rate": None, "steps": 1, "nwalkers": 128,
             "dispatch_overhead_ms": 0.0, "acceptance": 0.5,
             "achieved_gflops": 1.0, "pct_vpu_f32_peak": 1.0,
             "device": "stub"}}

def hang():
    print("HANG-MARKER", flush=True)
    time.sleep(120)

probe = {{"ok": True, "seconds": 0.0, "error": None}}
bench.run_sections([("baseline", ok, False), ("tpu", tpu, True),
                    ("dense", hang, True)],
                   probe, deadline_s=300.0, partial_path=None)
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ, CHA1_PLATFORM="cpu")
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    out_path = tmp_path / "stdout.txt"
    with open(out_path, "w") as fh:
        proc = subprocess.Popen([sys.executable, "-c", code], stdout=fh,
                                stderr=subprocess.DEVNULL, env=env)
        t0 = time.time()
        # Wait until the hanging section started (its sections streamed).
        while time.time() - t0 < 30:
            if "HANG-MARKER" in out_path.read_text():
                break
            time.sleep(0.2)
        proc.send_signal(signal.SIGKILL)  # exact-PID kill, never by pattern
        proc.wait(timeout=30)
    assert proc.returncode != 0  # genuinely killed, no artifact line
    lines = [l for l in out_path.read_text().splitlines()
             if l.startswith("{")]
    recovered = {json.loads(l)["bench_section"]: json.loads(l)
                 for l in lines}
    assert recovered["baseline"]["ok"] and recovered["tpu"]["ok"]
    assert recovered["tpu"]["rate"] == 5e6


def test_watchdog_artifact_escapes_chatter_redirect(tmp_path):
    """redirect_stdout is process-wide: when the watchdog fires while a
    section has bench._chatter() active (the r5 warm-2 failure: the
    artifact landed in the chatter file), the emitted artifact must still
    reach the REAL stdout."""
    code = """
import sys, time
sys.path.insert(0, {repo!r})
import bench

def ok():
    return {{"rate": 1.0, "single_core_rate": 1.0, "cores": 1,
             "evals": 1, "seconds": 0.0}}

def hang_in_chatter():
    with bench._chatter():
        print("this goes to the chatter file")
        time.sleep(60)

probe = {{"ok": True, "seconds": 0.0, "error": None}}
bench.run_sections([("baseline", ok, False), ("tpu", hang_in_chatter, True)],
                   probe, deadline_s=1.0, partial_path=None)
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ, CHA1_PLATFORM="cpu",
               CHA1_BENCH_LOG=str(tmp_path / "chatter.log"))
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=30, env=env)
    assert proc.returncode == 0
    stdout_jsons = [json.loads(l) for l in proc.stdout.splitlines()
                    if l.startswith("{")]
    art = stdout_jsons[-1]
    assert art["watchdog_fired"] is True
    assert "watchdog" in art["tpu_error"]
    # The chatter print stayed off stdout (it sits in the redirect
    # buffer, unflushed by os._exit), and the artifact stayed out of the
    # chatter file.
    assert "this goes to the chatter file" not in proc.stdout
    assert "watchdog_fired" not in (tmp_path / "chatter.log").read_text()


def test_cold_heavy_section_skipped_until_warmed(tmp_path):
    """Heavy sections (30-50 min cold terminal compiles) must be marked
    'cold' when the warm sentinel doesn't match the current program digest
    — and must run once it does (what a FORCE warm run records)."""
    sentinel = tmp_path / "warm.json"
    os.environ["CHA1_BENCH_SENTINEL"] = str(sentinel)
    try:
        digest = bench._program_digest()
        calls = []

        def dense():
            calls.append("dense")
            return {"n_lines": 1}

        sections = [("baseline", _baseline_stub, False),
                    ("dense", dense, True)]
        # Cold: no sentinel on disk.
        warm = bench._load_warm(digest)
        assert warm["match"] is False
        results = bench.run_sections(sections, PROBE_OK, deadline_s=60,
                                     partial_path=None, warm=warm)
        assert calls == []
        assert results["dense"]["skipped_cold"] is True
        assert "cold plan" in results["dense"]["error"]
        assert results["baseline"]["ok"] is True
        # Warmed at this digest: the section runs.
        bench._update_sentinel(digest, "dense")
        warm = bench._load_warm(digest)
        assert warm["match"] is True and warm["sections"]["dense"]
        results = bench.run_sections(sections, PROBE_OK, deadline_s=60,
                                     partial_path=None, warm=warm)
        assert calls == ["dense"]
        assert results["dense"]["ok"] is True
        # A kernel-source change invalidates the sentinel (different
        # digest -> cold again).
        stale = bench._load_warm("0" * 16)
        assert stale["match"] is False and not stale["sections"]
    finally:
        os.environ.pop("CHA1_BENCH_SENTINEL", None)


def test_probe_timeout_capped_inside_deadline(monkeypatch, capsys, tmp_path):
    """The whole process is budgeted from start: the probe's hard timeout
    can never exceed a quarter of the deadline (round 4's rc=124 was probe
    + full section deadline outlasting the driver's kill budget)."""
    seen = {}

    def fake_probe(timeout_s):
        seen["timeout"] = timeout_s
        return {"ok": True, "seconds": 0.1, "error": None}

    monkeypatch.setenv("CHA1_BENCH_DEADLINE_S", "1000")
    monkeypatch.setenv("CHA1_BENCH_PARTIAL", "")
    monkeypatch.setenv("CHA1_BENCH_SENTINEL", str(tmp_path / "warm.json"))
    monkeypatch.delenv("CHA1_BENCH_SKIP_PROBE", raising=False)
    monkeypatch.setattr(bench, "probe_backend", fake_probe)
    bench.main(sections=[("baseline", _baseline_stub, False)])
    assert seen["timeout"] == 250.0
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["baseline_walker_steps_per_sec"] == 1000.0
