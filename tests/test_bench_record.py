"""Host-only tests for bench.py's measurement bookkeeping (r5).

bench.py is the driver's headline artifact, so its non-device logic —
mode parsing, metric-string construction, the BENCH_LOCAL.json live
record, and the dead-tunnel fallback's citation lookup — gets pinned
here without touching a device. (The timed path itself is exercised on
the real chip; see PERF.md.)
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mode_suffix_strings(bench, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    assert bench._parse_modes() == (True, 2, False, False, "conv")
    assert bench._mode_suffix(True, 2, False, False, "conv") \
        == " [approx_guidance]"
    monkeypatch.setattr(sys, "argv", ["bench.py", "--exact"])
    assert bench._parse_modes()[0] is False
    assert bench._mode_suffix(False, 2, False, False, "conv") == ""
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--approx-guidance-stride", "4"])
    assert bench._parse_modes()[:2] == (True, 4)
    assert "[approx_guidance s=4]" in bench._mode_suffix(
        True, 4, False, False, "conv")


def test_exact_conflicts_exit_fast(bench, monkeypatch):
    """--exact + an approx-parameter flag must sys.exit BEFORE any device
    probe (the probe blocks up to 480 s on a dead tunnel)."""
    for extra in (["--approx-refine"], ["--approx-guidance-stride", "4"]):
        monkeypatch.setattr(sys, "argv", ["bench.py", "--exact"] + extra)
        with pytest.raises(SystemExit):
            bench._parse_modes()


def test_record_local_and_fallback_citation(bench, tmp_path, monkeypatch):
    """A live measurement lands in BENCH_LOCAL.json keyed by metric
    string, and the dead-tunnel fallback cites it when (and only when)
    no driver BENCH_r*.json matches the mode."""
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: os.path.join(str(tmp_path), "bench.py"))
    rec = {"metric": "m [approx_guidance]", "value": 32.9,
           "unit": "pairs/s", "vs_baseline": 1.64}
    bench._record_local(rec)
    bench._record_local({"metric": "m", "value": 27.5, "unit": "pairs/s",
                         "vs_baseline": 1.37})
    book = json.load(open(tmp_path / "BENCH_LOCAL.json"))
    assert book["m [approx_guidance]"]["value"] == 32.9
    assert book["m"]["value"] == 27.5
    assert "ts" in book["m"]

    # updating a metric overwrites, never duplicates
    bench._record_local(dict(rec, value=33.1))
    book = json.load(open(tmp_path / "BENCH_LOCAL.json"))
    assert book["m [approx_guidance]"]["value"] == 33.1
    assert len(book) == 2


def test_dead_tunnel_fallback_subprocess(tmp_path):
    """End-to-end: run bench.py with a probe forced dead in a sandbox repo
    copy holding a BENCH_r01.json (exact mode) and a BENCH_LOCAL.json
    (approx mode). Default mode must cite BENCH_LOCAL, --exact must cite
    the round file."""
    import shutil
    sandbox = tmp_path / "repo"
    sandbox.mkdir()
    src = open(os.path.join(REPO, "bench.py")).read()
    # force the reachability probe dead; everything else untouched
    src = src.replace("def _device_reachable(timeout=480):",
                      "def _device_reachable(timeout=480):\n    return False")
    (sandbox / "bench.py").write_text(src)
    exact_metric = ("IRR-PWC eval image pairs/sec/chip @ Sintel 1024x436 "
                    "(bf16)")
    (sandbox / "BENCH_r01.json").write_text(json.dumps(
        {"metric": exact_metric, "value": 27.52, "unit": "pairs/s"}))
    (sandbox / "BENCH_LOCAL.json").write_text(json.dumps(
        {exact_metric + " [approx_guidance]":
         {"metric": exact_metric + " [approx_guidance]", "value": 32.92,
          "unit": "pairs/s", "ts": "2026-08-20T12:45Z"}}))

    def run(*flags):
        out = subprocess.run([sys.executable, str(sandbox / "bench.py"),
                              *flags], capture_output=True, text=True,
                             timeout=120, cwd=str(sandbox))
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    d = run()
    assert d["metric"].endswith("[approx_guidance]")
    assert "BENCH_LOCAL.json 32.92" in d["error"]
    e = run("--exact")
    assert e["metric"] == exact_metric
    assert "BENCH_r01.json 27.52" in e["error"]
