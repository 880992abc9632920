"""tools/bank_on_return.py runs unattended for hours during tunnel outages;
its probe/step machinery gets the same CPU coverage as bench.py's
(test_bench_utils.py) so a wedged child or a missing script can never
wedge the banking pipeline itself."""

import json
import subprocess
import sys
import time


def _mod():
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    import bank_on_return

    return bank_on_return


def test_probe_bounded_against_hang(monkeypatch):
    b = _mod()
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        return real_run(
            [sys.executable, "-c", "import time; time.sleep(60)"], **kw)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(b, "PROBE_DEADLINE_S", 1)
    t0 = time.perf_counter()
    p = b.probe()
    assert p["ok"] is False and p["mode"] == "timeout"
    assert time.perf_counter() - t0 < 10


def test_probe_rejects_cpu_fallback(monkeypatch):
    # A CPU-only jax (plugin failure / missing env) must NOT fire the
    # banking queue — bench.probe_tpu's cpu_fallback mode, shared here.
    b = _mod()
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        return real_run(
            [sys.executable, "-c",
             "print('PROBE_OK [\"CpuDevice(id=0)\"]')"], **kw)

    monkeypatch.setattr(subprocess, "run", fake_run)
    p = b.probe()
    assert p["ok"] is False and p["mode"] == "cpu_fallback"


def test_run_step_skips_missing_script():
    b = _mod()
    r = b.run_step("nope", [sys.executable, "-u", "tools/does_not_exist.py"],
                   10)
    assert r == {"skipped": "script not present"}


def test_run_step_captures_rc_and_tails():
    b = _mod()
    r = b.run_step(
        "ok", [sys.executable, "-c", "print('hello'); print('world')"], 30)
    assert r["rc"] == 0
    assert r["stdout_tail"][-1] == "world"

    r = b.run_step(
        "fail",
        [sys.executable, "-c", "import sys; print('x'); sys.exit(3)"], 30)
    assert r["rc"] == 3  # failure recorded, not raised


def test_run_step_timeout_is_rc_124():
    b = _mod()
    r = b.run_step(
        "hang", [sys.executable, "-c", "import time; time.sleep(60)"], 1)
    assert r["rc"] == 124
    assert r["seconds"] < 10


def test_queue_scripts_exist():
    import os

    b = _mod()
    for name, cmd, timeout_s in b.QUEUE:
        assert os.path.exists(os.path.join(b.REPO, cmd[2])), (name, cmd[2])
        assert timeout_s > 60


def test_main_gives_up_and_writes_artifact(monkeypatch, tmp_path):
    b = _mod()
    monkeypatch.setattr(b, "OUT", str(tmp_path / "banked.json"))
    monkeypatch.setattr(b, "probe",
                        lambda: {"ok": False, "mode": "timeout"})
    monkeypatch.setattr(b.time, "sleep", lambda s: None)
    monkeypatch.setattr(sys, "argv",
                        ["bank_on_return.py", "--max-wait-h", "0"])
    assert b.main() == 1
    rec = json.load(open(tmp_path / "banked.json"))
    assert rec["ok"] is False and rec["probes"] >= 1
