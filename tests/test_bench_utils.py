"""bench.py helper machinery: the driver runs bench.py unattended at round
end, so its pure parts get CPU tests (the TPU datapoints themselves are
exercised by running bench.py on hardware)."""

import logging
import sys
import time

import jax.numpy as jnp
import numpy as np


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_timed_frames_outlier_flag():
    bench = _bench()

    def make_step(straggler_frame):
        def step(ds, ubo, frame, cfg):
            if int(frame) == straggler_frame:
                time.sleep(0.25)
            else:
                time.sleep(0.005)
            return jnp.zeros((4,), jnp.float32), jnp.int32(7)

        return step

    # Straggler present: flag set, ray total still accumulates all frames.
    rad, total, times, outlier = bench.timed_frames(
        make_step(3), None, None, None, 5, "t")
    assert outlier is True
    assert total == 35 and len(times) == 5

    # No straggler: flag clear.
    _, _, _, outlier = bench.timed_frames(
        make_step(-1), None, None, None, 4, "t")
    assert outlier is False


def test_compile_log_tap_parses_hit_and_compile_time():
    bench = _bench()
    tap = bench._CompileLogTap.install()
    try:
        logger = logging.getLogger("jax._src.compiler")
        logger.debug(
            "Persistent compilation cache hit for 'jit_step' with key "
            "'jit_step-abc123'")
        logger.debug("'jit_frame' took at least 0.00 seconds to compile "
                     "(12.34s)")
    finally:
        tap.remove()
    assert "jit_step" in tap.hits
    assert tap.compile_s["jit_frame"] == 12.34
    # Removal restores the handler-free state (no leak into later tests).
    assert tap._handler not in logging.getLogger(
        "jax._src.compiler").handlers


def test_drain_forces_scalar():
    bench = _bench()
    v = bench.drain(jnp.asarray(np.ones((8, 3), np.float32)))
    assert v == 24.0


def test_probe_gate_skips_on_cpu_platform(monkeypatch):
    # The test env pins JAX_PLATFORMS=cpu (conftest), so the gate must pass
    # without spawning any probe subprocess.
    bench = _bench()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("probe must not run on a CPU backend")

    monkeypatch.setattr(bench, "wait_for_tpu", boom)
    assert bench._probe_gate() is True


def test_probe_tpu_bounded_against_hang(monkeypatch):
    # Simulate the outage hang mode (MULTICHIP_r03 rc=124): the probe child
    # sleeps forever; the parent must return mode=timeout within deadline.
    bench = _bench()
    monkeypatch.setattr(
        bench.sys, "executable", bench.sys.executable, raising=True)
    real_run = bench.subprocess.run

    def fake_run(cmd, **kw):
        return real_run(
            [bench.sys.executable, "-c", "import time; time.sleep(60)"],
            **kw)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    t0 = time.perf_counter()
    p = bench.probe_tpu(deadline_s=1)
    assert p == {"ok": False, "mode": "timeout", "deadline_s": 1}
    assert time.perf_counter() - t0 < 10


def test_probe_tpu_rejects_cpu_fallback(monkeypatch):
    # jax silently falling back to the CPU backend must not pass the gate
    # (the bench would record CPU rates as a real headline).
    bench = _bench()
    real_run = bench.subprocess.run

    def fake_run(cmd, **kw):
        return real_run(
            [bench.sys.executable, "-c",
             "print('PROBE_OK [\"CpuDevice(id=0)\"]')"], **kw)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    p = bench.probe_tpu(deadline_s=30)
    assert p["ok"] is False and p["mode"] == "cpu_fallback"

    def fake_run_tpu(cmd, **kw):
        return real_run(
            [bench.sys.executable, "-c",
             "print('PROBE_OK [\"TPU v5 lite0\"]')"], **kw)

    monkeypatch.setattr(bench.subprocess, "run", fake_run_tpu)
    p = bench.probe_tpu(deadline_s=30)
    assert p["ok"] is True and p["devices"] == ["TPU v5 lite0"]


def test_wait_for_tpu_gives_up_within_window(monkeypatch):
    bench = _bench()
    calls = []

    def fake_probe(*a, **k):
        calls.append(1)
        return {"ok": False, "mode": "error", "rc": 1, "detail": "down"}

    monkeypatch.setattr(bench, "probe_tpu", fake_probe)
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    p = bench.wait_for_tpu(window_s=1, interval_s=100)
    assert p["ok"] is False and len(calls) == 1  # window too small to retry
    assert p["attempts"] == ["error"]


def test_give_up_line_parses_and_banks(monkeypatch, tmp_path, capsys):
    import json

    bench = _bench()
    monkeypatch.setattr(bench, "LOCAL_RECORD", str(tmp_path / "b.json"))
    bench.give_up({"ok": False, "mode": "timeout", "attempts": ["timeout"],
                   "waited_s": 120.0})
    line = capsys.readouterr().out.strip()
    d = json.loads(line)
    # The driver's BENCH_r{N}.json must always parse: the give-up line keeps
    # the exact headline schema with value 0.
    assert d["metric"] == "mrays_per_sec_per_chip"
    assert d["value"] == 0.0 and d["vs_baseline"] == 0.0
    assert d["error"] == "tpu_unavailable"
    assert d["probe"]["mode"] == "timeout"
    rec = json.load(open(tmp_path / "b.json"))
    assert rec[0]["error"] == "tpu_unavailable" and rec[0]["timestamp"]


def test_append_local_record_accumulates(monkeypatch, tmp_path):
    import json

    bench = _bench()
    monkeypatch.setattr(bench, "LOCAL_RECORD", str(tmp_path / "b.json"))
    bench.append_local_record({"headline": {"value": 3.7}})
    bench.append_local_record({"headline": {"value": 4.0}})
    rec = json.load(open(tmp_path / "b.json"))
    assert [e["headline"]["value"] for e in rec] == [3.7, 4.0]
    assert all(e["timestamp"] for e in rec)
    # A corrupt record never blocks banking a new measurement.
    (tmp_path / "b.json").write_text("{corrupt")
    bench.append_local_record({"headline": {"value": 4.1}})
    rec = json.load(open(tmp_path / "b.json"))
    assert len(rec) == 1 and rec[0]["headline"]["value"] == 4.1


def test_safe_isolates_datapoint_failure():
    bench = _bench()

    def bad():
        raise RuntimeError("tunnel dropped")

    assert bench.safe("x", bad) is None
    assert bench.safe("y", lambda a, b: a + b, 2, 3) == 5
