"""Fire-on-return banking pipeline for TPU tunnel outages.

The axon tunnel can be down for hours (hang or UNAVAILABLE at dial);
round 3's entire TPU evidence chain was stranded because nothing was armed
to fire when it came back (VERDICT r3, next-round #2). This script:

  1. probes availability in a bounded, killable subprocess every few
     minutes (a hung dial cannot wedge this process),
  2. the moment a probe succeeds, runs the banking queue in order, each
     step bounded by its own timeout and failure-isolated:
       - bench.py            (headline + conference + 1M + ReSTIR + preview
                              + warm-start; appends BENCH_LOCAL.json and
                              refreshes TPU_SMOKE.json)
       - interactive_session --assert-interactive  (<1 s per-edit gate,
                              incl. the post-stable-bake object add)
       - r3_adaptive_lab.py  (adaptive frame-time decay vs plain)
       - r4_grid_lab.py      (two-level grid/DDA traversal lab, if present)
  3. writes BANKED_r04.json at the repo root with per-step rc/duration/
     output tails, then exits.

Run detached:  python -u tools/bank_on_return.py [--max-wait-h H]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BANKED_r04.json")
PROBE_DEADLINE_S = 120
PROBE_EVERY_S = 240

QUEUE = [
    ("bench", [sys.executable, "-u", "bench.py"], 5400),
    ("interactive_gate",
     [sys.executable, "-u", "examples/interactive_session.py",
      "--assert-interactive"], 2400),
    ("interactive_1080p",
     [sys.executable, "-u", "examples/interactive_session.py",
      "--1080p"], 2400),
    ("adaptive_lab",
     [sys.executable, "-u", "tools/r3_adaptive_lab.py"], 3600),
    ("fullres_gate",
     [sys.executable, "-u", "tools/fullres_gate_tpu.py"], 1800),
    # The grid/DDA question was decided on CPU alone (tools/r4_grid_proxy.py,
    # GRID_LAB.json: 8.5-18x the BVH's row iterations — negative without a
    # TPU microbench), so no grid step is queued here.
]


def log(msg):
    print(f"[bank {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe() -> dict:
    """bench.py's bounded subprocess probe — ONE implementation (incl. the
    cpu_fallback rejection: jax silently landing on the CPU backend must
    not fire a banking run that records CPU rates)."""
    sys.path.insert(0, REPO)
    from bench import probe_tpu

    return probe_tpu(deadline_s=PROBE_DEADLINE_S)


def run_step(name, cmd, timeout_s) -> dict:
    if cmd[2].endswith(".py") and not os.path.exists(
            os.path.join(REPO, cmd[2])):
        return {"skipped": "script not present"}
    log(f"step {name}: {' '.join(cmd[1:])}")
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout_s,
        )
        rc = proc.returncode
        out, err = proc.stdout, proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = (e.stdout or b"").decode("utf-8", "replace") \
            if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = (e.stderr or b"").decode("utf-8", "replace") \
            if isinstance(e.stderr, bytes) else (e.stderr or "")
    dt = round(time.perf_counter() - t0, 1)
    log(f"step {name}: rc={rc} in {dt}s")
    return {
        "rc": rc,
        "seconds": dt,
        "stdout_tail": out.strip().splitlines()[-12:],
        "stderr_tail": err.strip().splitlines()[-12:],
    }


def main():
    max_wait_h = 11.0
    if "--max-wait-h" in sys.argv:
        max_wait_h = float(sys.argv[sys.argv.index("--max-wait-h") + 1])
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        p = probe()
        if p["ok"]:
            log(f"TPU back after {attempt} probes "
                f"({(time.time() - t0) / 60:.0f} min): {p['devices']}")
            break
        if time.time() - t0 > max_wait_h * 3600:
            log(f"giving up after {max_wait_h}h; tunnel still down")
            with open(OUT, "w") as f:
                json.dump({"ok": False, "reason": "tunnel never returned",
                           "waited_h": max_wait_h,
                           "probes": attempt}, f, indent=1)
            return 1
        log(f"probe {attempt}: down ({p.get('mode')}); next in "
            f"{PROBE_EVERY_S}s")
        time.sleep(PROBE_EVERY_S)

    results = {"ok": True, "fired_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
               "probes_until_return": attempt, "steps": {}}
    for name, cmd, timeout_s in QUEUE:
        results["steps"][name] = run_step(name, cmd, timeout_s)
        with open(OUT, "w") as f:  # persist progress after every step
            json.dump(results, f, indent=1)
    log(f"banking complete -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
