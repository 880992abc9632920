"""ReSTIR DI vs plain NEE at equal wall-clock (VERDICT r4 item 5).

The question the feature has to answer: ReSTIR costs ~1.5x per progressive
frame (BENCH_r04: 3.65 s vs 2.45 s at 1080p) — does its variance reduction
beat that overhead at equal TIME, and where? Protocol, per scene:

  1. Oracle: plain NEE accumulated for ORACLE_FRAMES samples drawn from a
     DISJOINT frame-index range (offset 1<<20) so the oracle shares no
     samples with either measured run.
  2. Plain run: K progressive frames, per-frame wall time recorded
     (block_until_ready each frame), accumulation snapshotted at ~sqrt(2)-
     geometric checkpoints.
  3. ReSTIR run: same, with the production config defaults
     (8 initial candidates, initial visibility, temporal reuse M<=128,
     4 spatial taps radius 16 — utils/config.py).
  4. MSE of every snapshot vs the oracle -> error-vs-wall-clock curves;
     the summary interpolates both curves onto a shared time grid and
     reports the MSE ratio (plain/restir; >1 means ReSTIR wins).

Scenes span the light-count regimes: cornell (1 light — NEE's happy case),
atrium 300k tris (1 light + heavy occlusion), hall (2 lights, corridors),
lightgrid (64 colored panels over an occluder field — the many-light
regime the reference's restir scaffolding targets,
shaders/restir/restir_structs.glsl; RIS should win here if anywhere).

ReSTIR estimates the same integral but is biased (visibility reuse +
M-sum spatial combination, the paper's real-time variant), so its curve
plateaus at a bias floor; the final-checkpoint MSE IS that floor estimate
and is reported per scene.

Run: python -u tools/r5_restir_equaltime_lab.py [--scenes a,b,...]
        [--frames K] [--oracle-frames N] [--out RESTIR_EQUALTIME.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ORACLE_OFFSET = 1 << 20  # disjoint sample streams for the oracle


def checkpoints(k: int) -> list[int]:
    """~sqrt(2)-geometric frame counts up to k (inclusive)."""
    pts, f = [], 1
    while f < k:
        pts.append(f)
        f = max(f + 1, int(round(f * np.sqrt(2.0))))
    pts.append(k)
    return pts


def scene_setup(name: str):
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import (
        create_benchmark_atrium,
        create_benchmark_hall,
        create_benchmark_lightgrid,
    )
    from raytracer_tpu.scene.model import create_cornell_box

    if name == "cornell":
        return (create_cornell_box(), (0.0, 1.0, 3.2), (0.0, 1.0, 0.0),
                256, 256)
    if name == "atrium":
        return (create_benchmark_atrium(300_000), (-16.0, 6.5, -7.5),
                (8.0, 3.0, 4.0), 512, 288)
    if name == "hall":
        return (create_benchmark_hall(300_000), (-27.0, 6.0, 0.0),
                (30.0, 4.5, 0.0), 512, 288)
    if name == "lightgrid":
        return (create_benchmark_lightgrid(), (0.0, 4.2, -10.5),
                (0.0, 1.2, 1.5), 512, 288)
    raise SystemExit(f"unknown scene {name}")


def run_scene(name: str, frames: int, oracle_frames: int) -> dict:
    from raytracer_tpu.integrator.restir import Reservoir, render_frame_restir
    from raytracer_tpu.integrator.wavefront import accumulate, render_wavefront
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.utils.config import RenderConfig

    scene, cam_pos, cam_target, width, height = scene_setup(name)
    ds, _ = bake_scene(scene)
    cam = Camera.create(position=cam_pos, aspect=width / height,
                        target=cam_target)
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    cfg = RenderConfig(width=width, height=height, accel="pallas")
    cfg_r = cfg.replace(use_restir=True)
    n = cfg.num_pixels

    @functools.partial(jax.jit, static_argnames=("scfg",), donate_argnums=(2,))
    def plain_step(ds, ubo, accum, frame, local, scfg):
        rad = render_wavefront(ds, ubo, frame, scfg)
        return accumulate(accum, rad, local)

    @functools.partial(jax.jit, static_argnames=("scfg",),
                       donate_argnums=(2, 3))
    def restir_step(ds, ubo, accum, res, frame, scfg):
        return render_frame_restir(ds, ubo, accum, res, frame, scfg)

    # --- Oracle (disjoint frame-index range; timed for the log only).
    t0 = time.perf_counter()
    acc = jnp.zeros((n, 3), jnp.float32)
    for f in range(oracle_frames):
        acc = plain_step(ds, ubo, acc, jnp.uint32(ORACLE_OFFSET + f),
                         jnp.uint32(f), cfg)
    oracle = np.asarray(jax.block_until_ready(acc), np.float64)
    t_oracle = time.perf_counter() - t0
    print(f"[{name}] oracle {oracle_frames} spp in {t_oracle:.1f}s "
          f"(mean {oracle.mean():.4f})", flush=True)

    cps = checkpoints(frames)

    def timed_run(step_fn, state_init, label):
        """Progressive frames with per-frame sync; snapshot at
        checkpoints. Returns (times list, snaps {frame: image})."""
        # Warm the program on frame 1's shape (same compiled program for
        # every frame; result discarded).
        state = state_init()
        state = step_fn(state, 0)
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        state = state_init()
        times, snaps = [], {}
        for f in range(frames):
            t0 = time.perf_counter()
            state = step_fn(state, f)
            jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
            times.append(time.perf_counter() - t0)
            if (f + 1) in cps:
                img = state[0] if isinstance(state, tuple) else state
                snaps[f + 1] = np.asarray(img, np.float64)
        print(f"[{name}] {label}: {sum(times):.1f}s for {frames} frames "
              f"(median {np.median(times)*1e3:.0f} ms)", flush=True)
        return times, snaps

    times_p, snaps_p = timed_run(
        lambda acc, f: plain_step(ds, ubo, acc, jnp.uint32(f),
                                  jnp.uint32(f), cfg),
        lambda: jnp.zeros((n, 3), jnp.float32), "plain")
    times_r, snaps_r = timed_run(
        lambda st, f: restir_step(ds, ubo, st[0], st[1], jnp.uint32(f),
                                  cfg_r),
        lambda: (jnp.zeros((n, 3), jnp.float32), Reservoir.empty(n)),
        "restir")

    def curve(times, snaps):
        cum = np.cumsum(times)
        return [{"frames": f, "wall_s": round(float(cum[f - 1]), 3),
                 "mse": float(((snaps[f] - oracle) ** 2).mean())}
                for f in cps]

    curve_p, curve_r = curve(times_p, snaps_p), curve(times_r, snaps_r)

    # Equal-time summary: interpolate log-MSE onto a shared time grid.
    def interp(curve_, t):
        ts = np.array([c["wall_s"] for c in curve_])
        ms = np.log(np.array([c["mse"] for c in curve_]) + 1e-30)
        return float(np.exp(np.interp(t, ts, ms)))

    t_max = min(curve_p[-1]["wall_s"], curve_r[-1]["wall_s"])
    grid = [round(t_max * s, 2) for s in (0.25, 0.5, 1.0)]
    equal_time = [
        {"wall_s": t, "mse_plain": interp(curve_p, t),
         "mse_restir": interp(curve_r, t),
         "plain_over_restir": round(interp(curve_p, t)
                                    / max(interp(curve_r, t), 1e-30), 3)}
        for t in grid
    ]
    # Real-time regime (ReSTIR's actual target): each early ReSTIR
    # checkpoint vs plain NEE interpolated at the SAME wall-clock instant.
    # ratio > 1 = ReSTIR ahead despite its ~1.45x per-frame cost.
    early_time = [
        {"restir_frames": c["frames"], "wall_s": c["wall_s"],
         "mse_restir": c["mse"],
         "mse_plain_same_t": interp(curve_p, c["wall_s"]),
         "plain_over_restir": round(
             interp(curve_p, c["wall_s"]) / max(c["mse"], 1e-30), 3)}
        for c in curve_r if c["frames"] <= 16
    ]
    # Crossover: the wall-clock instant where accumulating plain NEE
    # overtakes ReSTIR (its MSE decays 1/N forever; ReSTIR plateaus at its
    # bias floor). None within the run if ReSTIR still leads at t_max.
    cross = None
    for t in np.linspace(curve_r[0]["wall_s"], t_max, 200):
        if interp(curve_p, t) < interp(curve_r, t):
            cross = round(float(t), 2)
            break
    return {
        "resolution": f"{width}x{height}",
        "lights": int(sum(
            1 for o in scene.objects
            if scene.materials[o.material_index].emission_power > 0)),
        "triangles": int(scene.num_triangles),
        "oracle_frames": oracle_frames,
        "oracle_wall_s": round(t_oracle, 1),
        "frames": frames,
        "ms_per_frame_median": {
            "plain": round(float(np.median(times_p)) * 1e3, 1),
            "restir": round(float(np.median(times_r)) * 1e3, 1),
        },
        "curve_plain": curve_p,
        "curve_restir": curve_r,
        "equal_time": equal_time,
        "early_time": early_time,
        "plain_overtakes_at_s": cross,
        "restir_bias_floor_mse": curve_r[-1]["mse"],
        "plain_final_mse": curve_p[-1]["mse"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="cornell,atrium,hall,lightgrid")
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--oracle-frames", type=int, default=1024)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RESTIR_EQUALTIME.json"))
    args = ap.parse_args()

    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    # Touch the backend up front and say so: the axon tunnel's stall mode
    # (registration hangs for minutes after a recent process exit) is
    # detectable by this line not appearing — watchdogs key on it.
    print(f"backend ready: {jax.devices()}", flush=True)

    result = {
        "what": ("plain NEE vs ReSTIR DI error at equal wall-clock "
                 "(tools/r5_restir_equaltime_lab.py): MSE vs a "
                 "disjoint-stream plain-NEE oracle, production configs"),
        "device": str(jax.devices()[0]),
        "measured": time.strftime("%Y-%m-%dT%H:%M"),
        "scenes": {},
    }
    for name in args.scenes.split(","):
        result["scenes"][name] = run_scene(
            name.strip(), args.frames, args.oracle_frames)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"[{name}] written to {args.out}", flush=True)
    for name, s in result["scenes"].items():
        eq = s["equal_time"][-1]
        print(f"{name}: at {eq['wall_s']}s plain MSE {eq['mse_plain']:.3e} "
              f"vs restir {eq['mse_restir']:.3e} "
              f"(ratio {eq['plain_over_restir']})", flush=True)


if __name__ == "__main__":
    main()
