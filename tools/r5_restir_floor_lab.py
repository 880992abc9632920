"""Does fixing the reuse bias lower the ReSTIR plateau? (follow-up to
RESTIR_BIAS_DIAG.json).

The bias diag showed the atrium ReSTIR error at 128 frames is NOT mostly a
mean-energy shift, and that even RIS-only (no reuse, unbiased) still reads
0.065 MSE there — so the measured "floor" mixes two things:

  (a) variance: ReSTIR DI area-samples the big skylight through narrow GGX
      lobes on the metal/glossy columns — high per-frame variance that
      decays 1/N (RIS-only should show the decay);
  (b) reuse bias: the M-sum spatial combiner + occluded spatial imports
      persisting through temporal reuse — a true plateau.

This lab separates them by measuring MSE vs the oracle at geometric frame
checkpoints for five configs:

  old_default    - round-4 behavior (biased M-sum, no final-vis feedback)
  feedback_only  - + restir_final_visibility_feedback
  zcount_only    - + restir_unbiased_spatial (Alg.-6 Z-count)
  fixed_default  - both (the new production default)
  ris_only       - no reuse at all (decay reference: pure variance)

A config whose curve keeps decaying has no plateau at this horizon; the gap
between its tail and ris_only's tail is reuse bias. Also records ms/frame so
the Z-count's extra per-tap evaluation cost is visible.

Run: python -u tools/r5_restir_floor_lab.py [--frames 256] [--oracle 1024]
        [--scene atrium] [--out RESTIR_FLOOR_LAB.json]
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

from r5_restir_equaltime_lab import ORACLE_OFFSET, checkpoints, scene_setup  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--oracle", type=int, default=1024)
    ap.add_argument("--scene", default="atrium")
    ap.add_argument("--out", default="RESTIR_FLOOR_LAB.json")
    args = ap.parse_args()

    from raytracer_tpu.integrator.restir import render_frame_restir
    from raytracer_tpu.integrator.wavefront import accumulate, render_wavefront
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    print(f"backend ready: {jax.devices()}", flush=True)

    scene, cam_pos, cam_target, width, height = scene_setup(args.scene)
    ds, _ = bake_scene(scene)
    cam = Camera.create(position=cam_pos, aspect=width / height,
                        target=cam_target)
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    cfg = RenderConfig(width=width, height=height, accel="pallas")
    n = cfg.num_pixels

    @functools.partial(jax.jit, static_argnames=("scfg",), donate_argnums=(2,))
    def plain_step(ds, ubo, accum, frame, local, scfg):
        rad = render_wavefront(ds, ubo, frame, scfg)
        return accumulate(accum, rad, local)

    @functools.partial(jax.jit, static_argnames=("scfg",),
                       donate_argnums=(2, 3))
    def restir_step(ds, ubo, accum, res, frame, scfg):
        return render_frame_restir(ds, ubo, accum, res, frame, scfg)

    @functools.partial(jax.jit, static_argnames=("scfg",), donate_argnums=(2,))
    def restir_step_no_temporal(ds, ubo, accum, frame, scfg):
        accum, _ = render_frame_restir(ds, ubo, accum, None, frame, scfg)
        return accum

    t0 = time.perf_counter()
    acc = jnp.zeros((n, 3), jnp.float32)
    for f in range(args.oracle):
        acc = plain_step(ds, ubo, acc, jnp.uint32(ORACLE_OFFSET + f),
                         jnp.uint32(f), cfg)
        if (f + 1) % 128 == 0:
            # Heartbeat sync: bounds the in-flight queue and makes a tunnel
            # stall visible in the log instead of one silent 10-min block.
            jax.block_until_ready(acc)
            print(f"oracle {f+1}/{args.oracle} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    oracle = np.asarray(jax.block_until_ready(acc), np.float64)
    print(f"oracle {args.oracle} spp in {time.perf_counter()-t0:.1f}s "
          f"(mean {oracle.mean():.5f})", flush=True)

    base = cfg.replace(use_restir=True)
    configs = {
        "old_default": base.replace(restir_final_visibility_feedback=False,
                                    restir_unbiased_spatial=False),
        "feedback_only": base.replace(restir_final_visibility_feedback=True,
                                      restir_unbiased_spatial=False),
        "zcount_only": base.replace(restir_final_visibility_feedback=False,
                                    restir_unbiased_spatial=True),
        "fixed_default": base,  # both on (the new production default)
        "ris_only": base.replace(restir_spatial_neighbors=0,
                                 restir_max_m=0),  # no reuse: pure variance
    }

    cps = checkpoints(args.frames)
    out = {"what": __doc__.split("\n")[0],
           "scene": args.scene, "frames": args.frames,
           "oracle_frames": args.oracle, "oracle_mean": float(oracle.mean()),
           "device": str(jax.devices()[0]),
           "configs": {}}
    for name, vcfg in configs.items():
        acc = jnp.zeros((n, 3), jnp.float32)
        res = None
        curve = []
        times = []
        no_temporal = name == "ris_only"
        for f in range(args.frames):
            fu = jnp.uint32(f)
            t0 = time.perf_counter()
            if no_temporal:
                acc = restir_step_no_temporal(ds, ubo, acc, fu, vcfg)
            else:
                acc, res = restir_step(ds, ubo, acc, res, fu, vcfg)
            jax.block_until_ready(acc)
            times.append(time.perf_counter() - t0)
            if f + 1 in cps:
                img = np.asarray(acc, np.float64)
                err = img - oracle
                curve.append({
                    "frames": f + 1,
                    "mse": float(np.mean(err * err)),
                    "energy_ratio": round(float(img.mean() / oracle.mean()),
                                          4),
                })
        entry = {
            "ms_per_frame_median": round(
                1000.0 * float(np.median(times[2:])), 1),
            "curve": curve,
            "final_mse": curve[-1]["mse"],
            "final_energy_ratio": curve[-1]["energy_ratio"],
        }
        out["configs"][name] = entry
        print(f"[{name}] {json.dumps(entry)}", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
