"""Diagnose the atrium ReSTIR bias floor (RESTIR_EQUALTIME.json).

The equal-time lab measured a scene-dependent ReSTIR plateau: cornell's
floor equals the oracle-limited plain MSE (no measurable bias), but the
1-light atrium plateaus at MSE ~0.073 vs plain's 0.005 at the same
wall-clock. This lab attributes that floor to a mechanism by ablating the
reuse stages one at a time and decomposing the error:

  variants (all accumulated DIAG_FRAMES progressive samples):
    default          - production config (8 candidates, temporal M<=128,
                       4 spatial taps radius 16)
    no_spatial       - restir_spatial_neighbors=0 (temporal only)
    no_temporal      - prev_reservoir never fed back (spatial only)
    ris_only         - neither reuse stage (RIS + visibility only);
                       this estimator is unbiased, so its converged mean
                       is the energy reference
    m_cap_8          - default but restir_max_m=8 (does shrinking the
                       neighbor-M domination shrink the floor?)

  per variant, vs a disjoint-stream plain-NEE oracle:
    mse, mean-energy ratio (restir/oracle), bias-of-mean share of MSE
    (mean shift squared / mse), and the 5/50/95% signed relative error.

Run: python -u tools/r5_restir_bias_diag.py [--frames K] [--oracle N]
        [--scene atrium] [--out RESTIR_BIAS_DIAG.json]
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

from r5_restir_equaltime_lab import ORACLE_OFFSET, scene_setup  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--oracle", type=int, default=512)
    ap.add_argument("--scene", default="atrium")
    ap.add_argument("--out", default="RESTIR_BIAS_DIAG.json")
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
    oracle = np.asarray(jax.block_until_ready(acc), np.float64)
    print(f"oracle {args.oracle} spp in {time.perf_counter()-t0:.1f}s "
          f"(mean {oracle.mean():.5f})", flush=True)

    base = cfg.replace(use_restir=True)
    variants = {
        "default": base,
        "no_spatial": base.replace(restir_spatial_neighbors=0),
        "no_temporal": base,  # handled by never feeding the reservoir back
        "ris_only": base.replace(restir_spatial_neighbors=0),
        "m_cap_8": base.replace(restir_max_m=8),
    }

    def metrics(img: np.ndarray) -> dict:
        err = img - oracle
        mse = float(np.mean(err * err))
        mean_shift = img.mean() - oracle.mean()
        rel = (img.sum(-1) - oracle.sum(-1)) / np.maximum(
            oracle.sum(-1), 1e-3)
        q5, q50, q95 = np.percentile(rel, [5, 50, 95])
        return {
            "mse": mse,
            "mean": float(img.mean()),
            "energy_ratio_vs_oracle": round(float(img.mean() / oracle.mean()),
                                            4),
            "bias_of_mean_share_of_mse": round(
                float(mean_shift * mean_shift / max(mse, 1e-30)), 4),
            "rel_err_p5_p50_p95": [round(float(q5), 4), round(float(q50), 4),
                                   round(float(q95), 4)],
        }

    out = {"what": __doc__.split("\n")[0],
           "scene": args.scene, "frames": args.frames,
           "oracle_frames": args.oracle, "oracle_mean": float(oracle.mean()),
           "device": str(jax.devices()[0]),
           "variants": {}}
    for name, vcfg in variants.items():
        t0 = time.perf_counter()
        acc = jnp.zeros((n, 3), jnp.float32)
        res = None
        for f in range(args.frames):
            fu = jnp.uint32(f)
            if name == "no_temporal" or name == "ris_only":
                acc = restir_step_no_temporal(ds, ubo, acc, fu, vcfg)
            else:
                acc, res = restir_step(ds, ubo, acc, res, fu, vcfg)
        img = np.asarray(jax.block_until_ready(acc), np.float64)
        m = metrics(img)
        m["wall_s"] = round(time.perf_counter() - t0, 1)
        out["variants"][name] = m
        print(f"[{name}] {json.dumps(m)}", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
