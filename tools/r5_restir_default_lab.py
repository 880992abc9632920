"""Pick the production ReSTIR reuse defaults from data (follow-up to
RESTIR_FLOOR_LAB.json), and nail the +6% atrium energy mechanism.

The floor lab showed the two round-5 bias fixes interact on the atrium:
final-visibility feedback removes the occluded-import darkening (good,
MSE 0.0738 -> 0.0697) but feedback+Z-count together COMPOUND a brightening
drift (energy 0.968 -> 1.136, MSE 0.158 and rising) — visibility-filtered
temporal reuse conditions the reservoir distribution on "visible here"
(brighter), and the Z-count removes the M-sum underweighting that was
accidentally offsetting it. The atrium is a 1-light scene; ReSTIR's home
turf is many lights, where zero-coverage neighbors (holding a different
light) are common and the Z-count should genuinely help. Measure, then
choose:

  part 1 (lightgrid, 64 lights): plain oracle; then old_default /
    feedback_only / fixed_default curves to 256 frames. The equal-time lab
    already measured old_default's floor there (0.00219 vs plain 0.00139).
  part 2 (atrium, radiance_clamp=1e6): plain 512f vs RIS-only 256f mean
    energy. If the ratio collapses to ~1.00 the constant +6% clamped-mode
    divergence is the clamp x estimator-shape interplay (plain's MIS
    estimator loses more highlight energy to the 5.0 clamp than ReSTIR's
    RIS-smoothed direct), not an RIS weighting bug.

Run: python -u tools/r5_restir_default_lab.py [--out RESTIR_DEFAULT_LAB.json]
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


def build(name):
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.config import RenderConfig

    scene, cam_pos, cam_target, width, height = scene_setup(name)
    ds, _ = bake_scene(scene)
    cam = Camera.create(position=cam_pos, aspect=width / height,
                        target=cam_target)
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    cfg = RenderConfig(width=width, height=height, accel="pallas")
    return ds, ubo, cfg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--oracle", type=int, default=1024)
    ap.add_argument("--out", default="RESTIR_DEFAULT_LAB.json")
    args = ap.parse_args()

    from raytracer_tpu.integrator.restir import render_frame_restir
    from raytracer_tpu.integrator.wavefront import accumulate, render_wavefront
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print(f"backend ready: {jax.devices()}", flush=True)

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

    out = {"what": __doc__.split("\n")[0], "device": str(jax.devices()[0])}

    # ---------- part 1: lightgrid reuse-variant curves ----------
    ds, ubo, cfg = build("lightgrid")
    n = cfg.num_pixels
    t0 = time.perf_counter()
    acc = jnp.zeros((n, 3), jnp.float32)
    for f in range(args.oracle):
        acc = plain_step(ds, ubo, acc, jnp.uint32(ORACLE_OFFSET + f),
                         jnp.uint32(f), cfg)
    oracle = np.asarray(acc, np.float64)
    print(f"[lightgrid] oracle {args.oracle} spp in "
          f"{time.perf_counter()-t0:.1f}s (mean {oracle.mean():.5f})",
          flush=True)

    base = cfg.replace(use_restir=True)
    variants = {
        "old_default": base.replace(restir_final_visibility_feedback=False,
                                    restir_unbiased_spatial=False),
        "feedback_only": base.replace(restir_final_visibility_feedback=True,
                                      restir_unbiased_spatial=False),
        "fixed_default": base.replace(restir_final_visibility_feedback=True,
                                      restir_unbiased_spatial=True),
        "zcount_only": base.replace(restir_final_visibility_feedback=False,
                                    restir_unbiased_spatial=True),
    }
    cps = checkpoints(args.frames)
    part1 = {"oracle_frames": args.oracle, "oracle_mean": float(oracle.mean()),
             "variants": {}}
    for name, vcfg in variants.items():
        acc = jnp.zeros((n, 3), jnp.float32)
        res = None
        curve = []
        t0 = time.perf_counter()
        for f in range(args.frames):
            acc, res = restir_step(ds, ubo, acc, res, jnp.uint32(f), vcfg)
            if f + 1 in cps:
                img = np.asarray(acc, np.float64)
                err = img - oracle
                curve.append({"frames": f + 1,
                              "mse": float(np.mean(err * err)),
                              "energy_ratio": round(
                                  float(img.mean() / oracle.mean()), 4)})
        entry = {"wall_s": round(time.perf_counter() - t0, 1),
                 "curve_4pt": [c for c in curve
                               if c["frames"] in (1, 16, 66, args.frames)],
                 "final_mse": curve[-1]["mse"],
                 "final_energy_ratio": curve[-1]["energy_ratio"]}
        part1["variants"][name] = {**entry, "curve": curve}
        print(f"[lightgrid:{name}] {json.dumps(entry)}", flush=True)
    out["lightgrid"] = part1

    # ---------- part 2: atrium unclamped energy A/B ----------
    ds, ubo, cfg = build("atrium")
    n = cfg.num_pixels
    NOCLAMP = 1e6
    cfgu = cfg.replace(radiance_clamp=NOCLAMP)
    t0 = time.perf_counter()
    acc = jnp.zeros((n, 3), jnp.float32)
    for f in range(512):
        acc = plain_step(ds, ubo, acc, jnp.uint32(ORACLE_OFFSET + f),
                         jnp.uint32(f), cfgu)
    plain_u = np.asarray(acc, np.float64)
    print(f"[atrium] unclamped plain 512 spp in "
          f"{time.perf_counter()-t0:.1f}s (mean {plain_u.mean():.5f})",
          flush=True)
    ris_u_cfg = cfgu.replace(use_restir=True, restir_spatial_neighbors=0)
    acc = jnp.zeros((n, 3), jnp.float32)
    t0 = time.perf_counter()
    for f in range(args.frames):
        acc = restir_step_no_temporal(ds, ubo, acc, jnp.uint32(f), ris_u_cfg)
    ris_u = np.asarray(acc, np.float64)
    print(f"[atrium] unclamped RIS-only {args.frames} spp in "
          f"{time.perf_counter()-t0:.1f}s (mean {ris_u.mean():.5f})",
          flush=True)
    out["atrium_unclamped"] = {
        "radiance_clamp": NOCLAMP,
        "plain_frames": 512, "plain_mean": float(plain_u.mean()),
        "ris_only_frames": args.frames, "ris_only_mean": float(ris_u.mean()),
        "energy_ratio": round(float(ris_u.mean() / plain_u.mean()), 4),
        "clamped_reference_ratio":
            "RESTIR_FLOOR_LAB.json ris_only final_energy_ratio 1.060",
    }

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
