"""Benchmark: ray throughput (Mrays/s) on the largest available scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 200 (the BASELINE.json target of >=200 Mrays/s/chip
on TPU v5e; the reference itself publishes no numbers — BASELINE.md).

Workload mirrors the reference's headline config: 1080p, 1 path/pixel/frame,
MAX_DEPTH=3 + NEE shadow rays, progressive accumulation. Scene preference:
conference.glb (~300k tris — Sponza's .bin is absent from the reference
checkout, see BASELINE.md) with cornell_box.json as fallback. Ray counts are
measured (alive rays per bounce + shadow rays), not estimated.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REF = "/root/reference"
SCENES = [
    os.path.join(REF, "models/conference.glb"),
    os.path.join(REF, "scenes/cornell_box.json"),
]

WIDTH, HEIGHT = 1920, 1080
WARMUP_FRAMES = 2
BENCH_FRAMES = 8
BASELINE_MRAYS = 200.0


def pick_scene():
    for path in SCENES:
        if os.path.exists(path):
            return path
    raise SystemExit("no benchmark scene available")


def frame_camera(scene):
    """Aim at the scene bbox center from a diagonal, far enough to frame it."""
    from raytracer_tpu.ops.camera import Camera

    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for obj in scene.objects:
        mesh = scene.meshes[obj.mesh_index]
        m = obj.transform.model_matrix
        w = mesh.positions @ m[:3, :3].T + m[:3, 3]
        lo = np.minimum(lo, w.min(axis=0))
        hi = np.maximum(hi, w.max(axis=0))
    center = (lo + hi) / 2
    extent = float(np.linalg.norm(hi - lo))
    pos = center + np.asarray([0.35, 0.25, -0.9]) * extent * 0.6
    return Camera.create(position=pos, aspect=WIDTH / HEIGHT, target=center)


def main():
    from raytracer_tpu.integrator.wavefront import render_wavefront
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.scene.loaders import load_scene
    from raytracer_tpu.utils.config import RenderConfig

    scene_path = pick_scene()
    scene = load_scene(scene_path)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3)
    t0 = time.perf_counter()
    ds, _ = bake_scene(scene, leaf_size=cfg.bvh_leaf_size)
    bake_s = time.perf_counter() - t0

    cam = frame_camera(scene)
    mats = cam.matrices()
    ubo = {
        "inverse_view": jnp.asarray(mats["inverse_view"]),
        "inverse_proj": jnp.asarray(mats["inverse_proj"]),
    }

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(ds, ubo, frame, cfg):
        rad, stats = render_wavefront(ds, ubo, frame, cfg, with_stats=True)
        return rad, stats["total_rays"]

    # Warmup / compile.
    t0 = time.perf_counter()
    for f in range(WARMUP_FRAMES):
        rad, nrays = step(ds, ubo, jnp.uint32(f), cfg)
    jax.block_until_ready(rad)
    compile_s = time.perf_counter() - t0

    total_rays = 0
    t0 = time.perf_counter()
    for f in range(WARMUP_FRAMES, WARMUP_FRAMES + BENCH_FRAMES):
        rad, nrays = step(ds, ubo, jnp.uint32(f), cfg)
        total_rays += int(nrays)
    jax.block_until_ready(rad)
    elapsed = time.perf_counter() - t0

    mrays = total_rays / elapsed / 1e6
    spp_s = BENCH_FRAMES / elapsed
    result = {
        "metric": "mrays_per_sec_per_chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "scene": os.path.basename(scene_path),
                    "triangles": scene.num_triangles,
                    "resolution": f"{WIDTH}x{HEIGHT}",
                    "frames": BENCH_FRAMES,
                    "rays": total_rays,
                    "spp_per_sec": round(spp_s, 3),
                    "bake_s": round(bake_s, 2),
                    "compile_s": round(compile_s, 2),
                    "elapsed_s": round(elapsed, 3),
                    "device": str(jax.devices()[0]),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
