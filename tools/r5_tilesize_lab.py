"""Per-chip rate vs tile size on the REAL TPU (VERDICT r4 item 2).

BASELINE.md's chips-to-target arithmetic assumed per-chip Mrays/s is
constant in tile size, while the repo's own preview datapoint (2.44-2.50
Mrays/s at 512x288 vs 3.90 at 1080p, same scene) contradicts that. This lab
measures the actual curve: the headline workload (300k-tri atrium, 1080p
camera, MAX_DEPTH=3 + NEE — bench.py's exact config) with the wavefront
restricted to 1/D of the pixels for D = 1..64, i.e. exactly the per-chip
tile of a D-chip pixel-DP mesh (parallel/sharding.py).

Three tile shapes per D:
  - strided  : every D-th pixel (identical content distribution at every D —
               isolates the wavefront-WIDTH effect from content effects)
  - contig   : a contiguous center tile (what P(AXIS) sharding actually
               hands a chip — content + width effects together)
  - batched  : the D=16/64 strided tile with S jittered samples fused into
               ONE launch via repeated pixel ids + a per-lane frame vector
               (render_wavefront(pixel_indices=...)) — the mitigation that
               restores wavefront width on small tiles. Distinct from
               tools/sppbatch_lab.py's union-shrinkage question: batching
               here amortizes fixed overheads by widening the wavefront.

All (D, S) combos are sized to share 7 distinct lane counts, so the lab
compiles 7 programs total. Writes TILESIZE_LAB.json at the repo root.

Run: tools/tpu_run.sh tools/r5_tilesize_lab.py 3000 1
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import WIDTH, HEIGHT, TARGET_TRIS, drain, log, wait_for_tpu

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "TILESIZE_LAB.json")

WARMUP = 2
FRAMES = 4  # timed launches per datapoint (outlier-guarded)


def main():
    probe = wait_for_tpu()
    if not probe["ok"]:
        log(f"TPU unavailable: {probe}")
        sys.exit(1)
    log(f"TPU probe ok: {probe.get('devices')}")

    from raytracer_tpu.integrator.wavefront import render_wavefront
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    scene = create_benchmark_atrium(TARGET_TRIS)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    jax.block_until_ready(jax.device_put(np.zeros(1, np.float32)))
    ds, _ = bake_scene(scene, leaf_size=cfg.bvh_leaf_size)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(ds, ubo, idx, frames, cfg):
        rad, stats = render_wavefront(
            ds, ubo, frames, cfg, pixel_indices=idx, with_stats=True)
        return rad, stats["total_rays"]

    def measure(label, make_idx, make_frames, lanes):
        """Warm up + time FRAMES launches of one (tile, batch) shape."""
        t0 = time.perf_counter()
        for f in range(WARMUP):
            rad, nrays = step(ds, ubo, make_idx(), make_frames(f), cfg)
            drain(rad)
        warm_s = time.perf_counter() - t0
        total = 0
        times = []
        for f in range(WARMUP, WARMUP + FRAMES):
            t0 = time.perf_counter()
            rad, nrays = step(ds, ubo, make_idx(), make_frames(f), cfg)
            drain(rad)
            times.append(time.perf_counter() - t0)
            total += int(nrays)
        ft = np.asarray(times)
        outlier = bool(ft.max() > 2.0 * np.median(ft))
        dt = float(ft.sum())
        entry = {
            "label": label,
            "lanes": int(lanes),
            "rays_per_launch": total // FRAMES,
            "mrays_per_sec": round(total / dt / 1e6, 3),
            "ms_per_launch": round(1e3 * dt / FRAMES, 1),
            "launch_times_s": [round(t, 3) for t in times],
            "outlier_frames": outlier,
            "warmup_s": round(warm_s, 1),
        }
        log(json.dumps(entry))
        return entry

    results = {"workload": {
        "scene": "procedural_atrium", "triangles": scene.num_triangles,
        "resolution": f"{WIDTH}x{HEIGHT}", "max_depth": cfg.max_depth,
        "timed_launches": FRAMES,
        "device": str(jax.devices()[0]),
    }}

    # --- strided tiles: every D-th pixel, batch 1 -----------------------
    strided = []
    for d in (1, 2, 4, 8, 16, 32, 64):
        idx = jnp.arange(0, n, d, dtype=jnp.uint32)
        lanes = idx.shape[0]

        def mk_frames(f, lanes=lanes):
            return jnp.full((lanes,), f, jnp.uint32)

        strided.append(measure(
            f"strided_1/{d}", lambda idx=idx: idx, mk_frames, lanes))
        strided[-1]["devices"] = d
    results["strided"] = strided

    # --- contiguous center tiles (the real P(AXIS) shard shape) ---------
    contig = []
    for d in (8, 64):
        lanes = n // d
        start = (n // 2 // lanes) * lanes  # the tile containing the center
        idx = jnp.arange(start, start + lanes, dtype=jnp.uint32)

        def mk_frames(f, lanes=lanes):
            return jnp.full((lanes,), f, jnp.uint32)

        contig.append(measure(
            f"contig_1/{d}", lambda idx=idx: idx, mk_frames, lanes))
        contig[-1]["devices"] = d
    results["contiguous_center"] = contig

    # --- spp batching: S samples of one strided tile per launch ---------
    batched = []
    for d, s_list in ((64, (4, 16, 64)), (16, (4, 16))):
        base = jnp.arange(0, n, d, dtype=jnp.uint32)
        tile = base.shape[0]
        for s in s_list:
            idx = jnp.tile(base, s)
            lanes = idx.shape[0]

            def mk_frames(f, tile=tile, s=s):
                # launch f covers frames f*s .. f*s+s-1 of the tile
                return jnp.repeat(
                    jnp.arange(s, dtype=jnp.uint32) + jnp.uint32(f * s),
                    tile)

            e = measure(f"batched_1/{d}_x{s}",
                        lambda idx=idx: idx, mk_frames, lanes)
            e["devices"] = d
            e["spp_batch"] = s
            batched.append(e)
    results["batched"] = batched

    # --- derived: slice throughput + chips-to-target --------------------
    full = strided[0]["mrays_per_sec"]
    for e in strided:
        e["rate_vs_full_wavefront"] = round(e["mrays_per_sec"] / full, 3)
        e["slice_mrays_per_sec"] = round(
            e["devices"] * e["mrays_per_sec"], 1)
    for e in contig:
        e["rate_vs_full_wavefront"] = round(e["mrays_per_sec"] / full, 3)
        e["slice_mrays_per_sec"] = round(
            e["devices"] * e["mrays_per_sec"], 1)
    for e in batched:
        e["rate_vs_full_wavefront"] = round(e["mrays_per_sec"] / full, 3)
        e["slice_mrays_per_sec"] = round(
            e["devices"] * e["mrays_per_sec"], 1)

    # chips-to-target from the measured strided curve: find the smallest D
    # (interpolating rate between measured points on log2(D)) with
    # D * rate(D) >= 200.
    ds_ = np.array([e["devices"] for e in strided], float)
    rates = np.array([e["mrays_per_sec"] for e in strided], float)
    target = None
    for d in range(1, 257):
        r = float(np.interp(np.log2(d), np.log2(ds_), rates))
        if d * r >= 200.0:
            target = {"chips": d, "per_chip_mrays": round(r, 2),
                      "slice_mrays": round(d * r, 1)}
            break
    results["chips_to_200mrays_measured"] = target
    results["note"] = (
        "strided isolates wavefront width (content identical at every D); "
        "contig is the real contiguous shard shape; batched fuses S "
        "progressive samples into one launch to restore width at small "
        "tiles (latency per sample-set rises by S, throughput is what is "
        "measured). Replaces BASELINE.md's 'per-chip rate constant in tile "
        "size' assumption with the measured curve."
    )
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}")
    print(json.dumps({"chips_to_200mrays_measured": target}))


if __name__ == "__main__":
    main()
