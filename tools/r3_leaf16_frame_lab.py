"""End-to-end headline frame: bake leaf_size 8 (production default) vs 16.

The 256-lane leaf sweep (tools/leafsweep_lab.py) showed leaf 16 winning the
standalone closest pass ~4-5% (547-557 ms vs 571-614) with occlusion
neutral — the latency-bound kernel trades cheap extra VPU M-T work for
~35% fewer quad iterations. This checks whether that survives the full
frame (3 closest passes + 3 occlusion passes + shade/sort), and what it
does to images (tie-breaks only: a different tree can pick a different
coplanar winner).

Run: python -u tools/r3_leaf16_frame_lab.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

WIDTH, HEIGHT = 1920, 1080
FRAMES = 5


def main():
    from raytracer_tpu.integrator.wavefront import render_wavefront
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    scene = create_benchmark_atrium(300_000)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(ds, ubo, frame, cfg):
        rad, stats = render_wavefront(ds, ubo, frame, cfg, with_stats=True)
        return rad, stats["total_rays"]

    images = {}
    for leaf in (8, 16):
        cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                           accel="pallas", bvh_leaf_size=leaf)
        ds, _ = bake_scene(scene, leaf_size=leaf)
        print(f"leaf {leaf}: vmem {ds.pallas_vmem_bytes/2**20:.1f} MB, "
              f"ptris {ds.ptris.shape}, qnodes {ds.qnodes.shape}",
              flush=True)
        for f in range(2):
            rad, nrays = step(ds, ubo, jnp.uint32(f), cfg)
            float(jnp.sum(rad))
        times = []
        total = 0
        for f in range(2, 2 + FRAMES):
            t0 = time.perf_counter()
            rad, nrays = step(ds, ubo, jnp.uint32(f), cfg)
            float(jnp.sum(rad))
            times.append(time.perf_counter() - t0)
            total += int(nrays)
        dt = np.median(times)
        images[leaf] = np.asarray(rad)
        print(f"leaf {leaf}: median frame {dt:.3f}s  "
              f"{total/len(times)/dt/1e6:6.2f} Mrays/s  "
              f"times {[round(t,2) for t in times]}", flush=True)

    a, b = images[8], images[16]
    diff = np.abs(a - b)
    print(f"image delta: max {diff.max():.3e}  mean {diff.mean():.3e}  "
          f"pixels changed {(diff.max(axis=-1) > 1e-6).sum()} "
          f"of {a.shape[0]}", flush=True)


if __name__ == "__main__":
    main()
