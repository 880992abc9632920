"""1M-tri atrium: single-part (108.7 MB resident, leaf 16) vs 2-part bake.

With leaf_size 16 the 1M-tri packed arrays fit the kernels' 112 MB Mosaic
VMEM limit in ONE part (89k leaf rows x 1 KB + 44k quad rows x 512 B =
108.7 MB). This measures whether the single-part frame (a) compiles at that
occupancy and (b) how much the 2-part path's sequential-pass tax costs,
end-to-end on the production frame. Images must match exactly (parts only
change traversal order of the same global SAH tree's subtrees... the 2-part
bake re-roots subtrees, so leaf visit ORDER differs — radiance must still
match to fp tolerance via identical winner semantics; report max delta).

Run: python -u tools/r3_1m_lab.py
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
    scene = create_benchmark_atrium(1_000_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
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
    for label, budget in (("2-part", 90 * 1024 * 1024), ("single", None)):
        ds, _ = bake_scene(scene, leaf_size=cfg.bvh_leaf_size,
                           pallas_budget_bytes=budget)
        print(f"{label}: parts {ds.num_parts}, "
              f"vmem/pass {ds.pallas_vmem_bytes/2**20:.1f} MB", flush=True)
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
        images[label] = np.asarray(rad)
        print(f"{label}: median frame {dt:.3f}s  "
              f"{total/len(times)/dt/1e6:6.2f} Mrays/s  "
              f"times {[round(t,2) for t in times]}", flush=True)

    a, b = images["2-part"], images["single"]
    diff = np.abs(a - b)
    print(f"image delta: max {diff.max():.3e}  mean {diff.mean():.3e}  "
          f"pixels changed {(diff.max(axis=-1) > 1e-6).sum()} "
          f"of {a.shape[0]}", flush=True)


if __name__ == "__main__":
    main()
