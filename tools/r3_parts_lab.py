"""Force the HEADLINE scene into K VMEM parts: does the part split keep
paying as extra free BVH levels?

tools/r3_1m_lab.py found the 2-part 1M bake FASTER than single-part: with
part-affinity-sorted wavefronts each kernel group is part-pure, so every
pass traverses a smaller re-rooted tree and foreign passes die at the root
slab. If that's general, splitting the 300k headline scene should shave
top-of-tree iterations too — the sort key's part prefix replaces the top
log2(K) levels. Costs: K sequential passes (per-pass pallas_call + HBM
part slice), boundary rays traversing >1 part, and a shorter morton tail
in the sort key beyond 2 parts.

Run: python -u tools/r3_parts_lab.py
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

    ref = None
    mb = 1024 * 1024
    for label, budget in (("1 part", None), ("2 parts", 18 * mb),
                          ("4 parts", 9 * mb), ("8 parts", 5 * mb)):
        ds, _ = bake_scene(scene, leaf_size=cfg.bvh_leaf_size,
                           pallas_budget_bytes=budget)
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
        img = np.asarray(rad)
        if ref is None:
            ref = img
            tag = ""
        else:
            d = np.abs(img - ref)
            tag = (f"  maxdiff {d.max():.2e} "
                   f"({(d.max(axis=-1) > 1e-6).sum()} px)")
        print(f"{label} (actual {ds.num_parts}): median {dt:.3f}s  "
              f"{total/len(times)/dt/1e6:5.2f} Mrays/s{tag}", flush=True)


if __name__ == "__main__":
    main()
