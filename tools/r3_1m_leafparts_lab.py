"""1M-tri atrium: leaf_size x part-count sweep.

leaf 16 won the 300k headline (tools/leafsweep_lab.py at 256 lanes), but
the 1M tree is ~2x deeper and its 256-ray visit unions are larger at finer
geometry granularity — the iterations-vs-VPU trade may tip differently.
Bigger leaves also shrink the packed arrays' node share, changing where
the part cutter lands. Sweep leaf {16, 24, 32} x parts {forced-2, single}
on the production frame; images must match the leaf-16 2-part reference to
fp tolerance (leaf size changes traversal order, not winner semantics).

Run: python -u tools/r3_1m_leafparts_lab.py
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
    from raytracer_tpu.api import PALLAS_VMEM_BUDGET
    from raytracer_tpu.integrator.wavefront import render_wavefront
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    scene = create_benchmark_atrium(1_000_000)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}

    ref = None
    for leaf in (16, 24, 32):
        cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                           accel="pallas", bvh_leaf_size=leaf)
        for label, budget in (("2-part", PALLAS_VMEM_BUDGET),
                              ("single", None)):
            t0 = time.perf_counter()
            ds, _ = bake_scene(scene, leaf_size=leaf,
                               pallas_budget_bytes=budget)
            bake_s = time.perf_counter() - t0

            @functools.partial(jax.jit, static_argnames=("cfg",))
            def step(ds, ubo, frame, cfg):
                rad, stats = render_wavefront(ds, ubo, frame, cfg,
                                              with_stats=True)
                return rad, stats["total_rays"]

            try:
                for f in range(2):
                    rad, nrays = step(ds, ubo, jnp.uint32(f), cfg)
                    float(jnp.sum(rad))
            except Exception as e:
                print(f"leaf {leaf:2d} {label}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
                continue
            times = []
            total = 0
            for f in range(2, 2 + FRAMES):
                t0 = time.perf_counter()
                rad, nrays = step(ds, ubo, jnp.uint32(f), cfg)
                float(jnp.sum(rad))
                times.append(time.perf_counter() - t0)
                total += int(nrays)
            dt = float(np.median(times))
            img = np.asarray(rad)
            if ref is None:
                ref = img
                tag = "(reference)"
            else:
                d = np.abs(img - ref)
                tag = (f"maxdiff {d.max():.2e} "
                       f"({(d.max(axis=-1) > 1e-4).sum()} px > 1e-4)")
            print(f"leaf {leaf:2d} {label} (parts {ds.num_parts}, "
                  f"bake {bake_s:.1f}s): median {dt:.3f}s  "
                  f"{total/len(times)/dt/1e6:5.2f} Mrays/s  {tag}",
                  flush=True)


if __name__ == "__main__":
    main()
