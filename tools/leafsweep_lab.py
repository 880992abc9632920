"""Sweep bake leaf_size and kernel DRAIN_AT for the sub-packet kernel.

Leaf M-T is the measured floor of the closest pass (ARCHITECTURE.md): the
static leaf loop always runs `leaf_size` Moller-Trumbore iterations per
drained block, and atrium leaves average 6.2/8 real tris (22% padding
waste). Smaller leaves cut padding + per-visit cost but deepen the tree
(more internal steps, more blocks); DRAIN_AT trades best-t freshness
against batched-drain efficiency. This measures the production kernel
end-to-end on the production bounce-1 wavefront + a production-shaped
NEE occlusion pass.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from raytracer_tpu.ops import pallas_subpacket as sp  # noqa: E402

WIDTH, HEIGHT = 1920, 1080
REPS = 3


def measure(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return out, (time.perf_counter() - t0) / REPS


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_atrium(300_000)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}

    combos = {8: (4, 2, 6, 8), 12: (4, 6), 16: (4, 6, 8)}
    ref_tri = None
    for leaf_size in (8, 12, 16):
        cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                           accel="pallas", bvh_leaf_size=leaf_size)
        n = cfg.num_pixels
        ds, bvh = bake_scene(scene, leaf_size=leaf_size)
        state1 = sl_make_state1(ds, ubo, cfg, n)
        state1s = jax.jit(lambda s, d: wf._sort_wavefront(s, d))(state1, ds)
        jax.block_until_ready(state1s.origin)

        # NEE-shaped shadow rays: bounce-0 hit origins toward the light.
        lc = ds.light_center[0]
        to_l = lc[None, :] - state1s.origin
        dist = jnp.linalg.norm(to_l, axis=1)
        sdir = to_l / jnp.maximum(dist, 1e-6)[:, None]

        for drain_at in combos[leaf_size]:
            sp.DRAIN_AT = drain_at
            sp._run_closest.clear_cache()
            sp._run_occlusion.clear_cache()

            fn_c = jax.jit(lambda o, d, s: sp.intersect_bvh_subpacket(
                o, d, s, 1e-3, 1e4))
            rec, dt_c = measure(fn_c, state1s.origin, state1s.direction, ds)

            fn_o = jax.jit(lambda s, o, d, t, sk, a: wf._occluded(
                s, o, d, t, sk, cfg, a))
            occ, dt_o = measure(
                fn_o, ds, state1s.origin, sdir, dist * 0.999,
                jnp.full((n,), -1, jnp.int32), state1s.alive)

            perm = np.asarray(bvh.tri_order)
            tri = np.asarray(rec.tri)
            gtri = np.where(tri >= 0, perm[np.clip(tri, 0, len(perm) - 1)],
                            -1)
            tag = ""
            if leaf_size == 8 and drain_at == 4:
                ref_tri = gtri
            elif ref_tri is not None:
                # Different trees hit the same surfaces; global tri ids can
                # differ only via coplanar ties — report the count.
                tag = f" (tri-diff {int((gtri != ref_tri).sum())})"
            print(f"leaf{leaf_size:3d} drain{drain_at:2d}: "
                  f"closest {dt_c*1e3:7.1f} ms  occl {dt_o*1e3:7.1f} ms  "
                  f"nodes {bvh.num_nodes}{tag}", flush=True)


if __name__ == "__main__":
    main()
