"""Two-phase t-capped closest-hit: trace with short t_max, retrace misses.

Pruning economics: slab tests cap t_far at the ray's t_max, so a short
phase-1 cap kills far subtrees for every ray; only rays that truly miss
within the cap pay a (resorted, mostly-dead) phase-2 full-range pass.
Exact — phase 2 restores any hit beyond the cap.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from raytracer_tpu.ops.pallas_traverse import intersect_bvh_pallas  # noqa
from raytracer_tpu.integrator.wavefront import _morton9, _sort_wavefront  # noqa

WIDTH, HEIGHT = 1920, 1080
REPS = 3


def measure(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out.t))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out.t))
    return out, (time.perf_counter() - t0) / REPS


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    ds, _ = bake_scene(scene, leaf_size=8)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    state1 = sl_make_state1(ds, ubo, cfg, n)
    st = jax.jit(lambda s, d: _sort_wavefront(s, d))(state1, ds)
    float(jnp.sum(st.origin))
    diag = float(jnp.linalg.norm(ds.scene_max - ds.scene_min))
    print(f"scene diag {diag:.1f}", flush=True)

    base_fn = jax.jit(lambda o, d, a: intersect_bvh_pallas(
        o, d, ds, 1e-3, 1e4, active_mask=a))
    rec0, dt0 = measure(base_fn, st.origin, st.direction, st.alive)
    print(f"baseline 1-phase: {dt0*1e3:8.1f} ms", flush=True)
    ref_tri = np.asarray(rec0.tri)
    ref_t = np.asarray(rec0.t)
    hitdist = ref_t[np.asarray(rec0.hit)]
    print(f"hit-dist percentiles p50={np.percentile(hitdist,50):.2f} "
          f"p90={np.percentile(hitdist,90):.2f} "
          f"p99={np.percentile(hitdist,99):.2f}", flush=True)

    for frac in (32, 16, 8, 4):
        cap = diag / frac

        @jax.jit
        def two_phase(o, d, a):
            rec1 = intersect_bvh_pallas(o, d, ds, 1e-3, cap, active_mask=a)
            miss = a & ~rec1.hit
            # Resort phase-2 rays (dead-last) so live lanes pack densely.
            extent = jnp.maximum(ds.scene_max - ds.scene_min, 1e-6)
            q = jnp.clip((o - ds.scene_min) / extent * 511.0, 0, 511.0
                         ).astype(jnp.uint32)
            m = (_morton9(q[:, 0]) | (_morton9(q[:, 1]) << 1)
                 | (_morton9(q[:, 2]) << 2))
            key = ((~miss).astype(jnp.uint32) << 31) | m
            perm = jnp.argsort(key)
            packed = jnp.concatenate([o, d], axis=1)[perm]
            rec2s = intersect_bvh_pallas(
                packed[:, 0:3], packed[:, 3:6], ds, 1e-3, 1e4,
                active_mask=miss[perm],
            )
            inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(n))
            t2 = rec2s.t[inv]
            tri2 = rec2s.tri[inv]
            u2 = rec2s.u[inv]
            v2 = rec2s.v[inv]
            hit2 = rec2s.hit[inv]
            return (
                jnp.where(rec1.hit, rec1.t, t2),
                jnp.where(rec1.hit, rec1.tri, tri2),
                jnp.where(rec1.hit, rec1.hit, hit2),
                jnp.sum(miss),
            )

        out, dt = measure(two_phase, st.origin, st.direction, st.alive)
        t, tri, hit, nmiss = out
        mism = (np.asarray(tri) != ref_tri) & ~np.isclose(
            np.asarray(t), ref_t, rtol=1e-5)
        print(f"cap diag/{frac:2d} ({cap:5.1f}): {dt*1e3:8.1f} ms  "
              f"phase2 rays {int(nmiss)} ({100*int(nmiss)/n:.0f}%)  "
              f"mismatches {int(mism.sum())}", flush=True)


if __name__ == "__main__":
    main()
