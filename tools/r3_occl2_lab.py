"""Reversed shadow rays: trace occlusion FROM the light TOWARD the surface.

Shadow rays all target the scene's light(s); traced forward their origins
scatter over every lit surface (packet unions ~ surface spread), but traced
REVERSED their origins cluster on the light's area — the same shape as
primary rays from a camera, which the kernel traces ~4x faster per ray than
bounce wavefronts (0.15 s vs 0.69 s per 2M rays). The tested segment is the
same up to which endpoint carries the epsilon (forward: origin offset
+eps*normal, cap 0.999*dist; reversed: t_min=1e-3 at the light end, same
0.999 cap excluding the receiving surface), so the boolean can differ only
on razor-edge cases — counted here.

Variants (all vs production forward-sorted):
  rev-nosort   reversed rays in wavefront order
  rev-tsort    reversed rays sorted by (dir octant << 27 | target morton)
  rev-osort    reversed rays sorted by origin (light-point) morton — the
               production key applied to the reversed origins
Run: python -u tools/r3_occl2_lab.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

WIDTH, HEIGHT = 1920, 1080
REPS = 3
K = 2


def bench(name, fn, *args, k=K):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        outs = [fn(*args) for _ in range(k)]
        float(sum(jnp.sum(o) for o in outs))
    dt = (time.perf_counter() - t0) / (REPS * k)
    print(f"{name:46s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.integrator.wavefront import _morton9
    from raytracer_tpu.ops import rng
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.ops.math3d import dot_k, length, normalize
    from raytracer_tpu.ops.pallas_subpacket import occlusion_bvh_subpacket
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
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
    state1s = jax.jit(lambda s, d: wf._sort_wavefront(s, d))(state1, ds)
    hit1 = jax.jit(functools.partial(wf._trace, cfg=cfg))(
        ds, state1s.origin, state1s.direction, active=state1s.alive)
    lane = state1s.alive & hit1.hit
    surf = jax.jit(wf.fetch_surface)(ds, hit1, state1s.direction, lane)
    float(jnp.sum(surf.world_pos))

    # Area-sample the (single) light per lane, like _sample_light does.
    @jax.jit
    def sample_l(seed, world_pos):
        r1, seed = rng.rnd(seed)
        r2, seed = rng.rnd(seed)
        trow = ds.light_tri_packed[
            jnp.clip((r1 * 2).astype(jnp.int32)
                     + ds.light_meta_packed[0, 0].astype(jnp.int32), 0,
                     ds.light_tri_packed.shape[0] - 1)
        ]
        v0 = trow[:, 0:3]
        e1 = trow[:, 3:6]
        e2 = trow[:, 6:9]
        sq = jnp.sqrt(r1)
        bu = 1.0 - sq
        bv = sq * (1.0 - r2)
        bw = sq * r2
        lpos = (bu[:, None] * v0 + bv[:, None] * (v0 + e1)
                + bw[:, None] * (v0 + e2))
        return lpos

    lpos = sample_l(state1s.seed, surf.world_pos)
    world_pos = surf.world_pos
    nrm = surf.world_nrm
    to_light = normalize(lpos - world_pos)
    eps = 0.001
    offset_from = world_pos + nrm * (eps * jnp.sign(dot_k(nrm, to_light)))
    sr = lpos - offset_from
    sr_dist = length(sr)
    sr_dir = sr / jnp.maximum(sr_dist, 1e-20)[:, None]
    active = lane & (sr_dist > 0.0)
    t_max = sr_dist * 0.999
    skip = jnp.full((n,), ds.light_object[0], jnp.int32)
    print(f"active shadow lanes: {int(jnp.sum(active))}/{n}", flush=True)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fwd(ds, o, d, t, s, a, cfg):
        return wf._occluded_pallas_sorted(ds, o, d, t, s, cfg, a)

    bench("forward production (pos-sorted)", fwd, ds, offset_from, sr_dir,
          t_max, skip, active, cfg)
    ref = fwd(ds, offset_from, sr_dir, t_max, skip, active, cfg)

    def rev_rays():
        return lpos, -sr_dir, t_max

    def occ_unsorted(o, d, t, s, a):
        t_eff = jnp.where(a, t, cfg.t_min)
        return occlusion_bvh_subpacket(
            o, d, cfg.t_min, t_eff, ds, s) & a

    @jax.jit
    def rev_nosort(o, d, t, s, a):
        return occ_unsorted(o, d, t, s, a)

    @jax.jit
    def rev_tsort(o, d, t, s, a, tgt):
        extent = jnp.maximum(ds.scene_max - ds.scene_min, 1e-6)
        q = jnp.clip((tgt - ds.scene_min) / extent * 511.0, 0.0,
                     511.0).astype(jnp.uint32)
        morton = (_morton9(q[:, 0]) | (_morton9(q[:, 1]) << 1)
                  | (_morton9(q[:, 2]) << 2))
        octant = ((d[:, 0] >= 0).astype(jnp.uint32)
                  | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
                  | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
        key = ((~a).astype(jnp.uint32) << 31) | (octant << 27) | morton
        perm = jnp.argsort(key)
        t_eff = jnp.where(a, t, cfg.t_min)
        packed = jnp.concatenate(
            [o, d, t_eff[:, None], s.astype(jnp.float32)[:, None]], axis=1
        )[perm]
        occ_s = occlusion_bvh_subpacket(
            packed[:, 0:3], packed[:, 3:6], cfg.t_min, packed[:, 6],
            ds, packed[:, 7].astype(jnp.int32))
        return jnp.zeros((n,), bool).at[perm].set(occ_s) & a

    @jax.jit
    def rev_osort(o, d, t, s, a):
        extent = jnp.maximum(ds.scene_max - ds.scene_min, 1e-6)
        q = jnp.clip((o - ds.scene_min) / extent * 511.0, 0.0,
                     511.0).astype(jnp.uint32)
        morton = (_morton9(q[:, 0]) | (_morton9(q[:, 1]) << 1)
                  | (_morton9(q[:, 2]) << 2))
        key = ((~a).astype(jnp.uint32) << 31) | morton
        perm = jnp.argsort(key)
        t_eff = jnp.where(a, t, cfg.t_min)
        packed = jnp.concatenate(
            [o, d, t_eff[:, None], s.astype(jnp.float32)[:, None]], axis=1
        )[perm]
        occ_s = occlusion_bvh_subpacket(
            packed[:, 0:3], packed[:, 3:6], cfg.t_min, packed[:, 6],
            ds, packed[:, 7].astype(jnp.int32))
        return jnp.zeros((n,), bool).at[perm].set(occ_s) & a

    ro, rd, rt = rev_rays()
    for name, fn, args in [
        ("rev-nosort", rev_nosort, (ro, rd, rt, skip, active)),
        ("rev-tsort (octant|target-morton)", rev_tsort,
         (ro, rd, rt, skip, active, world_pos)),
        ("rev-osort (light-point morton)", rev_osort,
         (ro, rd, rt, skip, active)),
    ]:
        bench(name, fn, *args)
        got = fn(*args)
        mism = int(jnp.sum(got != ref))
        print(f"    boolean diffs vs forward: {mism} "
              f"({mism/max(int(jnp.sum(active)),1)*100:.3f}% of active)",
              flush=True)


if __name__ == "__main__":
    main()
