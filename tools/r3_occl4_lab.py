"""Decompose the production NEE occlusion block at leaf 16 / 256 lanes.

profile_frame.py's stub-differencing puts the occlusion block at
~198 ms/bounce, but a direct timing of _occluded_pallas_sorted reads far
lower — either the machinery around the kernel grew, or the stub changes
XLA fusion and the differencing overstates the block. This times the real
pieces on the real bounce-1 shadow wavefront, amortizing K reps per
readback (the ~28 ms axon RTT would otherwise dominate):

  key      morton key + part prefix + argsort
  gather   [N,8] packed row gather by perm
  kernel   occlusion_bvh_subpacket on the pre-sorted rays
  scatter  inverse scatter + active mask
  whole    _occluded_pallas_sorted end-to-end (sum check)

Run: python -u tools/r3_occl4_lab.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from raytracer_tpu.integrator import wavefront as wf  # noqa: E402

WIDTH, HEIGHT = 1920, 1080
REPS = 8


def measure(fn, *args, reps=REPS):
    """Median-of-reps with one readback per rep, RTT-corrected by pairing:
    time (fn; readback) and subtract the measured bare-readback RTT."""
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return out, (time.perf_counter() - t0) / reps


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.ops.pallas_subpacket import occlusion_bvh_subpacket
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    ds, _ = bake_scene(scene, leaf_size=cfg.bvh_leaf_size)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    # RTT floor for honesty in the printout.
    tiny = jnp.zeros((8,), jnp.float32)
    _, rtt = measure(lambda x: x + 1.0, tiny)
    print(f"bare readback RTT: {rtt*1e3:6.1f} ms", flush=True)

    # Production-shaped bounce-0 shadow wavefront.
    state1 = sl_make_state1(ds, ubo, cfg, n)
    state1s = jax.jit(lambda s, d: wf._sort_wavefront(s, d))(state1, ds)
    hit1 = jax.jit(functools.partial(wf._trace, cfg=cfg))(
        ds, state1s.origin, state1s.direction, active=state1s.alive)
    lane = state1s.alive & hit1.hit
    surf = jax.jit(wf.fetch_surface)(ds, hit1, state1s.direction, lane)
    lc = ds.light_center[0]
    to_l = lc[None, :] - surf.world_pos
    dist = jnp.sqrt(jnp.sum(to_l * to_l, axis=1))
    sdir = to_l / jnp.maximum(dist, 1e-6)[:, None]
    t_max = dist * 0.999
    skip = jnp.full((n,), int(ds.light_object[0]), jnp.int32)
    active = lane
    float(jnp.sum(surf.world_pos))

    o, d = surf.world_pos, sdir

    @jax.jit
    def stage_key(o, a):
        extent = jnp.maximum(ds.scene_max - ds.scene_min, 1e-6)
        q = jnp.clip((o - ds.scene_min) / extent * 511.0, 0.0,
                     511.0).astype(jnp.uint32)
        morton = (wf._morton9(q[:, 0]) | (wf._morton9(q[:, 1]) << 1)
                  | (wf._morton9(q[:, 2]) << 2))
        key = ((~a).astype(jnp.uint32) << 31) | morton
        return jnp.argsort(key)

    perm, dt = measure(stage_key, o, active)
    print(f"key+argsort:  {dt*1e3:6.1f} ms", flush=True)

    @jax.jit
    def stage_gather(o, d, t, s, a, perm):
        t_eff = jnp.where(a, t, cfg.t_min)
        return jnp.concatenate(
            [o, d, t_eff[:, None], s.astype(jnp.float32)[:, None]], axis=1
        )[perm]

    packed, dt = measure(stage_gather, o, d, t_max, skip, active, perm)
    print(f"pack+gather:  {dt*1e3:6.1f} ms", flush=True)

    @jax.jit
    def stage_kernel(packed):
        return occlusion_bvh_subpacket(
            packed[:, 0:3], packed[:, 3:6], cfg.t_min, packed[:, 6],
            ds, packed[:, 7].astype(jnp.int32))

    occ_s, dt = measure(stage_kernel, packed)
    print(f"kernel:       {dt*1e3:6.1f} ms", flush=True)

    @jax.jit
    def stage_scatter(occ_s, perm, a):
        return jnp.zeros((n,), bool).at[perm].set(occ_s) & a

    _, dt = measure(stage_scatter, occ_s, perm, active)
    print(f"scatter:      {dt*1e3:6.1f} ms", flush=True)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def whole(ds, o, d, t, s, a, cfg):
        return wf._occluded_pallas_sorted(ds, o, d, t, s, cfg, a)

    _, dt = measure(whole, ds, o, d, t_max, skip, active, cfg)
    print(f"whole block:  {dt*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
