"""Round-3 shade/NEE decomposition + permutation-machinery variants.

Two round-2 leftovers (VERDICT weak #2/#3):
  - the NEE occlusion block is ~268 ms/bounce of which ~115 ms was billed to
    permutation machinery;
  - ~140 ms/bounce of shade+NEE was unaccounted.
Round-3 gather_lab found every per-rep readback carries a ~28 ms axon RTT,
so those numbers are inflated; this lab re-measures with an amortizing inner
loop (run the op K times between readbacks) and tests the candidates:

  - light-selection weights: the [N,L] distance/weight/cumsum block, the
    duplicate _light_weights call in the emissive-MIS path, a matmul-based
    |p-c|^2 variant;
  - fetch_surface's two gathers; one-hot-matmul material fetch;
  - the occlusion permutation at BLOCK granularity (sort blocks of G
    consecutive lanes by the first lane's origin morton): gather cost drops
    G-fold and the kernel only needs 128-ray-group coherence, so G <= 16
    should keep unions intact (gather_lab: full-res [N,8] perm+scatter
    ~20 ms vs ~3 ms at G=32);
  - the wavefront sort's [N,17] gather (measured ~60 ms — width crossing 16
    leaves the fast path) vs a 16+1 split and vs block granularity.
Run directly: `python -u tools/r3_shade_lab.py`.
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
K = 4  # ops per readback (amortize the ~28 ms axon RTT)


def bench(name, fn, *args, k=K):
    """fn must return an array; runs fn k times (chained via a dummy add of
    an iteration scalar so XLA can't CSE the copies) per readback."""
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        outs = [fn(*args) for _ in range(k)]
        float(jnp.sum(outs[-1]) + sum(jnp.sum(o[..., :1]) for o in outs[:-1]))
    dt = (time.perf_counter() - t0) / (REPS * k)
    print(f"{name:52s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.integrator import wavefront as wf
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
    ds, bvh = bake_scene(scene, leaf_size=8)
    print(f"lights: {ds.num_lights}", flush=True)

    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    state1 = sl_make_state1(ds, ubo, cfg, n)
    state1s = jax.jit(lambda s, d: wf._sort_wavefront(s, d))(state1, ds)
    float(jnp.sum(state1s.origin))

    hit1 = jax.jit(functools.partial(wf._trace, cfg=cfg))(
        ds, state1s.origin, state1s.direction, active=state1s.alive)
    float(jnp.sum(hit1.t))

    lane = state1s.alive & hit1.hit
    surf = jax.jit(wf.fetch_surface)(ds, hit1, state1s.direction, lane)
    world_pos = surf.world_pos
    obj = surf.obj
    float(jnp.sum(world_pos))

    # ---------- shade+NEE decomposition ----------
    @jax.jit
    def f_fetch(ds, hit, d, lane):
        s = wf.fetch_surface(ds, hit, d, lane)
        return s.world_pos + s.albedo + s.roughness[:, None]

    bench("fetch_surface (2 gathers + interp)", f_fetch, ds, hit1,
          state1s.direction, lane)

    @jax.jit
    def f_trishade_gather(ds, hit):
        return ds.tri_shade[jnp.clip(hit.tri, 0, ds.tri_shade.shape[0] - 1)]

    bench("tri_shade gather alone [N<-300k,24]", f_trishade_gather, ds, hit1)

    @jax.jit
    def f_mat_gather(ds, hit):
        row = ds.tri_shade[jnp.clip(hit.tri, 0, ds.tri_shade.shape[0] - 1)]
        mat = row[:, 19].astype(jnp.int32)
        return ds.mat_packed[mat]

    bench("tri_shade + mat gather (chained)", f_mat_gather, ds, hit1)

    m_count = ds.mat_packed.shape[0]

    @jax.jit
    def f_mat_onehot(ds, hit):
        row = ds.tri_shade[jnp.clip(hit.tri, 0, ds.tri_shade.shape[0] - 1)]
        mat = row[:, 19].astype(jnp.int32)
        oh = (mat[:, None] == jnp.arange(m_count)[None, :]).astype(
            jnp.bfloat16)
        return (oh @ ds.mat_packed.astype(jnp.bfloat16)).astype(jnp.float32)

    bench(f"tri_shade + mat onehot-matmul (M={m_count})", f_mat_onehot, ds,
          hit1)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def f_lw(ds, pos, obj, cfg):
        w, tw = wf._light_weights(ds, pos, obj, cfg)
        return tw

    bench("_light_weights (one [N,L] pass)", f_lw, ds, world_pos, obj, cfg)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def f_lw_sel(ds, pos, obj, cfg):
        w, tw = wf._light_weights(ds, pos, obj, cfg)
        cs = jnp.cumsum(w, axis=1)
        r1 = tw * 0.37
        found = jnp.any(cs >= r1[:, None], axis=1)
        sel = jnp.argmax(cs >= r1[:, None], axis=1)
        sw = jnp.take_along_axis(w, sel[:, None], axis=1)[:, 0]
        return sw + found

    bench("_light_weights + cumsum/select", f_lw_sel, ds, world_pos, obj, cfg)

    l_used = min(ds.num_lights, cfg.max_lights)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def f_lw_matmul(ds, pos, obj, cfg):
        centers = ds.light_center[:l_used]
        powers = ds.light_power[:l_used]
        # |p-c|^2 = |p|^2 - 2 p.c + |c|^2 — the cross term rides the MXU.
        pc = pos @ centers.T
        d2 = (jnp.sum(pos * pos, axis=1, keepdims=True) - 2.0 * pc
              + jnp.sum(centers * centers, axis=1)[None, :])
        w = powers[None, :] / jnp.maximum(d2, 0.001)
        w = jnp.where(ds.light_object[None, :l_used] == obj[:, None], 0.0, w)
        return jnp.sum(w, axis=-1)

    bench("_light_weights via MXU matmul", f_lw_matmul, ds, world_pos, obj,
          cfg)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def f_shade_no_nee(ds, state, hit, cfg):
        st, ph, sh = wf._shade(ds, state, hit, cfg, suppress_nee=True)
        return st.color

    bench("shade only (suppress_nee)", f_shade_no_nee, ds, state1s, hit1, cfg,
          k=2)

    orig_occluded = wf._occluded
    try:
        wf._occluded = lambda scene, o, d, t, s, cfg2, a: jnp.zeros(
            o.shape[0], bool)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def f_shade_stub(ds, state, hit, cfg):
            st, ph, sh = wf._shade(ds, state, hit, cfg)
            return st.color

        bench("shade+NEE (occl stubbed)", f_shade_stub, ds, state1s, hit1,
              cfg, k=2)
    finally:
        wf._occluded = orig_occluded

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def f_shade_full(ds, state, hit, cfg):
        st, ph, sh = wf._shade(ds, state, hit, cfg)
        return st.color

    bench("shade+NEE (full, incl occlusion)", f_shade_full, ds, state1s,
          hit1, cfg, k=2)

    # ---------- occlusion permutation variants ----------
    # Shadow-ray-like workload from the real hit points toward light 0's
    # center (distance-capped) with the real alive mask.
    l0 = ds.light_center[0]
    to_l = l0[None, :] - world_pos
    dist = jnp.sqrt(jnp.sum(to_l * to_l, axis=1))
    sdir = to_l / jnp.maximum(dist, 1e-6)[:, None]
    t_max = dist * 0.999
    skip = jnp.full((n,), -1, jnp.int32)
    active = lane

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def occ_prod(ds, o, d, t, s, a, cfg):
        return wf._occluded_pallas_sorted(ds, o, d, t, s, cfg, a)

    bench("occl block: production (full-res perm)", occ_prod, ds, world_pos,
          sdir, t_max, skip, active, cfg, k=2)
    occ_ref = occ_prod(ds, world_pos, sdir, t_max, skip, active, cfg)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def occ_perm_only(ds, o, d, t, s, a, cfg):
        # The permutation machinery with the kernel replaced by a cheap
        # surrogate (sum of the packed rows).
        from raytracer_tpu.integrator.wavefront import _morton9
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
        occ_s = jnp.sum(packed, axis=1) > 1e30  # surrogate "kernel"
        return jnp.zeros((n,), bool).at[perm].set(occ_s) & a

    bench("occl block: perm machinery only (stub kernel)", occ_perm_only,
          ds, world_pos, sdir, t_max, skip, active, cfg)

    def occ_block(ds, o, d, t, s, a, cfg, G):
        from raytracer_tpu.integrator.wavefront import _morton9
        extent = jnp.maximum(ds.scene_max - ds.scene_min, 1e-6)
        ob = o.reshape(-1, G, 3)[:, 0]  # block representative: first lane
        q = jnp.clip((ob - ds.scene_min) / extent * 511.0, 0.0,
                     511.0).astype(jnp.uint32)
        morton = (_morton9(q[:, 0]) | (_morton9(q[:, 1]) << 1)
                  | (_morton9(q[:, 2]) << 2))
        ab = a.reshape(-1, G).any(axis=1)
        key = ((~ab).astype(jnp.uint32) << 31) | morton
        perm = jnp.argsort(key)
        t_eff = jnp.where(a, t, cfg.t_min)
        packed = jnp.concatenate(
            [o, d, t_eff[:, None], s.astype(jnp.float32)[:, None]], axis=1
        ).reshape(-1, G * 8)[perm].reshape(-1, 8)
        occ_s = occlusion_bvh_subpacket(
            packed[:, 0:3], packed[:, 3:6], cfg.t_min, packed[:, 6],
            ds, packed[:, 7].astype(jnp.int32),
        )
        nb = n // G
        out = jnp.zeros((nb, G), bool).at[perm].set(occ_s.reshape(nb, G))
        return out.reshape(-1) & a

    for G in (8, 16, 32):
        f = jax.jit(functools.partial(occ_block, cfg=cfg, G=G))
        dt = bench(f"occl block: block-perm G={G}", f, ds, world_pos, sdir,
                   t_max, skip, active, k=2)
        got = f(ds, world_pos, sdir, t_max, skip, active)
        mism = int(jnp.sum(got != occ_ref))
        print(f"    occ mismatches vs production: {mism}", flush=True)

    # ---------- wavefront sort variants ----------
    @jax.jit
    def sort_full(state, ds):
        return wf._sort_wavefront(state, ds).origin

    bench("wavefront sort: production ([N,17]+[N,5])", sort_full, state1,
          ds)

    @jax.jit
    def sort_16_1(state, ds):
        # Same keys; move one f32 field into the int pack to keep the wide
        # gather at width 16 (the [N,17] gather measured ~3x a [N,16] one).
        from raytracer_tpu.integrator.wavefront import _morton9
        extent = jnp.maximum(ds.scene_max - ds.scene_min, 1e-6)
        q = jnp.clip((state.origin - ds.scene_min) / extent * 511.0, 0.0,
                     511.0).astype(jnp.uint32)
        morton = (_morton9(q[:, 0]) | (_morton9(q[:, 1]) << 1)
                  | (_morton9(q[:, 2]) << 2))
        octant = ((state.direction[:, 0] >= 0).astype(jnp.uint32)
                  | ((state.direction[:, 1] >= 0).astype(jnp.uint32) << 1)
                  | ((state.direction[:, 2] >= 0).astype(jnp.uint32) << 2))
        dead = (~state.alive).astype(jnp.uint32)
        key = (dead << 31) | (octant << 27) | morton
        perm = jnp.argsort(key)
        packed_f = jnp.concatenate(
            [state.origin, state.direction, state.color, state.throughput,
             state.prev_hit_pos, state.prev_brdf_pdf[:, None]], axis=1
        )[perm]
        flags = (state.alive.astype(jnp.uint32)
                 | (state.first_bounce.astype(jnp.uint32) << 1)
                 | (state.is_specular.astype(jnp.uint32) << 2)
                 | (state.did_direct.astype(jnp.uint32) << 3))
        packed_i = jnp.stack(
            [state.seed_rgen, state.seed, flags,
             state.channel.astype(jnp.uint32),
             state.pixel.astype(jnp.uint32),
             state.p_sample_light.astype(jnp.float32).view(jnp.uint32)],
            axis=1)[perm]
        return packed_f[:, 0:3] + packed_i[:, 5:6].view(jnp.float32)

    bench("wavefront sort: [N,16]+[N,6] packing", sort_16_1, state1, ds)


if __name__ == "__main__":
    main()
