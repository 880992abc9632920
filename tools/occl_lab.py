"""Occlusion-kernel lab: instrument the real NEE shadow-ray workload.

Variants:
  base    — production occlusion kernel + visit counters
  lean    — t_eff/all_done only refreshed after leaf visits (occ only
            changes at leaves); any() derived from min reductions
  noorder — lean + no near/far ordering (occlusion needs no ordering for
            correctness; tests whether near-first pays for itself via
            earlier per-lane kills)
  resort  — lean, shadow rays re-sorted by position morton (they currently
            inherit the bounce wavefront's direction-octant-major order)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from raytracer_tpu.ops.pallas_traverse import (  # noqa: E402
    BIG, STACK_CAP, TILE_L, TILE_S, TRI_STRIDE,
    _inv_dir, _slab, _moller_scalar_tri, _ray_tiles, _to_tiles, _tile_count,
    _RAY_SPEC, _FULL, _SMEM1,
)

WIDTH, HEIGHT = 1920, 1080
REPS = 3
FREQ_GHZ = 0.94
_CNT_SPEC = pl.BlockSpec((1, 8, TILE_L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)


def _occl_kernel_lab(leaf_size, variant,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmax_ref, skip_obj_ref, root_ref, pnodes_ref,
                     ptris_ref, occ_ref, nvisit_ref, nleaf_ref, stack_ref):
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    t_max = tmax_ref[0]
    skip_obj = skip_obj_ref[0].astype(jnp.float32)
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t_min = 1e-3

    occ_ref[0] = jnp.zeros((TILE_S, TILE_L), jnp.int32)

    def leaf_fn(block):
        occ = occ_ref[0]
        for k in range(leaf_size):
            tv = [ptris_ref[block, k * TRI_STRIDE + c] for c in range(9)]
            _, _, _, valid = _moller_scalar_tri(
                tv, ox, oy, oz, dx, dy, dz, t_min, t_max
            )
            obj_k = ptris_ref[block, k * TRI_STRIDE + 10]
            valid = valid & (obj_k != skip_obj)
            occ = jnp.where(valid, 1, occ)
        occ_ref[0] = occ

    def visit_internal(sp, meta, t_eff):
        row = pnodes_ref[pl.ds(meta, 1), :]
        lmn = (row[0, 0], row[0, 1], row[0, 2])
        lmx = (row[0, 3], row[0, 4], row[0, 5])
        rmn = (row[0, 6], row[0, 7], row[0, 8])
        rmx = (row[0, 9], row[0, 10], row[0, 11])
        lmeta = row[0, 12].astype(jnp.int32)
        rmeta = row[0, 13].astype(jnp.int32)
        hit_l, tn_l = _slab(ox, oy, oz, ix, iy, iz, *lmn, *lmx, t_min, t_eff)
        hit_r, tn_r = _slab(ox, oy, oz, ix, iy, iz, *rmn, *rmx, t_min, t_eff)
        if variant == "base":
            any_l = jnp.any(hit_l)
            any_r = jnp.any(hit_r)
            near_l = jnp.min(jnp.where(hit_l, tn_l, BIG))
            near_r = jnp.min(jnp.where(hit_r, tn_r, BIG))
            swap = near_r < near_l
        elif variant == "noorder":
            any_l = jnp.any(hit_l)
            any_r = jnp.any(hit_r)
            swap = jnp.zeros((), bool)
        else:  # lean / resort: ordering via min, any derived
            near_l = jnp.min(jnp.where(hit_l, tn_l, BIG))
            near_r = jnp.min(jnp.where(hit_r, tn_r, BIG))
            any_l = near_l < BIG
            any_r = near_r < BIG
            swap = near_r < near_l
        m_near = jnp.where(swap, rmeta, lmeta)
        m_far = jnp.where(swap, lmeta, rmeta)
        p_near = jnp.where(swap, any_r, any_l)
        p_far = jnp.where(swap, any_l, any_r)
        stack_ref[sp] = m_far
        sp = sp + p_far.astype(jnp.int32)
        stack_ref[sp] = m_near
        sp = sp + p_near.astype(jnp.int32)
        return sp

    stack_ref[0] = root_ref[0]

    if variant == "base":
        def body(carry):
            sp, nv, nl, t_eff = carry
            sp = sp - 1
            meta = stack_ref[sp]

            def on_leaf(sp):
                leaf_fn(~meta)
                return sp

            t_eff = jnp.where(occ_ref[0] == 0, t_max, 1e-3)
            sp = jax.lax.cond(
                meta < 0, on_leaf,
                lambda sp: visit_internal(sp, meta, t_eff), sp)
            all_done = jnp.all(occ_ref[0] == 1)
            return (jnp.where(all_done, 0, sp), nv + 1,
                    nl + (meta < 0).astype(jnp.int32), t_eff)
    else:
        def body(carry):
            sp, nv, nl, t_eff = carry
            sp = sp - 1
            meta = stack_ref[sp]

            def on_leaf(args):
                sp, t_eff = args
                leaf_fn(~meta)
                # occ only changes at leaves: refresh the union cap and the
                # early-exit check here, not on every internal visit.
                t_eff = jnp.where(occ_ref[0] == 0, t_max, 1e-3)
                sp = jnp.where(jnp.all(occ_ref[0] == 1), 0, sp)
                return sp, t_eff

            def on_internal(args):
                sp, t_eff = args
                return visit_internal(sp, meta, t_eff), t_eff

            sp, t_eff = jax.lax.cond(meta < 0, on_leaf, on_internal,
                                     (sp, t_eff))
            return sp, nv + 1, nl + (meta < 0).astype(jnp.int32), t_eff

    _, nv, nl, _ = jax.lax.while_loop(
        lambda c: c[0] > 0, body,
        (1, jnp.int32(0), jnp.int32(0), t_max),
    )
    nvisit_ref[0] = jnp.full((8, TILE_L), nv, jnp.int32)
    nleaf_ref[0] = jnp.full((8, TILE_L), nl, jnp.int32)


def run_occl_lab(ox, oy, oz, dx, dy, dz, tmax, skip, root, pnodes, ptris,
                 variant):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 8, TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 8, TILE_L), jnp.int32),
    ]
    return pl.pallas_call(
        functools.partial(_occl_kernel_lab, leaf_size, variant),
        grid=(n_tiles,),
        in_specs=[_RAY_SPEC] * 8 + [_SMEM1, _FULL, _FULL],
        out_specs=[_RAY_SPEC, _CNT_SPEC, _CNT_SPEC],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(ox, oy, oz, dx, dy, dz, tmax, skip, root, pnodes, ptris)


def measure(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out[0]))
    return out, (time.perf_counter() - t0) / REPS


def shadow_rays_at(ds, ubo, cfg, n, bounce):
    """Reproduce the exact NEE shadow-ray batch the integrator traces at
    the given bounce (0 = primary hits), in the wavefront order it uses."""
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops import rng
    from raytracer_tpu.ops.math3d import (
        cos_theta, dot_k, length, normalize, world_to_local, make_basis,
    )
    from tools.sort_lab import sl_make_state1

    state = sl_make_state1(ds, ubo, cfg, n)  # after bounce 0 shade
    if bounce >= 1:
        state = jax.jit(lambda s, d: wf._sort_wavefront(s, d))(state, ds)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def extract(ds, state, cfg):
        hit = wf._trace(ds, state.origin, state.direction, cfg, state.alive)
        lane = state.alive & hit.hit
        surf = wf.fetch_surface(ds, hit, state.direction, lane)
        seed = state.seed
        p_sample_light = jnp.clip(surf.roughness, 0.1, 0.9)
        p_draw, seed = rng.rnd_masked(seed, lane)
        do_nee = lane & (p_draw < p_sample_light)
        weights, total_w = wf._light_weights(ds, surf.world_pos, surf.obj,
                                             cfg)
        m_sel = do_nee & (total_w > 0.0)
        r_sel, seed = rng.rnd_masked(seed, m_sel)
        r1 = r_sel * total_w
        cs = jnp.cumsum(weights, axis=1)
        found = jnp.any(cs >= r1[:, None], axis=1)
        selected = jnp.argmax(cs >= r1[:, None], axis=1).astype(jnp.int32)
        m_samp = m_sel & found
        l_used = min(ds.num_lights, cfg.max_lights)
        sel_c = jnp.clip(selected, 0, l_used - 1)
        (l_pos, _n, l_dir, _d, _p, _e, _lo, l_valid, seed) = wf._sample_light(
            ds, selected, surf.world_pos, seed, m_samp, cfg)
        basis = make_basis(surf.world_nrm)
        wi_local = world_to_local(l_dir, basis)
        consider = m_samp & l_valid & (cos_theta(wi_local) > 1e-4)
        eps = 0.001
        to_light_n = normalize(l_pos - surf.world_pos)
        offset_from = surf.world_pos + surf.world_nrm * (
            eps * jnp.sign(dot_k(surf.world_nrm, to_light_n)))
        sr = l_pos - offset_from
        sr_dist = length(sr)
        sr_dir = sr / jnp.maximum(sr_dist, 1e-20)[:, None]
        light_obj = ds.light_object[sel_c]
        active = consider & (sr_dist > 0.0)
        return offset_from, sr_dir, sr_dist * 0.999, light_obj, active

    return extract(ds, state, cfg)


def main():
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
    n_tiles = _tile_count(n)

    for bounce in (0, 1):
        o, d, tm, skip, active = shadow_rays_at(ds, ubo, cfg, n, bounce)
        float(jnp.sum(o))
        occ_frac = None

        @jax.jit
        def prep(o, d, tm, skip, active, key=None):
            if key is not None:
                perm = jnp.argsort(key)
                o, d, tm, skip, active = (
                    o[perm], d[perm], tm[perm], skip[perm], active[perm])
            tmm = jnp.where(active, tm, 1e-3)
            comps = _ray_tiles(o, d, n_tiles)
            comps.append(_to_tiles(tmm, n_tiles, fill=1e-3))
            comps.append(_to_tiles(skip.astype(jnp.int32), n_tiles,
                                   fill=-1))
            return comps

        extent = jnp.maximum(ds.scene_max - ds.scene_min, 1e-6)
        from raytracer_tpu.integrator.wavefront import _morton9
        qp = jnp.clip((o - ds.scene_min) / extent * 511.0, 0, 511.0
                      ).astype(jnp.uint32)
        m27 = (_morton9(qp[:, 0]) | (_morton9(qp[:, 1]) << 1)
               | (_morton9(qp[:, 2]) << 2))
        key = ((~active).astype(jnp.uint32) << 31) | m27

        for variant in ("base", "lean", "noorder", "resort"):
            rays = prep(o, d, tm, skip, active,
                        key if variant == "resort" else None)
            [float(jnp.sum(r)) for r in rays[:1]]
            fn = jax.jit(functools.partial(run_occl_lab, variant=variant))
            out, dt = measure(fn, *rays, ds.root_meta, ds.pnodes, ds.ptris)
            visits = int(jnp.sum(out[1][:, 0, 0]))
            leaves = int(jnp.sum(out[2][:, 0, 0]))
            if occ_frac is None:
                occ_frac = float(jnp.mean(
                    (out[0].reshape(-1)[:n] > 0).astype(jnp.float32)))
            print(f"occl b{bounce} {variant:8s} {dt*1e3:8.1f} ms  "
                  f"visits/packet {visits//n_tiles:6d} "
                  f"(leaf {100*leaves/max(visits,1):.0f}%)  "
                  f"occluded {100*occ_frac:.0f}%", flush=True)


if __name__ == "__main__":
    main()
