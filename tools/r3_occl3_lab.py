"""Ordered (near-first) pushes in the any-hit kernel.

The occlusion kernel pushes hit children in fixed child order (pop order is
irrelevant to CORRECTNESS without a shrinking best-t), but for EARLY EXIT it
may matter: visiting near geometry first finds occluders sooner, collapsing
per-lane t_eff and the all-occluded row exit earlier. Costs the same
min-reductions + near-extract machinery the closest kernel pays.

Run: python -u tools/r3_occl3_lab.py
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

from raytracer_tpu.ops.pallas_subpacket import (  # noqa: E402
    CAP, DRAIN_AT, LANES, LQ, ROWS, TRI_STRIDE,
    _FULL, _SMEM1, _SP_SPEC, _init_rows, _inv_dir, _moller_rows, _pack_code7,
    _pop_leaves, _pop_rows, _read_leaf_rows, _read_quad_rows, _rowmask_f,
    _route_quad, _slab_rows,
)

BIG = float(np.float32(3.0e38))
WIDTH, HEIGHT = 1920, 1080
REPS = 3


def _occlusion_kernel_ordered(leaf_size,
                              ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                              tmax_ref, skip_obj_ref, root_ref, pmeta_ref,
                              pnodes_ref, ptris_ref, occ_ref, stack_ref,
                              lq_ref):
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

    occ_ref[0] = jnp.zeros((ROWS, LANES), jnp.int32)
    sp0, ln0 = _init_rows(stack_ref, lq_ref, root_ref[0])

    def leaf_step(sps, lqns):
        blks, valids, new_lqns = _pop_leaves(lq_ref, lqns)
        rows8 = _read_leaf_rows(ptris_ref, blks)
        rowmask = _rowmask_f(valids) > 0.0
        occ = occ_ref[0]
        t_eff = jnp.where(occ == 0, t_max, t_min)
        for k in range(leaf_size):
            t, u, v, valid, c = _moller_rows(
                rows8, k, ox, oy, oz, dx, dy, dz, t_min, t_eff
            )
            valid = valid & rowmask & (c(10) != skip_obj)
            occ = jnp.where(valid, 1, occ)
        occ_ref[0] = occ
        done = jnp.min(occ, axis=1, keepdims=True)
        done_all = jnp.sum(
            done * (2 ** jnp.arange(ROWS, dtype=jnp.int32))[:, None]
        )
        out_sps = []
        out_lqns = []
        for r in range(ROWS):
            alive_r = ((done_all >> r) & 1) == 0
            out_sps.append(jnp.where(alive_r, sps[r], 0))
            out_lqns.append(jnp.where(alive_r, new_lqns[r], 0))
        return tuple(out_sps), tuple(out_lqns)

    def internal_step(sps, lqns):
        nodes, valids, new_sps = _pop_rows(stack_ref, sps)
        rows8 = _read_quad_rows(pnodes_ref, nodes)
        t_eff = jnp.where(occ_ref[0] == 0, t_max, 0.0) * _rowmask_f(valids)
        col = lambda i: rows8[:, i: i + 1]
        tns = []
        for c in range(4):
            h, tn = _slab_rows(
                ox, oy, oz, ix, iy, iz,
                (col(6 * c), col(6 * c + 1), col(6 * c + 2)),
                (col(6 * c + 3), col(6 * c + 4), col(6 * c + 5)),
                t_min, t_eff,
            )
            tns.append(jnp.min(jnp.where(h, tn, BIG), axis=1, keepdims=True))
        any_h = [tn < BIG for tn in tns]
        b0 = (tns[1] < tns[0]).astype(jnp.int32)
        b1 = (tns[3] < tns[2]).astype(jnp.int32)
        use_hi = jnp.minimum(tns[2], tns[3]) < jnp.minimum(tns[0], tns[1])
        near = jnp.where(use_hi, 2 + b1, b0)
        code = (
            any_h[0].astype(jnp.int32)
            + 2 * any_h[1].astype(jnp.int32)
            + 4 * any_h[2].astype(jnp.int32)
            + 8 * any_h[3].astype(jnp.int32)
            + 16 * near
        )
        code_lo, code_hi = _pack_code7(code)
        return _route_quad(stack_ref, lq_ref, pmeta_ref, nodes, new_sps,
                           lqns, code_lo, code_hi, ordered=True)

    def body(carry):
        sps = carry[:ROWS]
        lqns = carry[ROWS:]
        do_leaf = jnp.zeros((), bool)
        for r in range(ROWS):
            do_leaf |= lqns[r] >= DRAIN_AT
            do_leaf |= (sps[r] == 0) & (lqns[r] > 0)
        sps, lqns = jax.lax.cond(do_leaf, leaf_step, internal_step, sps, lqns)
        return sps + lqns

    def cond(carry):
        alive = jnp.zeros((), bool)
        for v in carry:
            alive |= v > 0
        return alive

    jax.lax.while_loop(cond, body, tuple([sp0] * ROWS) + tuple([ln0] * ROWS))


def run_occl_ordered(ox, oy, oz, dx, dy, dz, tmax, skip_obj, root, pmeta,
                     pnodes, ptris):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    return pl.pallas_call(
        functools.partial(_occlusion_kernel_ordered, leaf_size),
        grid=(n_tiles,),
        in_specs=[_SP_SPEC] * 8 + [_SMEM1, _SMEM1, _FULL, _FULL],
        out_specs=[_SP_SPEC],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.int32)],
        scratch_shapes=[
            pltpu.SMEM((ROWS * CAP,), jnp.int32),
            pltpu.SMEM((ROWS * LQ,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(ox, oy, oz, dx, dy, dz, tmax, skip_obj, root, pmeta, pnodes, ptris)


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops import pallas_subpacket as sp
    from raytracer_tpu.ops.camera import Camera
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
    lc = ds.light_center[0]
    to_l = lc[None, :] - surf.world_pos
    dist = jnp.sqrt(jnp.sum(to_l * to_l, axis=1))
    sdir = to_l / jnp.maximum(dist, 1e-6)[:, None]
    t_max = dist * 0.999
    skip = jnp.full((n,), int(ds.light_object[0]), jnp.int32)
    active = lane
    float(jnp.sum(surf.world_pos))

    def measure(fn, *args):
        out = fn(*args)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
            float(jnp.sum(out))
        return out, (time.perf_counter() - t0) / REPS

    # Production (unordered) via the sorted wrapper.
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def prod(ds, o, d, t, s, a, cfg):
        return wf._occluded_pallas_sorted(ds, o, d, t, s, cfg, a)

    ref, dt0 = measure(prod, ds, surf.world_pos, sdir, t_max, skip, active,
                       cfg)
    print(f"production unordered any-hit: {dt0*1e3:8.1f} ms", flush=True)

    # Ordered variant through the same sort machinery.
    @jax.jit
    def ordered(o, d, t, s, a):
        extent = jnp.maximum(ds.scene_max - ds.scene_min, 1e-6)
        q = jnp.clip((o - ds.scene_min) / extent * 511.0, 0.0,
                     511.0).astype(jnp.uint32)
        morton = (wf._morton9(q[:, 0]) | (wf._morton9(q[:, 1]) << 1)
                  | (wf._morton9(q[:, 2]) << 2))
        key = ((~a).astype(jnp.uint32) << 31) | morton
        perm = jnp.argsort(key)
        t_eff = jnp.where(a, t, cfg.t_min)
        packed = jnp.concatenate(
            [o, d, t_eff[:, None], s.astype(jnp.float32)[:, None]], axis=1
        )[perm]
        n_tiles = sp._tile_count(n)
        ox, oy, oz, dx, dy, dz = sp._ray_tiles(
            packed[:, 0:3], packed[:, 3:6], n_tiles)
        tmax_t = sp._to_tiles(packed[:, 6], n_tiles, fill=1e-3)
        skip_t = sp._to_tiles(packed[:, 7].astype(jnp.int32), n_tiles,
                              fill=-1)

        def run(*args):
            return run_occl_ordered(*args)

        outs = sp._grouped(run, [ox, oy, oz, dx, dy, dz, tmax_t, skip_t],
                           [ds.qroot, ds.qmeta, ds.qnodes, ds.ptris],
                           n_tiles)
        occ_s = outs[0].reshape(-1)[:n] > 0
        return jnp.zeros((n,), bool).at[perm].set(occ_s) & a

    got, dt1 = measure(ordered, surf.world_pos, sdir, t_max, skip, active)
    mism = int(jnp.sum(got != ref))
    print(f"ordered near-first any-hit:   {dt1*1e3:8.1f} ms  "
          f"({dt0/dt1:.3f}x)  mism {mism}", flush=True)


if __name__ == "__main__":
    main()
