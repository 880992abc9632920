"""v4 prototype: TWO interleaved [8,128] sub-packet tiles per kernel instance.

Hypothesis (from tools/profile_frame.py + subpacket_lab.py numbers): the
production sub-packet kernel runs ~490 cyc per while-loop iteration while
its average VPU work is only ~140 cyc — the rest is exposed LATENCY
(vector->scalar code extract, dependent SMEM routing chains, dynamic row
reads). Interleaving a second, independent tile in the same instance gives
the scheduler work to hide those latencies behind.

Control-flow shape matters: a lax.cond per tile would serialize at branch
boundaries, so the body dispatches ONE lax.switch over the 4 (leaf|internal)
x (leaf|internal) combinations, each branch straight-line code for both
halves (full cross-half ILP).

Hit records must stay bit-identical to the production kernel: per-row visit
ORDER is untouched (each half runs exactly the production schedule).
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
    _FULL, _SMEM1, _moller_rows, _rowmask_f, _slab_rows,
)
from raytracer_tpu.ops.pallas_traverse import _inv_dir  # noqa: E402

IL = 2  # interleaved tiles per instance
VARIANT = "shared"
BIG = float(np.float32(3.0e38))
WIDTH, HEIGHT = 1920, 1080
REPS = 3


def _pop_rows(stack_ref, sps, base):
    nodes, valids, new_sps = [], [], []
    for r in range(ROWS):
        sp = sps[r]
        has = sp > 0
        meta = stack_ref[(base + r) * CAP + jnp.maximum(sp - 1, 0)]
        new_sps.append(sp - has.astype(jnp.int32))
        nodes.append(jnp.where(has, meta, 0))
        valids.append(has)
    return nodes, valids, new_sps


def _read_node_rows(pnodes_ref, nodes):
    return jnp.concatenate(
        [pnodes_ref[pl.ds(nodes[r], 1), :12] for r in range(ROWS)], axis=0
    )


def _push_children(stack_ref, lq_ref, pmeta_ref, nodes, new_sps, lqns,
                   code_all, base):
    out_sps, out_lqns = [], []
    for r in range(ROWS):
        c = (code_all >> (3 * r)) & 7
        a_l = (c & 1) > 0
        a_r = (c & 2) > 0
        n = nodes[r]
        lmeta = pmeta_ref[2 * n]
        rmeta = pmeta_ref[2 * n + 1]
        sw = (c & 4) > 0
        m_near = jnp.where(sw, rmeta, lmeta)
        m_far = jnp.where(sw, lmeta, rmeta)
        p_near = jnp.where(sw, a_r, a_l).astype(jnp.int32)
        p_far = jnp.where(sw, a_l, a_r).astype(jnp.int32)
        sp = new_sps[r]
        ln = lqns[r]
        far_leaf = (m_far < 0).astype(jnp.int32)
        stack_ref[(base + r) * CAP + sp] = m_far
        lq_ref[(base + r) * LQ + jnp.minimum(ln, LQ - 1)] = ~m_far
        sp = sp + p_far * (1 - far_leaf)
        ln = ln + p_far * far_leaf
        near_leaf = (m_near < 0).astype(jnp.int32)
        stack_ref[(base + r) * CAP + jnp.minimum(sp, CAP - 1)] = m_near
        lq_ref[(base + r) * LQ + jnp.minimum(ln, LQ - 1)] = ~m_near
        sp = sp + p_near * (1 - near_leaf)
        ln = ln + p_near * near_leaf
        out_sps.append(sp)
        out_lqns.append(ln)
    return tuple(out_sps), tuple(out_lqns)


def _pop_leaves(lq_ref, lqns, base):
    blks, valids, new_lqns = [], [], []
    for r in range(ROWS):
        ln = lqns[r]
        has = ln > 0
        blk = lq_ref[(base + r) * LQ + jnp.maximum(ln - 1, 0)]
        new_lqns.append(ln - has.astype(jnp.int32))
        blks.append(jnp.where(has, blk, 0))
        valids.append(has)
    return blks, valids, new_lqns


def _read_leaf_rows(ptris_ref, blks):
    return jnp.concatenate(
        [ptris_ref[pl.ds(blks[r], 1), :] for r in range(ROWS)], axis=0
    )


def _pack_code(code):
    weights = (8 ** jnp.arange(ROWS, dtype=jnp.int32))[:, None]
    return jnp.sum(code * weights)


def _closest_kernel_v4(leaf_size,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref, root_ref, pmeta_ref, pnodes_ref, ptris_ref,
                       t_ref, tri_ref, u_ref, v_ref, stack_ref, lq_ref):
    rays = []
    for h in range(IL):
        sl = slice(h * ROWS, (h + 1) * ROWS)
        ox = ox_ref[0][sl]
        oy = oy_ref[0][sl]
        oz = oz_ref[0][sl]
        dx = dx_ref[0][sl]
        dy = dy_ref[0][sl]
        dz = dz_ref[0][sl]
        rays.append((ox, oy, oz, dx, dy, dz,
                     _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)))
    t_min = 1e-3

    t_ref[0] = tmax_ref[0]
    tri_ref[0] = jnp.full((IL * ROWS, LANES), -1, jnp.int32)
    u_ref[0] = jnp.zeros((IL * ROWS, LANES), jnp.float32)
    v_ref[0] = jnp.zeros((IL * ROWS, LANES), jnp.float32)

    root = root_ref[0]
    sp0 = (root >= 0).astype(jnp.int32)
    ln0 = (root < 0).astype(jnp.int32)
    for r in range(IL * ROWS):
        stack_ref[r * CAP] = root
        lq_ref[r * LQ] = ~root

    def leaf_half(h, sps, lqns):
        base = h * ROWS
        sl = slice(base, base + ROWS)
        ox, oy, oz, dx, dy, dz, ix, iy, iz = rays[h]
        blks, valids, new_lqns = _pop_leaves(lq_ref, lqns, base)
        rows8 = _read_leaf_rows(ptris_ref, blks)
        rowmask = _rowmask_f(valids) > 0.0
        bt = t_ref[0, sl]
        btri = tri_ref[0, sl]
        bu = u_ref[0, sl]
        bv = v_ref[0, sl]
        for k in range(leaf_size):
            t, u, v, valid, c = _moller_rows(
                rows8, k, ox, oy, oz, dx, dy, dz, t_min, bt
            )
            valid = valid & rowmask
            trik = c(9).astype(jnp.int32)
            bt = jnp.where(valid, t, bt)
            btri = jnp.where(valid, jnp.broadcast_to(trik, bt.shape), btri)
            bu = jnp.where(valid, u, bu)
            bv = jnp.where(valid, v, bv)
        t_ref[0, sl] = bt
        tri_ref[0, sl] = btri
        u_ref[0, sl] = bu
        v_ref[0, sl] = bv
        return sps, tuple(new_lqns)

    def internal_half(h, sps, lqns):
        base = h * ROWS
        sl = slice(base, base + ROWS)
        ox, oy, oz, dx, dy, dz, ix, iy, iz = rays[h]
        nodes, valids, new_sps = _pop_rows(stack_ref, sps, base)
        rows8 = _read_node_rows(pnodes_ref, nodes)
        t_cap = t_ref[0, sl] * _rowmask_f(valids)
        col = lambda i: rows8[:, i: i + 1]
        hit_l, tn_l = _slab_rows(ox, oy, oz, ix, iy, iz,
                                 (col(0), col(1), col(2)),
                                 (col(3), col(4), col(5)), t_min, t_cap)
        hit_r, tn_r = _slab_rows(ox, oy, oz, ix, iy, iz,
                                 (col(6), col(7), col(8)),
                                 (col(9), col(10), col(11)), t_min, t_cap)
        near_l = jnp.min(jnp.where(hit_l, tn_l, BIG), axis=1, keepdims=True)
        near_r = jnp.min(jnp.where(hit_r, tn_r, BIG), axis=1, keepdims=True)
        any_l = near_l < BIG
        any_r = near_r < BIG
        swap = near_r < near_l
        code = (any_l.astype(jnp.int32) + 2 * any_r.astype(jnp.int32)
                + 4 * swap.astype(jnp.int32))
        return _push_children(stack_ref, lq_ref, pmeta_ref, nodes, new_sps,
                              lqns, _pack_code(code), base)

    def split(carry):
        out = []
        for h in range(IL):
            out.append(carry[2 * h * ROWS: (2 * h + 1) * ROWS])
            out.append(carry[(2 * h + 1) * ROWS: (2 * h + 2) * ROWS])
        return out  # [spsA, lqA, spsB, lqB]

    def body(carry):
        parts = split(carry)
        flags = []
        for h in range(IL):
            sps, lqns = parts[2 * h], parts[2 * h + 1]
            do_leaf = jnp.zeros((), bool)
            for r in range(ROWS):
                do_leaf |= lqns[r] >= DRAIN_AT
                do_leaf |= (sps[r] == 0) & (lqns[r] > 0)
            flags.append(do_leaf)
        if VARIANT == "switch":
            idx = (flags[0].astype(jnp.int32)
                   + 2 * flags[1].astype(jnp.int32))

            def make_branch(leaf_a, leaf_b):
                def br(carry):
                    parts = split(carry)
                    fa = leaf_half if leaf_a else internal_half
                    fb = leaf_half if leaf_b else internal_half
                    sa, la = fa(0, parts[0], parts[1])
                    sb, lb = fb(1, parts[2], parts[3])
                    return sa + la + sb + lb
                return br

            return jax.lax.switch(
                idx,
                [make_branch(False, False), make_branch(True, False),
                 make_branch(False, True), make_branch(True, True)],
                carry,
            )
        # "shared": ONE cond; both halves take the same step kind (a half
        # whose queue is empty during a forced leaf step is masked — visit
        # order per row is unchanged, results stay bit-identical).
        do_leaf = flags[0] | flags[1]

        def both(leaf):
            def br(carry):
                parts = split(carry)
                f = leaf_half if leaf else internal_half
                sa, la = f(0, parts[0], parts[1])
                sb, lb = f(1, parts[2], parts[3])
                return sa + la + sb + lb
            return br

        return jax.lax.cond(do_leaf, both(True), both(False), carry)

    def cond(carry):
        alive = jnp.zeros((), bool)
        for v in carry:
            alive |= v > 0
        return alive

    init = (
        tuple([sp0] * ROWS) + tuple([ln0] * ROWS)
        + tuple([sp0] * ROWS) + tuple([ln0] * ROWS)
    )
    jax.lax.while_loop(cond, body, init)


_SP2 = pl.BlockSpec((1, IL * ROWS, LANES), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM)


def run_closest_v4(ox, oy, oz, dx, dy, dz, tmax, root, pmeta, pnodes, ptris):
    n_inst = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    out_shape = [
        jax.ShapeDtypeStruct((n_inst, IL * ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_inst, IL * ROWS, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_inst, IL * ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_inst, IL * ROWS, LANES), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_closest_kernel_v4, leaf_size),
        grid=(n_inst,),
        in_specs=[_SP2] * 7 + [_SMEM1, _SMEM1, _FULL, _FULL],
        out_specs=[_SP2] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((IL * ROWS * CAP,), jnp.int32),
            pltpu.SMEM((IL * ROWS * LQ,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(ox, oy, oz, dx, dy, dz, tmax, root, pmeta, pnodes, ptris)


def measure(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out[0]))
    return out, (time.perf_counter() - t0) / REPS


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.integrator.wavefront import _sort_wavefront
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.ops.pallas_subpacket import intersect_bvh_subpacket
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
    state1s = jax.jit(lambda s, d: _sort_wavefront(s, d))(state1, ds)
    float(jnp.sum(state1s.origin))

    origin, direction, alive = (state1s.origin, state1s.direction,
                                state1s.alive)

    # Production reference + timing.
    fn_p = jax.jit(lambda o, d, s, a: intersect_bvh_subpacket(
        o, d, s, 1e-3, 1e4, active_mask=a))
    rec, dt_p = measure(fn_p, origin, direction, ds, alive)
    print(f"production sub-packet closest: {dt_p*1e3:8.1f} ms", flush=True)

    # v4 tiling: [n_inst, 16, 128].
    tile = IL * ROWS * LANES
    n_inst = (n + tile - 1) // tile
    total = n_inst * tile

    @jax.jit
    def prep(origin, direction, alive):
        tm = jnp.where(alive, 1e4, 1e-3)
        comps = []
        for arr in (origin, direction):
            for ci in range(3):
                a = arr[:, ci]
                if total != n:
                    a = jnp.concatenate(
                        [a, jnp.zeros(total - n, a.dtype)])
                comps.append(a.reshape(n_inst, IL * ROWS, LANES))
        a = jnp.concatenate([tm, jnp.full(total - n, 1e-3)]) \
            if total != n else tm
        comps.append(a.reshape(n_inst, IL * ROWS, LANES))
        return comps

    rays = prep(origin, direction, alive)
    float(jnp.sum(rays[0]))
    fn4 = jax.jit(run_closest_v4)
    out, dt4 = measure(fn4, *rays, ds.root_meta, ds.pmeta, ds.pnodes,
                       ds.ptris)
    tri4 = np.asarray(out[1]).reshape(-1)[:n]
    t4 = np.asarray(out[0]).reshape(-1)[:n]
    mism = int((tri4 != np.asarray(rec.tri)).sum())
    tdif = float(np.abs(t4 - np.asarray(rec.t)).max())
    print(f"v4 2-way interleave:           {dt4*1e3:8.1f} ms  "
          f"({dt_p/dt4:.2f}x)  mism {mism}  max|dt| {tdif:.2e}", flush=True)


if __name__ == "__main__":
    main()
