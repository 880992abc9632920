"""8-wide (oct) BVH sub-packet kernel — the VERDICT-mandated measurement.

The 4-ary collapse won 1.11x because an iteration costs ~394 cyc of serial
latency against ~70 cyc of VPU, so fewer+fatter iterations win. The 8-ary
step doubles the per-iteration row read ([8,64] vs [8,32]), doubles the
min-reductions (8 vs 4), doubles the extract payload (12 bits/row vs 7 ->
4 packed extracts vs 2) and doubles the scalar routing loop — against ~40%
fewer internal pops. ARCHITECTURE.md estimated "under 5%"; this measures it.

Collapse: children of an oct node are its binary GREAT-grandchildren (3
levels), with leaves absorbed wherever they appear. Leaf blocks and their
visit tie-breaking are shared with the binary/quad layouts.

Run: `python -u tools/r3_oct_lab.py` (TPU) or `--cpu` (interpret check).
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
    _FULL, _SMEM1, _SP_SPEC, _pop_leaves, _read_leaf_rows, _rowmask_f,
    _slab_rows, _moller_rows,
)
from raytracer_tpu.ops.pallas_traverse import _inv_dir  # noqa: E402

BIG = float(np.float32(3.0e38))
WIDTH, HEIGHT = 1920, 1080
REPS = 3


def collapse_bvh8(bvh):
    """Returns (onodes f32[N8,64], ometa i32[8*N8], oroot i32[1],
    stack_need). Row: 8x (min.xyz, max.xyz) = 48 floats at cols 0:48, the 8
    child metas as exact-int f32 at cols 48:56 (oct id >= 0, ~leaf < 0).
    ABSENT children get NaN boxes (guaranteed slab miss)."""
    is_leaf = bvh.nodes_count > 0
    skip = bvh.nodes_skip
    if is_leaf[0]:
        onodes = np.full((1, 64), np.nan, np.float32)
        onodes[:, 56:] = 0.0
        return onodes, np.zeros((8,), np.int32), np.asarray([~0], np.int32), 8

    leaf_ids = (np.cumsum(is_leaf) - 1).astype(np.int64)
    oct_of = {}
    order = []
    children_of = {}
    depth8 = {0: 0}
    max_d8 = 0
    stack = [0]
    while stack:
        x = stack.pop()
        oct_of[x] = len(order)
        order.append(x)
        kids = []

        def descend(c, level):
            if is_leaf[c] or level == 3:
                kids.append(
                    ("leaf", int(leaf_ids[c]), c) if is_leaf[c]
                    else ("oct", None, c)
                )
                return
            cl = c + 1
            cr = int(skip[cl])
            descend(cl, level + 1)
            descend(cr, level + 1)

        descend(x + 1, 1)
        descend(int(skip[x + 1]), 1)
        children_of[x] = kids
        for kind, _, node in reversed(kids):
            if kind == "oct":
                depth8[node] = depth8[x] + 1
                max_d8 = max(max_d8, depth8[node])
                stack.append(node)

    n8 = len(order)
    assert n8 < (1 << 24)
    onodes = np.full((n8, 64), np.nan, np.float32)
    onodes[:, 56:] = 0.0
    ometa = np.zeros((8 * n8,), np.int32)
    for x in order:
        oid = oct_of[x]
        row = onodes[oid]
        for c, (kind, lid, node) in enumerate(children_of[x]):
            row[6 * c: 6 * c + 3] = bvh.nodes_min[node]
            row[6 * c + 3: 6 * c + 6] = bvh.nodes_max[node]
            meta = ~lid if kind == "leaf" else oct_of[node]
            row[48 + c] = np.float32(meta)
            ometa[8 * oid + c] = meta
    # An 8-ary DFS holds <= 7 entries per level.
    return onodes, ometa, np.asarray([0], np.int32), 7 * (max_d8 + 1) + 1


def _closest_kernel8(leaf_size,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmax_ref, root_ref, ometa_ref, onodes_ref, ptris_ref,
                     t_ref, tri_ref, u_ref, v_ref, stack_ref, lq_ref):
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t_min = 1e-3

    t_ref[0] = tmax_ref[0]
    tri_ref[0] = jnp.full((ROWS, LANES), -1, jnp.int32)
    u_ref[0] = jnp.zeros((ROWS, LANES), jnp.float32)
    v_ref[0] = jnp.zeros((ROWS, LANES), jnp.float32)

    root = root_ref[0]
    sp0 = (root >= 0).astype(jnp.int32)
    ln0 = (root < 0).astype(jnp.int32)
    for r in range(ROWS):
        stack_ref[r * CAP] = root
        lq_ref[r * LQ] = ~root

    def leaf_step(sps, lqns):
        blks, valids, new_lqns = _pop_leaves(lq_ref, lqns)
        rows8 = _read_leaf_rows(ptris_ref, blks)
        rowmask = _rowmask_f(valids) > 0.0
        bt = t_ref[0]
        btri = tri_ref[0]
        bu = u_ref[0]
        bv = v_ref[0]
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
        t_ref[0] = bt
        tri_ref[0] = btri
        u_ref[0] = bu
        v_ref[0] = bv
        return sps, tuple(new_lqns)

    def internal_step(sps, lqns):
        nodes = []
        valids = []
        new_sps = []
        for r in range(ROWS):
            sp = sps[r]
            has = sp > 0
            meta = stack_ref[r * CAP + jnp.maximum(sp - 1, 0)]
            new_sps.append(sp - has.astype(jnp.int32))
            nodes.append(jnp.where(has, meta, 0))
            valids.append(has)
        rows8 = jnp.concatenate(
            [onodes_ref[pl.ds(nodes[r], 1), :64] for r in range(ROWS)],
            axis=0,
        )  # [8,64]
        t_cap = t_ref[0] * _rowmask_f(valids)
        col = lambda i: rows8[:, i: i + 1]
        tns = []
        for c in range(8):
            h, tn = _slab_rows(
                ox, oy, oz, ix, iy, iz,
                (col(6 * c), col(6 * c + 1), col(6 * c + 2)),
                (col(6 * c + 3), col(6 * c + 4), col(6 * c + 5)),
                t_min, t_cap,
            )
            tns.append(jnp.min(jnp.where(h, tn, BIG), axis=1, keepdims=True))
        any_h = [tn < BIG for tn in tns]
        # 3-bit argmin via a tournament.
        m = list(tns)
        b01 = (m[1] < m[0]).astype(jnp.int32)
        b23 = (m[3] < m[2]).astype(jnp.int32)
        b45 = (m[5] < m[4]).astype(jnp.int32)
        b67 = (m[7] < m[6]).astype(jnp.int32)
        m01 = jnp.minimum(m[0], m[1])
        m23 = jnp.minimum(m[2], m[3])
        m45 = jnp.minimum(m[4], m[5])
        m67 = jnp.minimum(m[6], m[7])
        lo_hi = (m23 < m01).astype(jnp.int32)
        hi_hi = (m67 < m45).astype(jnp.int32)
        mlo = jnp.minimum(m01, m23)
        mhi = jnp.minimum(m45, m67)
        use_hi = (mhi < mlo).astype(jnp.int32)
        near_lo = jnp.where(lo_hi > 0, 2 + b23, b01)
        near_hi = jnp.where(hi_hi > 0, 6 + b67, 4 + b45)
        near = jnp.where(use_hi > 0, near_hi, near_lo)  # [8,1] in 0..7
        code = near * 256
        for c in range(8):
            code = code + (1 << c) * any_h[c].astype(jnp.int32)
        # 12 bits/row -> 2 rows per scalar (weights 4096**{0,1}) -> 4 scalars.
        w2 = (4096 ** jnp.arange(2, dtype=jnp.int32))[:, None]
        packs = [jnp.sum(code[2 * i: 2 * i + 2] * w2) for i in range(4)]

        out_sps = []
        out_lqns = []
        for r in range(ROWS):
            cr = (packs[r // 2] >> (12 * (r % 2))) & 4095
            n = nodes[r]
            sp = new_sps[r]
            ln = lqns[r]
            p_near = jnp.int32(0)
            meta_near = jnp.int32(0)
            for c in range(8):
                hit_c = (cr >> c) & 1
                is_near = ((cr >> 8) & 15) == c
                p = hit_c * (1 - is_near.astype(jnp.int32))
                meta = ometa_ref[8 * n + c]
                is_leaf = (meta < 0).astype(jnp.int32)
                stack_ref[r * CAP + jnp.minimum(sp, CAP - 1)] = meta
                lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~meta
                sp = sp + p * (1 - is_leaf)
                ln = ln + p * is_leaf
                p_near = p_near + hit_c * is_near.astype(jnp.int32)
                meta_near = jnp.where(is_near, meta, meta_near)
            is_leaf_n = (meta_near < 0).astype(jnp.int32)
            stack_ref[r * CAP + jnp.minimum(sp, CAP - 1)] = meta_near
            lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~meta_near
            sp = sp + p_near * (1 - is_leaf_n)
            ln = ln + p_near * is_leaf_n
            out_sps.append(sp)
            out_lqns.append(ln)
        return tuple(out_sps), tuple(out_lqns)

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


def run_closest8(ox, oy, oz, dx, dy, dz, tmax, root, ometa, onodes, ptris,
                 interpret=False):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_closest_kernel8, leaf_size),
        grid=(n_tiles,),
        in_specs=[_SP_SPEC] * 7 + [_SMEM1, _SMEM1, _FULL, _FULL],
        out_specs=[_SP_SPEC] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((ROWS * CAP,), jnp.int32),
            pltpu.SMEM((ROWS * LQ,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tmax, root, ometa, onodes, ptris)


def cpu_check():
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    from raytracer_tpu.ops.traverse import intersect_bvh
    from tests.conftest import make_traversal_scene

    rng = np.random.default_rng(11)
    t, r = 400, 1024
    v0 = rng.uniform(-4, 4, (t, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    scene = make_traversal_scene(v0, e1, e2, leaf_size=8)
    on, om, orr, need = collapse_bvh8(scene.bvh)
    print(f"oct nodes {on.shape[0]}, stack need {need}", flush=True)
    o = rng.uniform(-5, 5, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = intersect_bvh(jnp.asarray(o), jnp.asarray(d), scene, 1e-3, 1e4)

    tile = ROWS * LANES
    nt = (r + tile - 1) // tile
    total = nt * tile
    comps = []
    for arr in (o, d):
        for ci in range(3):
            a = np.concatenate([arr[:, ci], np.zeros(total - r, np.float32)])
            comps.append(jnp.asarray(a.reshape(nt, ROWS, LANES)))
    tm = np.concatenate([np.full(r, 1e4, np.float32),
                         np.full(total - r, 1e-3, np.float32)])
    comps.append(jnp.asarray(tm.reshape(nt, ROWS, LANES)))
    out = run_closest8(*comps, jnp.asarray(orr), jnp.asarray(om),
                       jnp.asarray(on), scene.ptris, interpret=True)
    tri = np.asarray(out[1]).reshape(-1)[:r]
    tv = np.asarray(out[0]).reshape(-1)[:r]
    hits = np.asarray(ref.hit)
    mism_hit = int((hits != (tri >= 0)).sum())
    mism_tri = int((np.asarray(ref.tri)[hits] != tri[hits]).sum())
    terr = (float(np.abs(np.asarray(ref.t)[hits] - tv[hits]).max())
            if hits.any() else 0)
    print(f"cpu_check oct: hit-mism {mism_hit}  tri-mism {mism_tri}  "
          f"max|dt| {terr:.2e}", flush=True)
    return mism_hit == 0 and mism_tri == 0


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.integrator.wavefront import _sort_wavefront
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.ops.pallas_subpacket import intersect_bvh_subpacket
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    ds, bvh = bake_scene(scene, leaf_size=8)
    t0 = time.perf_counter()
    onodes, ometa, oroot, need = collapse_bvh8(bvh)
    print(f"oct collapse: {time.perf_counter()-t0:.1f}s, "
          f"{onodes.shape[0]} oct nodes (quad {ds.qnodes.shape[0]}), "
          f"stack need {need}", flush=True)
    assert need <= CAP
    onodes = jnp.asarray(onodes)
    ometa = jnp.asarray(ometa)
    oroot = jnp.asarray(oroot)

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

    def measure(fn, *args):
        out = fn(*args)
        float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
            float(jnp.sum(out[0]))
        return out, (time.perf_counter() - t0) / REPS

    fn_p = jax.jit(lambda o, d, s, a: intersect_bvh_subpacket(
        o, d, s, 1e-3, 1e4, active_mask=a))
    rec, dt_p = measure(fn_p, origin, direction, ds, alive)
    print(f"production quad closest:   {dt_p*1e3:8.1f} ms", flush=True)

    tile = ROWS * LANES
    nt = (n + tile - 1) // tile
    total = nt * tile

    @jax.jit
    def prep(origin, direction, alive):
        tm = jnp.where(alive, 1e4, 1e-3)
        comps = []
        for arr in (origin, direction):
            for ci in range(3):
                a = arr[:, ci]
                if total != n:
                    a = jnp.concatenate([a, jnp.zeros(total - n, a.dtype)])
                comps.append(a.reshape(nt, ROWS, LANES))
        a = (jnp.concatenate([tm, jnp.full(total - n, 1e-3)])
             if total != n else tm)
        comps.append(a.reshape(nt, ROWS, LANES))
        return comps

    rays = prep(origin, direction, alive)
    float(jnp.sum(rays[0]))
    fn8 = jax.jit(run_closest8)
    out, dt8 = measure(fn8, *rays, oroot, ometa, onodes, ds.ptris)
    tri8 = np.asarray(out[1]).reshape(-1)[:n]
    mism = int((tri8 != np.asarray(rec.tri)).sum())
    print(f"oct closest:               {dt8*1e3:8.1f} ms  "
          f"({dt_p/dt8:.3f}x)  mism {mism}", flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        sys.exit(0 if cpu_check() else 1)
    main()
