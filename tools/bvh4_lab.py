"""BVH4 prototype: collapse the binary SAH tree so ONE internal step tests
4 children from ONE dynamic row read.

Motivation (tools/v3_kernel_lab.py nocond probe): a sub-packet traversal
iteration costs ~394 cyc of serial pop/read/test/extract/route latency
against ~70 cyc of slab VPU — so halving the NUMBER of internal iterations
(4-ary pops) buys more than any per-iteration shaving. Leaf blocks and the
leaf queue machinery are unchanged (the collapse only rewrites internal
topology; leaf ids are preserved), so leaf visit order — and hence all
tie-breaks — match the production kernel wherever child ordering does.

Child ordering: the nearest hit child is pushed LAST (popped first); the
remaining hit children push in fixed child order. Binary DFS orders near
subtrees first at EVERY level, so BVH4 pruning is slightly weaker — the
measured visit delta is part of the go/no-go.
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
    _FULL, _SMEM1, _moller_rows, _pop_leaves, _read_leaf_rows, _rowmask_f,
    _slab_rows,
)
from raytracer_tpu.ops.pallas_traverse import _inv_dir  # noqa: E402

BIG = float(np.float32(3.0e38))
ORDERED = "--noorder" not in sys.argv
WIDTH, HEIGHT = 1920, 1080
REPS = 3


# --------------------------------------------------------------------------
# Collapse: binary flattened preorder -> 4-wide nodes.
# Binary metas (pallas convention): >= 0 internal row id, < 0 => ~leaf_block.
# --------------------------------------------------------------------------

def collapse_bvh4(bvh):
    """Returns (pnodes4 f32[N4, 32], pmeta4 i32[4*N4], root4 i32[1]).

    pnodes4 row: 4x (min.xyz, max.xyz) = 24 floats, then 4 child metas as
    exact-int f32 (quad-node id >= 0, ~leaf_block < 0); missing children get
    NaN boxes (every slab comparison is false -> guaranteed miss; an
    INVERTED box does NOT work: the slab's per-axis min/max normalizes it
    into an infinite interval that hits everything) and meta 0."""
    nn = bvh.num_nodes
    is_leaf = bvh.nodes_count > 0
    skip = bvh.nodes_skip

    # A quad node is built for every binary internal node whose parent
    # didn't absorb it. Roots of absorption: the tree root (if internal) and
    # any internal grandchild... operationally: walk top-down, absorbing
    # internal children's children.
    if is_leaf[0]:
        # Single-leaf scene: no internal nodes at all.
        return (
            np.full((1, 32), 0, np.float32),
            np.zeros((4,), np.int32),
            np.asarray([-1], np.int32),  # handled by caller via root meta
        )

    leaf_ids = (np.cumsum(is_leaf) - 1).astype(np.int64)

    quad_of = {}  # binary internal node -> quad id (for absorption roots)
    order = []  # absorption-root binary nodes in preorder
    stack = [0]
    children_of = {}
    while stack:
        x = stack.pop()
        # x is an internal binary node that becomes a quad node.
        qid = len(order)
        quad_of[x] = qid
        order.append(x)
        l = x + 1
        r = int(skip[l])
        kids = []
        for c in (l, r):
            if is_leaf[c]:
                kids.append(("leaf", int(leaf_ids[c]), c))
            else:
                cl = c + 1
                cr = int(skip[cl])
                for g in (cl, cr):
                    if is_leaf[g]:
                        kids.append(("leaf", int(leaf_ids[g]), g))
                    else:
                        kids.append(("quad", None, g))
        children_of[x] = kids
        for kind, _, node in reversed(kids):
            if kind == "quad":
                stack.append(node)

    n4 = len(order)
    pnodes4 = np.zeros((n4, 32), np.float32)
    pmeta4 = np.zeros((4 * n4,), np.int32)
    for x in order:
        qid = quad_of[x]
        row = pnodes4[qid]
        row[:] = 0.0
        row[0:24] = np.nan  # absent children: NaN boxes never hit
        for c, (kind, lid, node) in enumerate(children_of[x]):
            row[6 * c + 0: 6 * c + 3] = bvh.nodes_min[node]
            row[6 * c + 3: 6 * c + 6] = bvh.nodes_max[node]
            meta = ~lid if kind == "leaf" else quad_of[node]
            row[24 + c] = np.float32(meta)
            pmeta4[4 * qid + c] = meta
    root4 = np.asarray([0], np.int32)
    assert n4 < (1 << 24)
    return pnodes4, pmeta4, root4


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

def _pop_rows4(stack_ref, sps):
    nodes, valids, new_sps = [], [], []
    for r in range(ROWS):
        sp = sps[r]
        has = sp > 0
        meta = stack_ref[r * CAP + jnp.maximum(sp - 1, 0)]
        new_sps.append(sp - has.astype(jnp.int32))
        nodes.append(jnp.where(has, meta, 0))
        valids.append(has)
    return nodes, valids, new_sps


def _closest_kernel4(leaf_size,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmax_ref, root_ref, pmeta_ref, pnodes_ref, ptris_ref,
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
        # Identical to the production kernel's leaf step (leaf blocks and
        # queue machinery are untouched by the 4-ary collapse).
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
        nodes, valids, new_sps = _pop_rows4(stack_ref, sps)
        rows8 = jnp.concatenate(
            [pnodes_ref[pl.ds(nodes[r], 1), :32] for r in range(ROWS)],
            axis=0,
        )  # [8,28]
        t_cap = t_ref[0] * _rowmask_f(valids)
        col = lambda i: rows8[:, i: i + 1]
        hits = []
        tns = []
        for c in range(4):
            h, tn = _slab_rows(
                ox, oy, oz, ix, iy, iz,
                (col(6 * c), col(6 * c + 1), col(6 * c + 2)),
                (col(6 * c + 3), col(6 * c + 4), col(6 * c + 5)),
                t_min, t_cap,
            )
            hits.append(h)
            tns.append(jnp.min(jnp.where(h, tn, BIG), axis=1, keepdims=True))
        any_h = [tn < BIG for tn in tns]
        if ORDERED:
            # nearest child index (2 bits): argmin over the 4 per-row minima.
            m01 = jnp.minimum(tns[0], tns[1])
            m23 = jnp.minimum(tns[2], tns[3])
            b0 = (tns[1] < tns[0]).astype(jnp.int32)
            b1 = (tns[3] < tns[2]).astype(jnp.int32)
            use_hi = (m23 < m01).astype(jnp.int32)
            near = jnp.where(use_hi > 0, 2 + b1, b0)  # [8,1]
        else:
            near = jnp.zeros_like(tns[0]).astype(jnp.int32) + 4  # none
        code = (
            any_h[0].astype(jnp.int32)
            + 2 * any_h[1].astype(jnp.int32)
            + 4 * any_h[2].astype(jnp.int32)
            + 8 * any_h[3].astype(jnp.int32)
            + 16 * near
        )  # 4 hit bits + 3 near bits per row
        w_lo = (128 ** jnp.arange(4, dtype=jnp.int32))[:, None]
        code_lo = jnp.sum(code[0:4] * w_lo)
        code_hi = jnp.sum(code[4:8] * w_lo)

        out_sps = []
        out_lqns = []
        for r in range(ROWS):
            cr = ((code_lo if r < 4 else code_hi) >> (7 * (r % 4))) & 127
            n = nodes[r]
            sp = new_sps[r]
            ln = lqns[r]
            p_near = jnp.int32(0)
            meta_near = jnp.int32(0)
            for c in range(4):
                hit_c = (cr >> c) & 1
                is_near = ((cr >> 4) & 7) == c
                p = hit_c * (1 - is_near.astype(jnp.int32))
                meta = pmeta_ref[4 * n + c]
                is_leaf = (meta < 0).astype(jnp.int32)
                stack_ref[r * CAP + jnp.minimum(sp, CAP - 1)] = meta
                lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~meta
                sp = sp + p * (1 - is_leaf)
                ln = ln + p * is_leaf
                p_near = p_near + hit_c * is_near.astype(jnp.int32)
                meta_near = jnp.where(is_near, meta, meta_near)
            if ORDERED:
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
        sps, lqns = jax.lax.cond(do_leaf, leaf_step, internal_step, sps,
                                 lqns)
        return sps + lqns

    def cond(carry):
        alive = jnp.zeros((), bool)
        for v in carry[:-1]:
            alive |= v > 0
        return alive & (carry[-1] < 100000)

    def body_c(carry):
        out = body(carry[:-1])
        return out + (carry[-1] + 1,)

    jax.lax.while_loop(
        cond, body_c,
        tuple([sp0] * ROWS) + tuple([ln0] * ROWS) + (jnp.int32(0),)
    )


_SP_SPEC = pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def run_closest4(ox, oy, oz, dx, dy, dz, tmax, root4, pmeta4, pnodes4,
                 ptris, interpret=False):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_closest_kernel4, leaf_size),
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
    )(ox, oy, oz, dx, dy, dz, tmax, root4, pmeta4, pnodes4, ptris)


def measure(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out[0]))
    return out, (time.perf_counter() - t0) / REPS


def cpu_check():
    """Interpret-mode correctness check vs the XLA walk on a small scene."""
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    from raytracer_tpu.accel.bvh import build_bvh_numpy
    from raytracer_tpu.ops.traverse import intersect_bvh
    from tests.conftest import make_traversal_scene

    rng = np.random.default_rng(11)
    t, r = 200, 256
    v0 = rng.uniform(-4, 4, (t, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    scene = make_traversal_scene(v0, e1, e2, leaf_size=8)
    p4, m4, r4 = collapse_bvh4(scene.bvh)
    o = rng.uniform(-5, 5, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    if "--dup" in sys.argv:
        # Duplicate the first 128 rays into every ray slot: all 8 rows of
        # the tile carry identical content, so per-row results must agree.
        for arr in (o, d):
            for k in range(1, (r + 127) // 128):
                arr[128 * k: 128 * (k + 1)] = arr[:128][: max(0, min(128, r - 128 * k))]
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
    out = run_closest4(*comps, jnp.asarray(r4), jnp.asarray(m4),
                       jnp.asarray(p4), scene.ptris, interpret=True)
    tri4 = np.asarray(out[1]).reshape(-1)[:r]
    t4 = np.asarray(out[0]).reshape(-1)[:r]
    hits = np.asarray(ref.hit)
    if "--dup" in sys.argv:
        got_rows = tri4.reshape(-1, 128)
        for k in range(1, got_rows.shape[0]):
            dd = int((got_rows[k] != got_rows[0]).sum())
            print(f"  row {k} vs row 0: {dd} diffs", flush=True)
    bad = np.nonzero(hits != (tri4 >= 0))[0]
    if len(bad) and "--one" in sys.argv:
        i = int(bad[0])
        print(f"repro ray {i}: o={o[i]} d={d[i]} ref_tri={int(np.asarray(ref.tri)[i])} "
              f"ref_t={float(np.asarray(ref.t)[i]):.4f} got_tri={int(tri4[i])}",
              flush=True)
        # rerun with ONLY this ray (row 0, lane 0)
        comps1 = []
        for arr in (o, d):
            for ci in range(3):
                a = np.zeros(1024, np.float32)
                a[0] = arr[i, ci]
                comps1.append(jnp.asarray(a.reshape(1, ROWS, LANES)))
        tm1 = np.full(1024, 1e-3, np.float32); tm1[0] = 1e4
        comps1.append(jnp.asarray(tm1.reshape(1, ROWS, LANES)))
        out1 = run_closest4(*comps1, jnp.asarray(r4), jnp.asarray(m4),
                            jnp.asarray(p4), scene.ptris, interpret=True)
        print(f"solo rerun: tri={int(np.asarray(out1[1]).reshape(-1)[0])} "
              f"t={float(np.asarray(out1[0]).reshape(-1)[0]):.4f}", flush=True)
    mism_hit = int((hits != (tri4 >= 0)).sum())
    mism_tri = int((np.asarray(ref.tri)[hits] != tri4[hits]).sum())
    terr = float(np.abs(np.asarray(ref.t)[hits] - t4[hits]).max()) if hits.any() else 0
    print(f"cpu_check: hit-mism {mism_hit}  tri-mism {mism_tri}  "
          f"max|dt| {terr:.2e}", flush=True)


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
    ds, bvh = bake_scene(scene, leaf_size=8)
    t0 = time.perf_counter()
    pnodes4, pmeta4, root4 = collapse_bvh4(bvh)
    print(f"collapse: {time.perf_counter()-t0:.2f}s, "
          f"{pnodes4.shape[0]} quad nodes (binary internals "
          f"{int((bvh.nodes_count == 0).sum())})", flush=True)
    pnodes4 = jnp.asarray(pnodes4)
    pmeta4 = jnp.asarray(pmeta4)
    root4 = jnp.asarray(root4)

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

    fn_p = jax.jit(lambda o, d, s, a: intersect_bvh_subpacket(
        o, d, s, 1e-3, 1e4, active_mask=a))
    rec, dt_p = measure(fn_p, origin, direction, ds, alive)
    print(f"binary sub-packet closest: {dt_p*1e3:8.1f} ms", flush=True)

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
    fn4 = jax.jit(run_closest4)
    out, dt4 = measure(fn4, *rays, root4, pmeta4, pnodes4, ds.ptris)
    tri4 = np.asarray(out[1]).reshape(-1)[:n]
    t4 = np.asarray(out[0]).reshape(-1)[:n]
    mism = int((tri4 != np.asarray(rec.tri)).sum())
    tdif = float(np.abs(np.where(np.isfinite(t4), t4, 0)
                        - np.where(np.isfinite(np.asarray(rec.t)),
                                   np.asarray(rec.t), 0)).max())
    print(f"BVH4 closest:              {dt4*1e3:8.1f} ms  "
          f"({dt_p/dt4:.2f}x)  mism {mism}  max|dt| {tdif:.2e}", flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        cpu_check()
    else:
        main()
