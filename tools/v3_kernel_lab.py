"""v3 closest-hit prototype: per-sublane DIVERGENT sub-packet traversal.

subpacket_lab.py measured that bounce-wavefront visit unions shrink ~2.5x
going 4096 -> 128 rays (5360 -> 535 visits, max-of-8-adjacent 733) and the
leaf share drops 31% -> 17%. Mosaic allows dynamic indexing on the SUBLANE
dim, so each of the 8 sublane rows of an [8,128] tile can traverse its OWN
BVH path: per-row dynamic node/leaf row fetches, [8,1]->[8,128] lane
broadcasts (no scalar extracts for geometry), per-row SMEM stacks.

Control flow: internal visits pop one node per row per iteration; leaf pops
are DEFERRED into per-row SMEM queues and drained in batched all-row leaf
steps (one leaf block per row per step) so the 464-op M-T vector work always
retires up to 8 block visits. Deferral delays best-t shrinkage slightly
(bounded by the drain trigger), which can only ADD visits, never miss hits.

Node child metas are passed as an SMEM i32 array so pushes stay entirely on
the scalar side; the only vector->scalar traffic is one packed code extract
per row per internal step (any_l | any_r<<1 | swap<<2).
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
    BIG, TILE_L, TRI_STRIDE, _inv_dir, _FULL, _SMEM1,
)

ROWS = 8
CAP = 64       # per-row stack capacity (depth <= 40 for 300k-tri SAH trees)
LQ = 16        # per-row leaf-queue capacity
DRAIN_AT = 4   # drain leaves once any row has this many queued
WIDTH, HEIGHT = 1920, 1080
REPS = 3


def _slab_rows(ox, oy, oz, ix, iy, iz, mn, mx, t_min, t_cap):
    """AABB slab test with PER-ROW bounds: mn/mx are ([8,1],)*3."""
    t0x = (mn[0] - ox) * ix
    t1x = (mx[0] - ox) * ix
    t0y = (mn[1] - oy) * iy
    t1y = (mx[1] - oy) * iy
    t0z = (mn[2] - oz) * iz
    t1z = (mx[2] - oz) * iz
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), t_min),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), t_cap),
    )
    return t_near <= t_far, t_near


def _closest_kernel_v3(leaf_size, drain_at, variant,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref, root_ref, pmeta_ref, pnodes_ref, ptris_ref,
                       t_ref, tri_ref, u_ref, v_ref, nit_ref,
                       stack_ref, lq_ref):
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t_min = 1e-3

    t_ref[0] = tmax_ref[0]
    tri_ref[0] = jnp.full((ROWS, TILE_L), -1, jnp.int32)
    u_ref[0] = jnp.zeros((ROWS, TILE_L), jnp.float32)
    v_ref[0] = jnp.zeros((ROWS, TILE_L), jnp.float32)

    root = root_ref[0]
    sp0 = (root >= 0).astype(jnp.int32)
    ln0 = (root < 0).astype(jnp.int32)
    for r in range(ROWS):
        stack_ref[r * CAP] = root
        lq_ref[r * LQ] = ~root

    L = leaf_size

    def leaf_step(sps, lqns):
        """Pop one queued leaf block per row (rows with empty queues are
        masked) and M-T its triangles against that row's 128 rays."""
        blks = []
        valids = []
        new_lqns = []
        for r in range(ROWS):
            ln = lqns[r]
            has = ln > 0
            blk = lq_ref[r * LQ + jnp.maximum(ln - 1, 0)]
            new_lqns.append(ln - has.astype(jnp.int32))
            blks.append(jnp.where(has, blk, 0))
            valids.append(has)
        rows8 = jnp.concatenate(
            [ptris_ref[pl.ds(blks[r], 1), :] for r in range(ROWS)], axis=0
        )  # [8, leaf*12]
        # i1 vregs can't be built from scalars (bitcast_vreg limitation);
        # carry validity as f32 and compare.
        rowmask = jnp.concatenate(
            [jnp.full((1, 1), valids[r].astype(jnp.float32))
             for r in range(ROWS)], axis=0
        ) > 0.0  # [8,1]

        bt = t_ref[0]
        btri = tri_ref[0]
        bu = u_ref[0]
        bv = v_ref[0]
        for k in range(L):
            c = lambda i: rows8[:, k * TRI_STRIDE + i: k * TRI_STRIDE + i + 1]
            v0x, v0y, v0z = c(0), c(1), c(2)
            e1x, e1y, e1z = c(3), c(4), c(5)
            e2x, e2y, e2z = c(6), c(7), c(8)
            trik = c(9).astype(jnp.int32)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-10, 1.0 / det, 0.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            valid = (
                (jnp.abs(det) > 1e-10)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > t_min) & (t < bt) & rowmask
            )
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
        """Pop one INTERNAL node per row (leaves never transit the stack —
        they are routed to the leaf queue at PUSH time), slab-test its two
        children per row, and push/enqueue hit children scalar-side."""
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
            [pnodes_ref[pl.ds(nodes[r], 1), :12] for r in range(ROWS)],
            axis=0,
        )  # [8,12]
        # Fold per-row validity into the t cap: invalid rows fail every slab
        # (t_cap 0 < t_min). f32 mask avoids the unsupported i1 vreg build.
        rowmask_f = jnp.concatenate(
            [jnp.full((1, 1), valids[r].astype(jnp.float32))
             for r in range(ROWS)], axis=0
        )
        if variant == "dblread":
            # Diagnostic: issue the 8 dynamic reads TWICE (values killed by
            # a 0-multiply that can't be DCE'd) to expose read latency.
            rows8b = jnp.concatenate(
                [pnodes_ref[pl.ds(jnp.maximum(nodes[r] - 1, 0), 1), :12]
                 for r in range(ROWS)], axis=0,
            )
            rowmask_f = rowmask_f * (1.0 + 0.0 * rows8b[:, 0:1])
        t_cap = t_ref[0] * rowmask_f
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
                + 4 * swap.astype(jnp.int32))  # [8,1]
        # ONE vector->scalar extract for all rows: weight row r by 8^r and
        # sum (3 bits/row x 8 rows = 24 bits, exact in i32).
        weights = (8 ** jnp.arange(ROWS, dtype=jnp.int32))[:, None]
        code_all = jnp.sum(code * weights)

        out_sps = []
        out_lqns = []
        for r in range(ROWS):
            c = (code_all >> (3 * r)) & 7
            a_l = (c & 1) > 0
            a_r = (c & 2) > 0
            sw = (c & 4) > 0
            n = nodes[r]
            lmeta = pmeta_ref[2 * n]
            rmeta = pmeta_ref[2 * n + 1]
            m_near = jnp.where(sw, rmeta, lmeta)
            m_far = jnp.where(sw, lmeta, rmeta)
            p_near = jnp.where(sw, a_r, a_l).astype(jnp.int32)
            p_far = jnp.where(sw, a_l, a_r).astype(jnp.int32)
            sp = new_sps[r]
            ln = lqns[r]
            # Route far child: stack if internal, leaf queue if leaf.
            far_leaf = (m_far < 0).astype(jnp.int32)
            stack_ref[r * CAP + sp] = m_far
            if variant != "nocond":
                lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~m_far
            sp = sp + p_far * (1 - far_leaf)
            if variant != "nocond":  # dropped leaves must not count, or
                ln = ln + p_far * far_leaf  # the while-cond never clears

            # Route near child.
            near_leaf = (m_near < 0).astype(jnp.int32)
            stack_ref[r * CAP + jnp.minimum(sp, CAP - 1)] = m_near
            if variant != "nocond":
                lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~m_near
            sp = sp + p_near * (1 - near_leaf)
            if variant != "nocond":
                ln = ln + p_near * near_leaf

            out_sps.append(sp)
            out_lqns.append(ln)
        return tuple(out_sps), tuple(out_lqns)

    def body(carry):
        sps = carry[:ROWS]
        lqns = carry[ROWS:2 * ROWS]
        nit, nlf = carry[-2], carry[-1]
        # Drain leaves when any queue is deep, would overflow, or a row has
        # nothing left but queued leaves.
        if variant == "nocond":
            # Diagnostic: straight-line internal-only loop (leaves dropped
            # at push time) -- WRONG results, isolates cond/leaf overhead.
            sps, lqns = internal_step(sps, lqns)
            return sps + lqns + (nit + 1, nlf)
        do_leaf = jnp.zeros((), bool)
        for r in range(ROWS):
            do_leaf |= lqns[r] >= drain_at
            do_leaf |= (sps[r] == 0) & (lqns[r] > 0)
        sps, lqns = jax.lax.cond(do_leaf, leaf_step, internal_step, sps, lqns)
        return sps + lqns + (nit + 1, nlf + do_leaf.astype(jnp.int32))

    def cond(carry):
        alive = jnp.zeros((), bool)
        for v in carry[:2 * ROWS]:
            alive |= v > 0
        return alive

    init = tuple([sp0] * ROWS) + tuple([ln0] * ROWS) + (
        jnp.int32(0), jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, init)
    nit_ref[0] = jnp.full((ROWS, TILE_L), out[-2], jnp.int32)
    nit_ref[0, 1] = jnp.full((TILE_L,), out[-1], jnp.int32)


def run_closest_v3(ox, oy, oz, dx, dy, dz, tmax, root, pmeta, pnodes, ptris,
                   drain_at=DRAIN_AT, variant="base"):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    spec = pl.BlockSpec((1, ROWS, TILE_L), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, ROWS, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, TILE_L), jnp.int32),
    ]
    return pl.pallas_call(
        functools.partial(_closest_kernel_v3, leaf_size, drain_at, variant),
        grid=(n_tiles,),
        in_specs=[spec] * 7 + [_SMEM1, _SMEM1, _FULL, _FULL],
        out_specs=[spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((ROWS * CAP,), jnp.int32),
            pltpu.SMEM((ROWS * LQ,), jnp.int32),
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
    from tools.sort_lab import sl_make_state1, _primary_rays
    from raytracer_tpu.integrator.wavefront import _sort_wavefront
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.ops.pallas_traverse import intersect_bvh_pallas
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    ds, _ = bake_scene(scene, leaf_size=8)
    # Child metas, scalar-side: pmeta[2n] = left, pmeta[2n+1] = right.
    pn = np.asarray(ds.pnodes)
    pmeta = jnp.asarray(
        np.stack([pn[:, 12], pn[:, 13]], axis=1).reshape(-1).astype(np.int32)
    )
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    state1 = sl_make_state1(ds, ubo, cfg, n)
    state1s = jax.jit(lambda s, d: _sort_wavefront(s, d))(state1, ds)
    float(jnp.sum(state1s.origin))
    o0, d0, a0 = _primary_rays(ds, ubo, cfg, n)

    tile = ROWS * TILE_L
    nt = (n + tile - 1) // tile

    for label, (origin, direction, alive) in (
        ("primary", (o0, d0, a0)),
        ("bounce1", (state1s.origin, state1s.direction, state1s.alive)),
    ):
        rec = intersect_bvh_pallas(origin, direction, ds, 1e-3, 1e4,
                                   active_mask=alive)
        ref_tri = np.asarray(rec.tri)
        ref_t = np.asarray(rec.t)

        @jax.jit
        def prep(origin, direction, alive):
            tm = jnp.where(alive, 1e4, 1e-3)
            comps = []
            for arr in (origin, direction):
                for c in range(3):
                    a = arr[:, c]
                    total = nt * tile
                    if total != n:
                        a = jnp.concatenate([a, jnp.zeros(total - n, a.dtype)])
                    comps.append(a.reshape(nt, ROWS, TILE_L))
            a = jnp.concatenate([tm, jnp.full(nt * tile - n, 1e-3)])
            comps.append(a.reshape(nt, ROWS, TILE_L))
            return comps

        rays = prep(origin, direction, alive)
        float(jnp.sum(rays[0]))
        for drain_at, variant in ((4, "base"), (4, "nocond")):
            fn = jax.jit(functools.partial(run_closest_v3,
                                           drain_at=drain_at,
                                           variant=variant))
            out, dt = measure(fn, *rays, ds.root_meta, pmeta, ds.pnodes,
                              ds.ptris)
            tri = np.asarray(out[1]).reshape(-1)[:n]
            t = np.asarray(out[0]).reshape(-1)[:n]
            iters = np.asarray(out[4][:, 0, 0])
            leafi = np.asarray(out[4][:, 1, 0])
            mism = (tri != ref_tri) & ~np.isclose(t, ref_t, rtol=1e-5)
            print(f"{label:8s} v3 {variant} drain{drain_at:2d}: "
                  f"{dt*1e3:8.1f} ms  "
                  f"mism {int(mism.sum())}  iters mean {iters.mean():.0f} "
                  f"p90 {np.percentile(iters, 90):.0f}  leaf-iters "
                  f"{leafi.mean():.0f}", flush=True)


if __name__ == "__main__":
    main()
