"""Divergent sub-packet traversal — the production Pallas `traceRayEXT`.

The predecessor kernel (ops/pallas_traverse.py) traverses one shared BVH
path per 4096-ray packet; its cost is the UNION of the packet's visits, and
for bounce wavefronts that union over-tests rays against leaves by 45-113x.
Measured on the 300k-tri bench wavefront (tools/subpacket_lab.py): shrinking
the packet 4096 -> 128 rays cuts total visit-iterations ~2.5x (5360 ->
535/128-group) and the leaf share from 31% to 17%.

This kernel exploits the one form of divergence Mosaic allows — dynamic
indices on the SUBLANE dim — to give every sublane row of an [8,128] tile its
OWN traversal over a 4-WIDE collapsed tree (accel/bvh.py:collapse_bvh4):

  - per-row dynamic fetches: 8 independent quad-node (or leaf-block) rows
    are concatenated to an [8,32] (or [8, leaf*12]) block, so each row's
    child bounds / triangle components are [8,1] columns lane-broadcast
    against that row's 128 rays — zero per-scalar VMEM extracts (what made
    small packets lose in the predecessor's experiments),
  - 4-ary nodes because a traversal iteration costs ~394 cyc of serial
    pop/read/test/extract/route latency against ~70 cyc of slab VPU
    (tools/v3_kernel_lab.py nocond probe): one row read serves 4 child
    tests, halving the number of internal iterations,
  - per-row SMEM stacks (CAP entries each) driven by the scalar core; child
    metas come from the SMEM `qmeta` array so push routing never touches the
    vector units; the only vector->scalar traffic is TWO packed extracts per
    internal step (7 bits/row: 4 hit bits + nearest-child index, 128**r
    weighted over 4 rows each). The nearest hit child is pushed last
    (popped first); the remaining hit children keep fixed child order,
  - leaf visits are routed to per-row SMEM queues at PUSH time and drained
    in batched all-row leaf steps, so the ~58-op/tri Moller-Trumbore always
    retires up to 8 block visits per iteration. Deferral delays best-t
    shrinkage by at most a few iterations (drain trigger DRAIN_AT), which can
    only add visits, never change results. Leaf blocks and their visit
    tie-breaking are IDENTICAL to the binary layouts (the collapse rewrites
    only internal topology).

Measured (1080p 300k tris, bounce-1 closest): packet kernel 1.10 s ->
binary sub-packet 0.77 s (tools/v3_kernel_lab.py) -> quad sub-packet
0.69 s (tools/bvh4_lab.py), all hit-identical on the bench wavefront.

Reference behavior: one fixed-function traceRayEXT per ray
(shaders/simple.rgen:92-104), rayQueryEXT for shadows
(shaders/simple.rchit:350-385).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.intersect import HitRecord
from raytracer_tpu.ops.pallas_traverse import _inv_dir

ROWS = 8
# 256 rays (2 vregs) per row: a traversal iteration costs ~394 cyc of
# serial pop/read/extract/route latency against ~70 cyc of VPU slab work,
# so doubling the rays each iteration serves amortizes the serial cost
# faster than the 256-ray visit-union grows. Measured on the bounce-1 bench
# wavefront (tools/r3_lanes_lab.py): closest 686 -> 575 ms (1.19x),
# occlusion 726 -> 614 ms (1.18x), hit-identical; 512 lanes is flat vs 256
# on closest and starts changing razor-edge tie-breaks.
LANES = 256
TILE = ROWS * LANES
CAP = 64      # per-row stack capacity; only internal nodes transit the stack
LQ = 16       # per-row leaf-queue capacity (bounded by DRAIN_AT + 2 per step)
DRAIN_AT = 4  # drain leaves once any row has this many queued
TRI_STRIDE = 12
# Mosaic VMEM ceiling for the traversal kernels. The packed arrays ride as
# _FULL residents, so this bounds the single-part scene size; labs may raise
# it toward the chip's 128 MB to probe beyond-budget bakes.
VMEM_LIMIT_BYTES = 112 * 1024 * 1024
BIG = float(np.float32(3.0e38))

# Tiles per pallas_call (same rays-per-group as before the lane widening;
# groups are lax.map-serialized to bound XLA's scoped-VMEM allocation).
GROUP_TILES = 1024

_FULL = pl.BlockSpec(memory_space=pltpu.VMEM)
_SMEM1 = pl.BlockSpec(memory_space=pltpu.SMEM)
_SP_SPEC = pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _stack_need(scene) -> int:
    """Per-row SMEM stack entries the 4-ary DFS can hold: 3 per quad level
    (scene.q_stack_need, computed at bake); conservatively derived from the
    binary depth when absent (quad depth <= ceil(binary/2))."""
    need = getattr(scene, "q_stack_need", 0)
    if need and need > 0:
        return int(need)
    depth = getattr(scene, "kernel_max_depth", scene.bvh_max_depth)
    return 3 * (depth // 2 + 2) + 1


def stack_fits(max_depth: int) -> bool:
    """Legacy binary-depth check (a binary DFS holds <= depth+2 entries);
    the quad kernel's real gate is stack_need_fits(scene)."""
    return max_depth + 2 <= CAP


def stack_need_fits(scene) -> bool:
    return _stack_need(scene) <= CAP


def _check(scene):
    assert stack_need_fits(scene), (
        f"quad-BVH stack need {_stack_need(scene)} exceeds the sub-packet "
        f"kernel's per-row stack (CAP={CAP}); use accel='bvh'"
    )


def _scene_parts(scene, origin=None):
    """Per-part (qroot, qmeta, qnodes, ptris) views of the 4-wide collapsed
    tree. Scenes whose packed arrays exceed the VMEM budget are baked as
    subtree parts with a leading [P] axis
    (scene/device_scene.py:_pack_pallas_parts); the kernels then run one
    sequential pass per part, folding best-t / the occlusion mask across
    passes — the VMEM analog of the reference's 256 MB-batched AS builds
    (gpu_scene.odin:279-315).

    With `origin` (the wavefront's ray origins) and baked part AABBs, the
    passes are ordered NEAR-TO-FAR from the wavefront centroid, so the
    folded t-cap/occlusion mask from early passes prunes the later ones
    (round-2 traversed parts in fixed bake order; the 1M-tri bench paid
    ~1.9x per ray because the far part often ran first). Ordering cannot
    change results: each pass's cap only tightens, and any accepted later
    hit is strictly closer (duplicated split-refs tie at equal t and are
    the same triangle). The traced part index makes each per-part array a
    dynamic slice — an HBM copy of ~tens of MB per pass, microseconds
    against a pass's hundreds of ms."""
    p = getattr(scene, "num_parts", 1)
    if p <= 1:
        return [(scene.qroot, scene.qmeta, scene.qnodes, scene.ptris)]
    aabb = getattr(scene, "part_aabb", None)
    if origin is None or aabb is None:
        return [
            (scene.qroot[k], scene.qmeta[k], scene.qnodes[k], scene.ptris[k])
            for k in range(p)
        ]
    centroid = jnp.mean(origin, axis=0)
    lo = aabb[:, 0:3]
    hi = aabb[:, 3:6]
    clamped = jnp.clip(centroid[None, :], lo, hi)
    d2 = jnp.sum((centroid[None, :] - clamped) ** 2, axis=1)
    order = jnp.argsort(d2)
    return [
        (scene.qroot[order[k]], scene.qmeta[order[k]],
         scene.qnodes[order[k]], scene.ptris[order[k]])
        for k in range(p)
    ]


def _rowmask_f(valids):
    """[8,1] f32 mask from 8 scalar bools (i1 vregs can't be built from
    scalars — bitcast_vreg limitation)."""
    return jnp.concatenate(
        [jnp.full((1, 1), v.astype(jnp.float32)) for v in valids], axis=0
    )


def _slab_rows(ox, oy, oz, ix, iy, iz, mn, mx, t_min, t_cap):
    """AABB slab test with PER-ROW bounds ([8,1] columns) against [8,128]
    rays. Returns (hit, t_near)."""
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


def _moller_rows(rows8, k, ox, oy, oz, dx, dy, dz, t_min, bt):
    """Moller-Trumbore for triangle k of each row's leaf block: all operands
    are [8,1] column slices lane-broadcast against the [8,128] rays."""
    c = lambda i: rows8[:, k * TRI_STRIDE + i: k * TRI_STRIDE + i + 1]
    v0x, v0y, v0z = c(0), c(1), c(2)
    e1x, e1y, e1z = c(3), c(4), c(5)
    e2x, e2y, e2z = c(6), c(7), c(8)
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
        & (t > t_min) & (t < bt)
    )
    return t, u, v, valid, c


def _pop_rows(stack_ref, sps):
    """Pop one internal node per row (empty rows masked)."""
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
    return nodes, valids, new_sps


def _read_quad_rows(qnodes_ref, nodes):
    return jnp.concatenate(
        [qnodes_ref[pl.ds(nodes[r], 1), :32] for r in range(ROWS)], axis=0
    )  # [8,32]: 4x child (min.xyz, max.xyz) + 4 metas + pad per row


def _route_quad(stack_ref, lq_ref, qmeta_ref, nodes, new_sps, lqns,
                code_lo, code_hi, ordered):
    """Scalar-side push routing for 4-wide nodes: hit children go to the
    row's stack (internal) or leaf queue in fixed child order; when
    `ordered`, the NEAREST hit child is pushed last so it pops first. Code
    fields are 7 bits/row: 4 hit bits + 3 near bits (near=4 = none, the
    unordered any-hit encoding)."""
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
            meta = qmeta_ref[4 * n + c]
            is_leaf = (meta < 0).astype(jnp.int32)
            # Write-then-advance: slot sp/ln is always the next free one,
            # so unconditional writes never clobber live entries.
            stack_ref[r * CAP + jnp.minimum(sp, CAP - 1)] = meta
            lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~meta
            sp = sp + p * (1 - is_leaf)
            ln = ln + p * is_leaf
            if ordered:
                p_near = p_near + hit_c * is_near.astype(jnp.int32)
                meta_near = jnp.where(is_near, meta, meta_near)
        if ordered:
            is_leaf_n = (meta_near < 0).astype(jnp.int32)
            stack_ref[r * CAP + jnp.minimum(sp, CAP - 1)] = meta_near
            lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~meta_near
            sp = sp + p_near * (1 - is_leaf_n)
            ln = ln + p_near * is_leaf_n
        out_sps.append(sp)
        out_lqns.append(ln)
    return tuple(out_sps), tuple(out_lqns)


_W4 = None


def _pack_code7(code):
    """[8,1] i32 (7 bits/row) -> two scalars (rows 0-3, rows 4-7)."""
    w4 = (128 ** jnp.arange(4, dtype=jnp.int32))[:, None]
    return jnp.sum(code[0:4] * w4), jnp.sum(code[4:8] * w4)


def _pop_leaves(lq_ref, lqns):
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
    return blks, valids, new_lqns


def _read_leaf_rows(ptris_ref, blks):
    return jnp.concatenate(
        [ptris_ref[pl.ds(blks[r], 1), :] for r in range(ROWS)], axis=0
    )  # [8, leaf*12]


_W3 = None  # set lazily inside kernels (jnp constants must be traced)


def _pack_code(code):
    """[8,1] i32 (3 bits/row) -> one scalar via 8**r weighted sum."""
    weights = (8 ** jnp.arange(ROWS, dtype=jnp.int32))[:, None]
    return jnp.sum(code * weights)


def _init_rows(stack_ref, lq_ref, root):
    sp0 = (root >= 0).astype(jnp.int32)
    ln0 = (root < 0).astype(jnp.int32)
    for r in range(ROWS):
        stack_ref[r * CAP] = root
        lq_ref[r * LQ] = ~root
    return sp0, ln0


def _closest_kernel(leaf_size,
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

    sp0, ln0 = _init_rows(stack_ref, lq_ref, root_ref[0])

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
        nodes, valids, new_sps = _pop_rows(stack_ref, sps)
        rows8 = _read_quad_rows(pnodes_ref, nodes)
        t_cap = t_ref[0] * _rowmask_f(valids)
        col = lambda i: rows8[:, i: i + 1]
        tns = []
        for c in range(4):
            h, tn = _slab_rows(
                ox, oy, oz, ix, iy, iz,
                (col(6 * c), col(6 * c + 1), col(6 * c + 2)),
                (col(6 * c + 3), col(6 * c + 4), col(6 * c + 5)),
                t_min, t_cap,
            )
            tns.append(jnp.min(jnp.where(h, tn, BIG), axis=1, keepdims=True))
        any_h = [tn < BIG for tn in tns]
        # Nearest hit child (2-bit argmin; rows with no hits push nothing).
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


def _occlusion_kernel(leaf_size,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tmax_ref, skip_obj_ref, root_ref, pmeta_ref,
                      pnodes_ref, ptris_ref, occ_ref, stack_ref, lq_ref):
    """Any-hit variant: no near/far ordering (pop order is irrelevant without
    a shrinking best-t), per-lane union capping via t_eff, and per-ROW early
    exit once a row's 128 lanes are all occluded."""
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
        # Occluded lanes stop driving traversal (t_eff below every slab).
        t_eff = jnp.where(occ == 0, t_max, t_min)
        for k in range(leaf_size):
            t, u, v, valid, c = _moller_rows(
                rows8, k, ox, oy, oz, dx, dy, dz, t_min, t_eff
            )
            valid = valid & rowmask & (c(10) != skip_obj)
            occ = jnp.where(valid, 1, occ)
        occ_ref[0] = occ
        # Per-row early exit: rows whose 128 lanes are all occluded clear
        # their stacks/queues. One packed extract for all 8 rows.
        done = jnp.min(occ, axis=1, keepdims=True)  # [8,1] 0/1
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
        anys = []
        for c in range(4):
            h, _ = _slab_rows(
                ox, oy, oz, ix, iy, iz,
                (col(6 * c), col(6 * c + 1), col(6 * c + 2)),
                (col(6 * c + 3), col(6 * c + 4), col(6 * c + 5)),
                t_min, t_eff,
            )
            anys.append(jnp.max(h.astype(jnp.int32), axis=1, keepdims=True))
        # near=4: no ordering (pop order is irrelevant without a best-t).
        code = anys[0] + 2 * anys[1] + 4 * anys[2] + 8 * anys[3] + 64
        code_lo, code_hi = _pack_code7(code)
        return _route_quad(stack_ref, lq_ref, pmeta_ref, nodes, new_sps,
                           lqns, code_lo, code_hi, ordered=False)

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


def _tile_count(n: int) -> int:
    return (n + TILE - 1) // TILE


def _to_tiles(a, n_tiles, fill=0.0):
    n = a.shape[0]
    total = n_tiles * TILE
    if total != n:
        a = jnp.concatenate([a, jnp.full((total - n,), fill, a.dtype)])
    return a.reshape(n_tiles, ROWS, LANES)


def _ray_tiles(origin, direction, n_tiles):
    comps = []
    for arr in (origin, direction):
        for c in range(3):
            comps.append(_to_tiles(arr[:, c], n_tiles))
    return comps


def _grouped(run_group, ray_args, scene_args, n_tiles):
    if n_tiles <= GROUP_TILES:
        return run_group(*ray_args, *scene_args)
    g = GROUP_TILES
    n_groups = (n_tiles + g - 1) // g
    padded = n_groups * g

    def pad(a):
        if padded != n_tiles:
            fill = jnp.zeros((padded - n_tiles,) + a.shape[1:], a.dtype)
            a = jnp.concatenate([a, fill])
        return a.reshape(n_groups, g, *a.shape[1:])

    ray_args = [pad(a) for a in ray_args]
    outs = jax.lax.map(lambda args: run_group(*args, *scene_args),
                       tuple(ray_args))
    return [o.reshape(padded, ROWS, LANES)[:n_tiles] for o in outs]


def _run_closest_group(ox, oy, oz, dx, dy, dz, tmax, root, pmeta, pnodes,
                       ptris, interpret):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_closest_kernel, leaf_size),
        grid=(n_tiles,),
        in_specs=[_SP_SPEC] * 7 + [_SMEM1, _SMEM1, _FULL, _FULL],
        out_specs=[_SP_SPEC] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((ROWS * CAP,), jnp.int32),
            pltpu.SMEM((ROWS * LQ,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tmax, root, pmeta, pnodes, ptris)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_closest(ox, oy, oz, dx, dy, dz, tmax, root, pmeta, pnodes, ptris,
                 interpret):
    run = functools.partial(_run_closest_group, interpret=interpret)
    return _grouped(run, [ox, oy, oz, dx, dy, dz, tmax],
                    [root, pmeta, pnodes, ptris], ox.shape[0])


def _run_occlusion_group(ox, oy, oz, dx, dy, dz, tmax, skip_obj, root, pmeta,
                         pnodes, ptris, interpret):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    return pl.pallas_call(
        functools.partial(_occlusion_kernel, leaf_size),
        grid=(n_tiles,),
        in_specs=[_SP_SPEC] * 8 + [_SMEM1, _SMEM1, _FULL, _FULL],
        out_specs=[_SP_SPEC],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.int32)],
        scratch_shapes=[
            pltpu.SMEM((ROWS * CAP,), jnp.int32),
            pltpu.SMEM((ROWS * LQ,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tmax, skip_obj, root, pmeta, pnodes, ptris)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_occlusion(ox, oy, oz, dx, dy, dz, tmax, skip_obj, root, pmeta,
                   pnodes, ptris, interpret):
    run = functools.partial(_run_occlusion_group, interpret=interpret)
    return _grouped(run, [ox, oy, oz, dx, dy, dz, tmax, skip_obj],
                    [root, pmeta, pnodes, ptris], ox.shape[0])


def intersect_bvh_subpacket(origin, direction, scene, t_min, t_max,
                            active_mask=None, interpret=None) -> HitRecord:
    """Closest-hit via the divergent sub-packet kernel. Drop-in for
    ops/traverse.intersect_bvh (t_min fixed at 1e-3, the reference's
    traceRayEXT value — asserted)."""
    assert abs(t_min - 1e-3) < 1e-9, "sub-packet kernel assumes t_min=1e-3"
    _check(scene)
    if interpret is None:
        interpret = _interpret_default()
    r = origin.shape[0]
    n_tiles = _tile_count(r)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if active_mask is not None:
        t_max = jnp.where(active_mask, t_max, 1e-3)
    ox, oy, oz, dx, dy, dz = _ray_tiles(origin, direction, n_tiles)
    tmax_t = _to_tiles(t_max, n_tiles, fill=1e-3)

    # Sequential per-part passes, near-to-far from the wavefront centroid;
    # the running best-t is each next pass's t-cap, so later (farther) parts
    # prune against earlier hits. A part hit (tri >= 0) is strictly closer
    # than the cap by construction.
    t = tmax_t
    tri = None
    u = v = None
    for root_meta, pmeta, pnodes, ptris in _scene_parts(scene, origin):
        tp, trip, up, vp = _run_closest(
            ox, oy, oz, dx, dy, dz, t, root_meta, pmeta, pnodes, ptris,
            interpret,
        )
        if tri is None:
            t, tri, u, v = tp, trip, up, vp
        else:
            take = trip >= 0
            t = jnp.where(take, tp, t)
            tri = jnp.where(take, trip, tri)
            u = jnp.where(take, up, u)
            v = jnp.where(take, vp, v)
    flat = lambda a: a.reshape(-1)[:r]
    tri = flat(tri)
    return HitRecord(t=flat(t), tri=tri, u=flat(u), v=flat(v), hit=tri >= 0)


def occlusion_bvh_subpacket(origin, direction, t_min, t_max, scene,
                            skip_object, active_mask=None, interpret=None):
    """Any-hit via the divergent sub-packet kernel. Drop-in for
    ops/traverse.occlusion_bvh."""
    assert abs(t_min - 1e-3) < 1e-9
    _check(scene)
    if interpret is None:
        interpret = _interpret_default()
    r = origin.shape[0]
    n_tiles = _tile_count(r)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if active_mask is not None:
        t_max = jnp.where(active_mask, t_max, 1e-3)
    ox, oy, oz, dx, dy, dz = _ray_tiles(origin, direction, n_tiles)
    tmax_t = _to_tiles(t_max, n_tiles, fill=1e-3)
    skip_t = _to_tiles(jnp.asarray(skip_object, jnp.int32), n_tiles, fill=-1)

    # Sequential per-part passes, near-to-far; already-occluded lanes stop
    # traversing in later parts (their t-cap collapses to t_min).
    occ = None
    for root_meta, pmeta, pnodes, ptris in _scene_parts(scene, origin):
        t_eff = tmax_t if occ is None else jnp.where(occ > 0, 1e-3, tmax_t)
        (occ_p,) = _run_occlusion(
            ox, oy, oz, dx, dy, dz, t_eff, skip_t, root_meta, pmeta,
            pnodes, ptris, interpret,
        )
        occ = occ_p if occ is None else jnp.maximum(occ, occ_p)
    return occ.reshape(-1)[:r] > 0
