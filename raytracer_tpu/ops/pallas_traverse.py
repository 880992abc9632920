"""Pallas packet-traversal kernel — the speed-of-light TPU `traceRayEXT`.

Why a kernel: XLA's gather primitive costs ~3 ms fixed + ~25 ns/row on v5e
(measured), so the gather-per-step lockstep walk in ops/traverse.py is
hopeless at 1080p (~1.4G gathered rows per closest-hit pass). This kernel
eliminates gathers entirely: the whole BVH + triangles are VMEM-resident and
each grid step owns a TILE = 8x128 = 1024-ray packet.

Mosaic layout constraints shape the data (measured on v5e):
  - dynamic indices are legal on the SUBLANE (2nd-minor) dim; LANE indices
    must be static -> everything is a "row per tree element" layout,
  - scalar bitcasts are unsupported -> integer metadata is stored as exact
    small-integer f32 values (|v| < 2^24) and converted, not bitcast.

Data (built by scene/device_scene._pack_pallas_arrays):
  pnodes f32[NI, 16] — one row per INTERNAL node: left.min/max xyz,
      right.min/max xyz (lanes 0-11), lane 12/13 = left/right child meta as
      f32 (meta >= 0: internal node row index; meta < 0: ~leaf_block).
  ptris  f32[NB, leaf_size*12] — one row per leaf block: leaf_size
      triangles x (v0, e1, e2, tri_index_f, object_f, pad) stride 12;
      padding tris are degenerate.

Kernel per 1024-ray tile (one traversal shared by the packet):
  - SMEM stack of child metas; pop -> one node row -> BOTH child AABBs slab-
    tested against the tile ([8,128] VPU ops, bounds as scalar ref reads),
  - near child (smaller reduced t_near) pushed last so it pops first; the
    far child is pruned by the shrinking best-t on its later pop,
  - leaf pop -> row read + static strided slices give each triangle's
    components as [8,1] columns tested against [1,128] ray chunks,
    Möller–Trumbore identical to ops/intersect.py.

Packet semantics: a node is visited if ANY ray in the packet hits it —
coherence matters; camera tiles are raster-contiguous and bounce wavefronts
keep spatial locality. Correctness contract: same hit records as
ops/traverse.intersect_bvh (tested in interpret mode and on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.intersect import HitRecord

TILE_S = 32
TILE_L = 128
TILE = TILE_S * TILE_L
STACK_CAP = 128  # >= 2x max BVH depth; SAH trees of 300k tris are ~40 deep
TRI_STRIDE = 12
LEAF = 8
BIG = float(np.float32(3.0e38))  # plain Python float: jnp scalars would be
# captured device constants inside pallas kernels (unsupported)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def stack_fits(max_depth: int) -> bool:
    """Whether a tree of this depth traverses within STACK_CAP. The DFS holds
    at most one pending far-child per level plus the two pushes of the node
    being expanded, so occupancy <= depth + 2."""
    return max_depth + 2 <= STACK_CAP


def _check_stack(scene):
    assert stack_fits(scene.bvh_max_depth), (
        f"BVH depth {scene.bvh_max_depth} exceeds the packet kernel's "
        f"traversal stack (STACK_CAP={STACK_CAP}); use accel='bvh' "
        "(ProgressiveRenderer falls back automatically)"
    )


def _inv_dir(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                           jnp.where(d >= 0, 1e-20, -1e-20), d)


def _slab(ox, oy, oz, ix, iy, iz, mnx, mny, mnz, mxx, mxy, mxz, t_min,
          t_far_cap):
    """AABB slab test: scalar bounds vs [8,128] packet. Returns
    (hit mask, t_near)."""
    t0x = (mnx - ox) * ix
    t1x = (mxx - ox) * ix
    t0y = (mny - oy) * iy
    t1y = (mxy - oy) * iy
    t0z = (mnz - oz) * iz
    t1z = (mxz - oz) * iz
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), t_min),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), t_far_cap),
    )
    return t_near <= t_far, t_near


def _moller_scalar_tri(tv, ox, oy, oz, dx, dy, dz, t_min, bt):
    """Möller–Trumbore: one triangle (11 scalars in `tv`) against the whole
    [8,128] packet. Returns (t, u, v, valid)."""
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = tv[:9]
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
    return t, u, v, valid


def _visit_internal(pnodes_ref, stack_ref, sp, node_id,
                    ox, oy, oz, ix, iy, iz, t_min, t_cap):
    """Process one popped internal node: slab-test BOTH children, push hit
    children (leaf or internal metas) branchlessly, far-then-near (near pops
    first). Writing to free slots is always safe; sp only advances past real
    pushes."""
    n = node_id
    row = pnodes_ref[pl.ds(n, 1), :]  # one [1,16] vector load
    lmn = (row[0, 0], row[0, 1], row[0, 2])
    lmx = (row[0, 3], row[0, 4], row[0, 5])
    rmn = (row[0, 6], row[0, 7], row[0, 8])
    rmx = (row[0, 9], row[0, 10], row[0, 11])
    lmeta = row[0, 12].astype(jnp.int32)
    rmeta = row[0, 13].astype(jnp.int32)

    hit_l, tn_l = _slab(ox, oy, oz, ix, iy, iz, *lmn, *lmx, t_min, t_cap)
    hit_r, tn_r = _slab(ox, oy, oz, ix, iy, iz, *rmn, *rmx, t_min, t_cap)
    near_l = jnp.min(jnp.where(hit_l, tn_l, BIG))
    near_r = jnp.min(jnp.where(hit_r, tn_r, BIG))
    # any-hit is derived from the min reductions (saves 2 of 4 cross-tile
    # reductions per visit; measured ~2%).
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


def _closest_kernel(leaf_size,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tmax_ref, root_ref, pnodes_ref, ptris_ref,
                    t_ref, tri_ref, u_ref, v_ref, stack_ref):
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t_min = 1e-3

    t_ref[0] = tmax_ref[0]
    tri_ref[0] = jnp.full((TILE_S, TILE_L), -1, jnp.int32)
    u_ref[0] = jnp.zeros((TILE_S, TILE_L), jnp.float32)
    v_ref[0] = jnp.zeros((TILE_S, TILE_L), jnp.float32)

    def leaf_fn(block):
        bt = t_ref[0]
        btri = tri_ref[0]
        bu = u_ref[0]
        bv = v_ref[0]
        for k in range(leaf_size):
            tv = [ptris_ref[block, k * TRI_STRIDE + c] for c in range(9)]
            t, u, v, valid = _moller_scalar_tri(
                tv, ox, oy, oz, dx, dy, dz, t_min, bt
            )
            tri_k = ptris_ref[block, k * TRI_STRIDE + 9].astype(jnp.int32)
            bt = jnp.where(valid, t, bt)
            btri = jnp.where(valid, tri_k, btri)
            bu = jnp.where(valid, u, bu)
            bv = jnp.where(valid, v, bv)
        t_ref[0] = bt
        tri_ref[0] = btri
        u_ref[0] = bu
        v_ref[0] = bv

    stack_ref[0] = root_ref[0]

    def body(sp):
        sp = sp - 1
        meta = stack_ref[sp]

        def on_leaf(sp):
            leaf_fn(~meta)
            return sp

        def on_internal(sp):
            t_cap = t_ref[0]  # per-ray pruning bound [8,128]
            return _visit_internal(
                pnodes_ref, stack_ref, sp, meta,
                ox, oy, oz, ix, iy, iz, t_min, t_cap,
            )

        return jax.lax.cond(meta < 0, on_leaf, on_internal, sp)

    jax.lax.while_loop(lambda sp: sp > 0, body, 1)


def _occlusion_kernel(leaf_size,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tmax_ref, skip_obj_ref, root_ref, pnodes_ref,
                      ptris_ref, occ_ref, stack_ref):
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

    stack_ref[0] = root_ref[0]

    # `occ` only changes at leaf visits, so the per-lane union cap (occluded
    # lanes stop driving traversal) and the all-occluded early exit are
    # refreshed after leaves only — spending a [32,128] where + a full
    # reduction on every internal visit measured 1.26x slower (tools/
    # occl_lab.py).
    def body(carry):
        sp, t_eff = carry
        sp = sp - 1
        meta = stack_ref[sp]

        def on_leaf(args):
            sp, _ = args
            leaf_fn(~meta)
            t_eff = jnp.where(occ_ref[0] == 0, t_max, 1e-3)
            sp = jnp.where(jnp.all(occ_ref[0] == 1), 0, sp)
            return sp, t_eff

        def on_internal(args):
            sp, t_eff = args
            return _visit_internal(
                pnodes_ref, stack_ref, sp, meta,
                ox, oy, oz, ix, iy, iz, t_min, t_eff,
            ), t_eff

        return jax.lax.cond(meta < 0, on_leaf, on_internal, (sp, t_eff))

    jax.lax.while_loop(lambda c: c[0] > 0, body, (1, t_max))


def _tile_count(n: int) -> int:
    return (n + TILE - 1) // TILE


def _to_tiles(a, n_tiles, fill=0.0):
    n = a.shape[0]
    total = n_tiles * TILE
    if total != n:
        a = jnp.concatenate([a, jnp.full((total - n,), fill, a.dtype)])
    return a.reshape(n_tiles, TILE_S, TILE_L)


def _ray_tiles(origin, direction, n_tiles):
    comps = []
    for arr in (origin, direction):
        for c in range(3):
            comps.append(_to_tiles(arr[:, c], n_tiles))
    return comps


_RAY_SPEC = pl.BlockSpec(
    (1, TILE_S, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
)
_FULL = pl.BlockSpec(memory_space=pltpu.VMEM)
_SMEM1 = pl.BlockSpec(memory_space=pltpu.SMEM)

# Tiles per pallas_call: when the call sits inside a jitted loop, XLA
# scoped-VMEM-allocates the call's in/out buffers (16 MB budget), so one
# giant call over a 1080p wavefront OOMs; groups of <=256 tiles keep the
# footprint ~6 MB and lax.map serializes the groups (the grid is serial
# per-core anyway).
GROUP_TILES = 512


def _run_closest_group(ox, oy, oz, dx, dy, dz, tmax, root, pnodes, ptris,
                       interpret):
    n_tiles = ox.shape[0]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
    ]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    return pl.pallas_call(
        functools.partial(_closest_kernel, leaf_size),
        grid=(n_tiles,),
        in_specs=[_RAY_SPEC] * 7 + [_SMEM1, _FULL, _FULL],
        out_specs=[_RAY_SPEC] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tmax, root, pnodes, ptris)


def _grouped(run_group, ray_args, scene_args, n_tiles, n_outs):
    """Split [n_tiles, 8, 128] ray args into GROUP_TILES-sized groups and
    lax.map the kernel over them (padding with dead tiles)."""
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

    def one_group(args):
        return run_group(*args, *scene_args)

    outs = jax.lax.map(one_group, tuple(ray_args))
    outs = [o.reshape(padded, TILE_S, TILE_L)[:n_tiles] for o in outs]
    return outs


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_closest(ox, oy, oz, dx, dy, dz, tmax, root, pnodes, ptris,
                 interpret):
    run = functools.partial(_run_closest_group, interpret=interpret)
    return _grouped(
        lambda *a: run(*a),
        [ox, oy, oz, dx, dy, dz, tmax],
        [root, pnodes, ptris],
        ox.shape[0],
        4,
    )


def _run_occlusion_group(ox, oy, oz, dx, dy, dz, tmax, skip_obj, root,
                         pnodes, ptris, interpret):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    return pl.pallas_call(
        functools.partial(_occlusion_kernel, leaf_size),
        grid=(n_tiles,),
        in_specs=[_RAY_SPEC] * 8 + [_SMEM1, _FULL, _FULL],
        out_specs=[_RAY_SPEC],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32)
        ],
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tmax, skip_obj, root, pnodes, ptris)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_occlusion(ox, oy, oz, dx, dy, dz, tmax, skip_obj, root, pnodes,
                   ptris, interpret):
    run = functools.partial(_run_occlusion_group, interpret=interpret)
    return _grouped(
        lambda *a: run(*a),
        [ox, oy, oz, dx, dy, dz, tmax, skip_obj],
        [root, pnodes, ptris],
        ox.shape[0],
        1,
    )


def intersect_bvh_pallas(origin, direction, scene, t_min, t_max,
                         active_mask=None, interpret=None) -> HitRecord:
    """Closest-hit via the packet kernel. Drop-in for
    ops/traverse.intersect_bvh (t_min fixed at 1e-3, the reference's
    traceRayEXT value — asserted)."""
    assert abs(t_min - 1e-3) < 1e-9, "packet kernel assumes t_min=1e-3"
    _check_stack(scene)
    if interpret is None:
        interpret = _interpret_default()
    r = origin.shape[0]
    n_tiles = _tile_count(r)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if active_mask is not None:
        # Inactive lanes get t_max = t_min: every slab/tri test fails.
        t_max = jnp.where(active_mask, t_max, 1e-3)
    ox, oy, oz, dx, dy, dz = _ray_tiles(origin, direction, n_tiles)
    tmax_t = _to_tiles(t_max, n_tiles, fill=1e-3)

    t, tri, u, v = _run_closest(
        ox, oy, oz, dx, dy, dz, tmax_t, scene.root_meta, scene.pnodes,
        scene.ptris, interpret,
    )
    flat = lambda a: a.reshape(-1)[:r]
    tri = flat(tri)
    return HitRecord(t=flat(t), tri=tri, u=flat(u), v=flat(v), hit=tri >= 0)


def occlusion_bvh_pallas(origin, direction, t_min, t_max, scene, skip_object,
                         active_mask=None, interpret=None):
    """Any-hit via the packet kernel. Drop-in for
    ops/traverse.occlusion_bvh."""
    assert abs(t_min - 1e-3) < 1e-9
    _check_stack(scene)
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

    (occ,) = _run_occlusion(
        ox, oy, oz, dx, dy, dz, tmax_t, skip_t, scene.root_meta,
        scene.pnodes, scene.ptris, interpret,
    )
    return occ.reshape(-1)[:r] > 0
