"""v2 closest-hit kernel prototype: small packets + component-major leaves.

Leaf rows are stored component-major (lanes [8c..8c+8) = component c of the
block's 8 triangles), so one in-kernel transpose gives [8,1] columns and the
M-T runs as [8,128] vector ops per ray row — no per-scalar VMEM extracts.
Internal nodes keep the production scalar-extract slab path (their extracts
hide behind vector work). Parametric tile size.

Measures primary + bounce1 time and verifies hit parity vs the production
kernel.
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
    BIG, STACK_CAP, TILE_L, TRI_STRIDE,
    _inv_dir, _slab, _RAY_SPEC, _FULL, _SMEM1,
)

WIDTH, HEIGHT = 1920, 1080
REPS = 3
FREQ_GHZ = 0.94


def to_component_major(ptris):
    """[NB, leaf*12] tri-major -> [NB, leaf*12] component-major lanes:
    out[:, leaf*c + k] = in[:, 12*k + c] for c in 0..11, k in 0..leaf-1."""
    nb, w = ptris.shape
    leaf = w // TRI_STRIDE
    out = np.empty_like(ptris)
    for c in range(TRI_STRIDE):
        for k in range(leaf):
            out[:, leaf * c + k] = ptris[:, TRI_STRIDE * k + c]
    return out


def _closest_kernel_v2(leaf_size, tile_s,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref, root_ref, pnodes_ref, ptris_ref,
                       t_ref, tri_ref, stack_ref):
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t_min = 1e-3

    t_ref[0] = tmax_ref[0]
    tri_ref[0] = jnp.full((tile_s, TILE_L), -1, jnp.int32)

    L = leaf_size

    def leaf_fn(block):
        row = ptris_ref[pl.ds(block, 1), :]
        col = jnp.transpose(row, (1, 0))  # [leaf*12, 1]
        v0x = col[0 * L:1 * L, :]
        v0y = col[1 * L:2 * L, :]
        v0z = col[2 * L:3 * L, :]
        e1x = col[3 * L:4 * L, :]
        e1y = col[4 * L:5 * L, :]
        e1z = col[5 * L:6 * L, :]
        e2x = col[6 * L:7 * L, :]
        e2y = col[7 * L:8 * L, :]
        e2z = col[8 * L:9 * L, :]
        tric = col[9 * L:10 * L, :].astype(jnp.int32)
        bt = t_ref[0]
        btri = tri_ref[0]
        new_t = []
        new_tri = []
        for r in range(tile_s):
            oxr = ox[r:r + 1]
            oyr = oy[r:r + 1]
            ozr = oz[r:r + 1]
            dxr = dx[r:r + 1]
            dyr = dy[r:r + 1]
            dzr = dz[r:r + 1]
            btr = bt[r:r + 1]
            px = dyr * e2z - dzr * e2y
            py = dzr * e2x - dxr * e2z
            pz = dxr * e2y - dyr * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-10, 1.0 / det, 0.0)
            tx = oxr - v0x
            ty = oyr - v0y
            tz = ozr - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dxr * qx + dyr * qy + dzr * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            valid = (
                (jnp.abs(det) > 1e-10)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > t_min) & (t < btr)
            )
            tcand = jnp.where(valid, t, BIG)
            tmin = jnp.min(tcand, axis=0, keepdims=True)
            trimin = jnp.max(
                jnp.where(tcand == tmin,
                          jnp.broadcast_to(tric, tcand.shape), -1),
                axis=0, keepdims=True,
            )
            win = tmin < btr
            new_t.append(jnp.where(win, tmin, btr))
            new_tri.append(jnp.where(win, trimin, btri[r:r + 1]))
        t_ref[0] = jnp.concatenate(new_t, axis=0)
        tri_ref[0] = jnp.concatenate(new_tri, axis=0)

    def visit_internal(sp, node_id):
        row = pnodes_ref[pl.ds(node_id, 1), :]
        lmn = (row[0, 0], row[0, 1], row[0, 2])
        lmx = (row[0, 3], row[0, 4], row[0, 5])
        rmn = (row[0, 6], row[0, 7], row[0, 8])
        rmx = (row[0, 9], row[0, 10], row[0, 11])
        lmeta = row[0, 12].astype(jnp.int32)
        rmeta = row[0, 13].astype(jnp.int32)
        t_cap = t_ref[0]
        hit_l, tn_l = _slab(ox, oy, oz, ix, iy, iz, *lmn, *lmx, t_min, t_cap)
        hit_r, tn_r = _slab(ox, oy, oz, ix, iy, iz, *rmn, *rmx, t_min, t_cap)
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

    def body(sp):
        sp = sp - 1
        meta = stack_ref[sp]

        def on_leaf(sp):
            leaf_fn(~meta)
            return sp

        return jax.lax.cond(meta < 0, on_leaf,
                            lambda sp: visit_internal(sp, meta), sp)

    jax.lax.while_loop(lambda sp: sp > 0, body, 1)


def run_closest_v2(ox, oy, oz, dx, dy, dz, tmax, root, pnodes, ptris_cm,
                   tile_s):
    n_tiles = ox.shape[0]
    leaf_size = ptris_cm.shape[1] // TRI_STRIDE
    spec = pl.BlockSpec((1, tile_s, TILE_L), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, tile_s, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, tile_s, TILE_L), jnp.int32),
    ]
    return pl.pallas_call(
        functools.partial(_closest_kernel_v2, leaf_size, tile_s),
        grid=(n_tiles,),
        in_specs=[spec] * 7 + [_SMEM1, _FULL, _FULL],
        out_specs=[spec] * 2,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(ox, oy, oz, dx, dy, dz, tmax, root, pnodes, ptris_cm)


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
    ptris_cm = jnp.asarray(to_component_major(np.asarray(ds.ptris)))
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

    for label, (origin, direction, alive) in (
        ("primary", (o0, d0, a0)),
        ("bounce1", (state1s.origin, state1s.direction, state1s.alive)),
    ):
        # Production reference for parity + time.
        ref = jax.jit(functools.partial(
            intersect_bvh_pallas, t_min=1e-3, t_max=1e4, interpret=False,
        ), static_argnames=())
        rec = intersect_bvh_pallas(origin, direction, ds, 1e-3, 1e4,
                                   active_mask=alive)
        ref_tri = np.asarray(rec.tri)
        ref_t = np.asarray(rec.t)

        for tile_s in (8, 16):
            tile = tile_s * TILE_L
            nt = (n + tile - 1) // tile

            @jax.jit
            def prep(origin, direction, alive):
                tm = jnp.where(alive, 1e4, 1e-3)
                comps = []
                for arr in (origin, direction):
                    for c in range(3):
                        a = arr[:, c]
                        total = nt * tile
                        if total != n:
                            a = jnp.concatenate(
                                [a, jnp.zeros(total - n, a.dtype)])
                        comps.append(a.reshape(nt, tile_s, TILE_L))
                a = jnp.concatenate(
                    [tm, jnp.full(nt * tile - n, 1e-3)])
                comps.append(a.reshape(nt, tile_s, TILE_L))
                return comps

            rays = prep(origin, direction, alive)
            [float(jnp.sum(r)) for r in rays[:1]]
            fn = jax.jit(functools.partial(run_closest_v2, tile_s=tile_s))
            out, dt = measure(fn, *rays, ds.root_meta, ds.pnodes, ptris_cm)
            tri = np.asarray(out[1]).reshape(-1)[:n]
            t = np.asarray(out[0]).reshape(-1)[:n]
            # Parity: same triangle, or same t (coplanar-tie tolerance).
            mism = (tri != ref_tri) & ~np.isclose(t, ref_t, rtol=1e-5)
            print(f"{label:8s} v2 ts={tile_s:2d}: {dt*1e3:8.1f} ms  "
                  f"mismatches {int(mism.sum())}", flush=True)


if __name__ == "__main__":
    main()
