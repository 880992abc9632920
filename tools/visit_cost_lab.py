"""Microbench: where do the ~450 cycles per traversal visit go?

Walks a FIXED node sequence (i % NI) so every variant does the same number
of iterations regardless of content, ablating one component at a time:
  full      row read + 12 scalar extracts + 2 slab tests + 4 reductions + stack-ish
  nored     ... without the 4 cross-tile reductions
  noslab    row read + extracts + reductions on constants (no [32,128] slab math)
  extracts  row read + 12 scalar extracts only
  rowonly   row read only
  empty     loop overhead only
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from raytracer_tpu.ops.pallas_traverse import (  # noqa: E402
    BIG, TILE_L, TILE_S, _inv_dir, _slab, _RAY_SPEC, _FULL,
)

K = 262144  # iterations per kernel call (large so loop cost >> tunnel RTT)
FREQ_GHZ = 0.94
REPS = 5


def kernel(variant, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
           pnodes_ref, acc_ref):
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    ix = _inv_dir(dx_ref[0])
    iy = _inv_dir(dy_ref[0])
    iz = _inv_dir(dz_ref[0])
    ni = pnodes_ref.shape[0]
    t_cap = jnp.full((TILE_S, TILE_L), 1e4, jnp.float32)

    def body(i, acc):
        if variant == "empty":
            return acc + i
        node = i % ni
        row = pnodes_ref[pl.ds(node, 1), :]
        if variant == "rowonly":
            return acc + row[0, 0].astype(jnp.int32)
        vals = [row[0, c] for c in range(12)]
        lmeta = row[0, 12].astype(jnp.int32)
        rmeta = row[0, 13].astype(jnp.int32)
        if variant == "extracts":
            s = vals[0]
            for vv in vals[1:]:
                s = s + vv
            return acc + s.astype(jnp.int32) + lmeta + rmeta
        if variant == "noslab":
            # reductions on a constant tile (no fresh slab math)
            near_l = jnp.min(jnp.where(t_cap > vals[0], t_cap, BIG))
            near_r = jnp.min(jnp.where(t_cap > vals[6], t_cap, BIG))
            any_l = jnp.any(t_cap > vals[1])
            any_r = jnp.any(t_cap > vals[7])
            swap = near_r < near_l
            m = jnp.where(swap, rmeta, lmeta) + any_l.astype(jnp.int32) + (
                any_r.astype(jnp.int32))
            return acc + m
        hit_l, tn_l = _slab(ox, oy, oz, ix, iy, iz, vals[0], vals[1], vals[2],
                            vals[3], vals[4], vals[5], 1e-3, t_cap)
        hit_r, tn_r = _slab(ox, oy, oz, ix, iy, iz, vals[6], vals[7], vals[8],
                            vals[9], vals[10], vals[11], 1e-3, t_cap)
        if variant == "nored":
            # consume slab results without cross-tile reductions
            m = jnp.where(hit_l.astype(jnp.int32)[0, 0] > 0, lmeta, rmeta)
            return acc + m + tn_l[0, 0].astype(jnp.int32) + (
                tn_r[0, 0].astype(jnp.int32))
        near_l = jnp.min(jnp.where(hit_l, tn_l, BIG))
        near_r = jnp.min(jnp.where(hit_r, tn_r, BIG))
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
        swap = near_r < near_l
        m_near = jnp.where(swap, rmeta, lmeta)
        m_far = jnp.where(swap, lmeta, rmeta)
        return acc + m_near + m_far + any_l.astype(jnp.int32) + (
            any_r.astype(jnp.int32))

    acc = jax.lax.fori_loop(0, K, body, jnp.int32(0))
    acc_ref[0] = jnp.full((8, TILE_L), acc, jnp.int32)


def _mt_vec(tv, ox, oy, oz, dx, dy, dz, t_min, bt):
    """Moller-Trumbore with [1,1]-slice operands (broadcast, no sreg)."""
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


def leaf_kernel(variant, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                ptris_ref, acc_ref):
    from raytracer_tpu.ops.pallas_traverse import (
        TRI_STRIDE, _moller_scalar_tri,
    )
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    nb = ptris_ref.shape[0]
    t_min = 1e-3

    def body(i, carry):
        acc, bt = carry
        block = i % nb
        btri = acc
        if variant == "slice":
            row = ptris_ref[pl.ds(block, 1), :]

            def bc(c0):
                # two-step broadcast: [1,1] -> [1,128] lane broadcast; the
                # sublane broadcast happens implicitly in the binary ops.
                return jnp.broadcast_to(row[:, c0:c0 + 1], (1, TILE_L))

            for k in range(8):
                tv = [bc(k * TRI_STRIDE + c) for c in range(9)]
                t, u, v, valid = _mt_vec(
                    tv, ox, oy, oz, dx, dy, dz, t_min, bt
                )
                tri_k = bc(k * TRI_STRIDE + 9)
                bt = jnp.where(valid, t, bt)
                btri = jnp.where(valid, tri_k.astype(jnp.int32), btri)
        elif variant == "ilp":
            # break the serial best-t chain: all tris test vs entry bt
            bt0 = bt
            ts_, tris_ = [], []
            for k in range(8):
                tv = [ptris_ref[block, k * TRI_STRIDE + c] for c in range(9)]
                t, u, v, valid = _moller_scalar_tri(
                    tv, ox, oy, oz, dx, dy, dz, t_min, bt0
                )
                tri_k = ptris_ref[block, k * TRI_STRIDE + 9].astype(jnp.int32)
                ts_.append(jnp.where(valid, t, 3.0e38))
                tris_.append(tri_k)
            while len(ts_) > 1:
                nt_, ntri_ = [], []
                for a in range(0, len(ts_), 2):
                    tb = ts_[a + 1] < ts_[a]
                    nt_.append(jnp.where(tb, ts_[a + 1], ts_[a]))
                    ntri_.append(jnp.where(tb, tris_[a + 1], tris_[a]))
                ts_, tris_ = nt_, ntri_
            win = ts_[0] < bt
            bt = jnp.where(win, ts_[0], bt)
            btri = jnp.where(win, tris_[0], btri)
        elif variant == "sliceilp":
            row = ptris_ref[pl.ds(block, 1), :]

            def bc(c0):
                return jnp.broadcast_to(row[:, c0:c0 + 1], (1, TILE_L))

            bt0 = bt
            ts_, tris_ = [], []
            for k in range(8):
                tv = [bc(k * TRI_STRIDE + c) for c in range(9)]
                t, u, v, valid = _mt_vec(
                    tv, ox, oy, oz, dx, dy, dz, t_min, bt0
                )
                ts_.append(jnp.where(valid, t, 3.0e38))
                tris_.append(jnp.broadcast_to(
                    bc(k * TRI_STRIDE + 9).astype(jnp.int32), valid.shape))
            while len(ts_) > 1:
                nt_, ntri_ = [], []
                for a in range(0, len(ts_), 2):
                    tb = ts_[a + 1] < ts_[a]
                    nt_.append(jnp.where(tb, ts_[a + 1], ts_[a]))
                    ntri_.append(jnp.where(tb, tris_[a + 1], tris_[a]))
                ts_, tris_ = nt_, ntri_
            win = ts_[0] < bt
            bt = jnp.where(win, ts_[0], bt)
            btri = jnp.where(win, tris_[0], btri)
        else:
            for k in range(8):
                tv = [ptris_ref[block, k * TRI_STRIDE + c] for c in range(9)]
                t, u, v, valid = _moller_scalar_tri(
                    tv, ox, oy, oz, dx, dy, dz, t_min, bt
                )
                tri_k = ptris_ref[block, k * TRI_STRIDE + 9].astype(jnp.int32)
                bt = jnp.where(valid, t, bt)
                btri = jnp.where(valid, tri_k, btri)
        return btri, bt

    acc, bt = jax.lax.fori_loop(
        0, K // 8,
        body,
        (jnp.full(ox_ref.shape[1:], -1, jnp.int32),
         jnp.full(ox_ref.shape[1:], 1e4, jnp.float32)),
    )
    acc_ref[0] = acc[:8] + bt[:8].astype(jnp.int32)


def leaf_main():
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene

    scene = create_benchmark_atrium(300_000)
    ds, _ = bake_scene(scene, leaf_size=8)
    for ts in (8, 32):
        spec = pl.BlockSpec((1, ts, TILE_L), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        rays = [jnp.ones((1, ts, TILE_L), jnp.float32) * 0.1
                for _ in range(6)]
        for variant in ("base", "ilp", "slice", "sliceilp"):
            fn = jax.jit(lambda *a, v=variant: pl.pallas_call(
                functools.partial(leaf_kernel, v),
                grid=(1,),
                in_specs=[spec] * 6 + [_FULL],
                out_specs=[pl.BlockSpec((1, 8, TILE_L), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)],
                out_shape=[jax.ShapeDtypeStruct((1, 8, TILE_L), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024,
                ),
            )(*a))
            out = fn(*rays, ds.ptris)
            float(jnp.sum(out[0]))
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(*rays, ds.ptris)
                float(jnp.sum(out[0]))
            dt = (time.perf_counter() - t0) / REPS
            iters = K // 8
            print(f"leaf ts={ts:2d} {variant:6s} ({ts*TILE_L:5d} rays): "
                  f"{dt*FREQ_GHZ*1e9/iters:7.1f} cyc/visit "
                  f"({dt*FREQ_GHZ*1e9/iters/8:6.1f} cyc/tri)", flush=True)


def main():
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene

    scene = create_benchmark_atrium(300_000)
    ds, _ = bake_scene(scene, leaf_size=8)

    rays = [jnp.ones((1, TILE_S, TILE_L), jnp.float32) * 0.1 for _ in range(6)]

    for variant in ("full", "nored", "noslab", "extracts", "rowonly",
                    "empty"):
        fn = jax.jit(lambda *a, v=variant: pl.pallas_call(
            functools.partial(kernel, v),
            grid=(1,),
            in_specs=[_RAY_SPEC] * 6 + [_FULL],
            out_specs=[pl.BlockSpec((1, 8, TILE_L), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((1, 8, TILE_L), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024,
            ),
        )(*a))
        out = fn(*rays, ds.pnodes)
        float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*rays, ds.pnodes)
            float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{variant:10s} {dt*1e6:9.1f} us  "
              f"{dt*FREQ_GHZ*1e9/K:7.1f} cyc/iter", flush=True)


if __name__ == "__main__":
    if "--leaf" in sys.argv:
        leaf_main()
    else:
        main()
