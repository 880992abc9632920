"""Feasibility: fast alternatives to per-scalar VMEM extracts in leaves.

  smem   — DMA the [1,96] leaf row into SMEM scratch, scalar-read from SMEM
  transp — transpose the row in-kernel, strided sublane slices -> [8,1] cols
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
    TILE_L, TRI_STRIDE, _moller_scalar_tri, _FULL,
)

K = 65536
FREQ_GHZ = 0.94
REPS = 3
TS = 8


def smem_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                ptris_ref, acc_ref, srow, sem):
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
        dma = pltpu.make_async_copy(
            ptris_ref.at[pl.ds(block, 1), :], srow, sem
        )
        dma.start()
        dma.wait()
        btri = acc
        for k in range(8):
            tv = [srow[0, k * TRI_STRIDE + c] for c in range(9)]
            t, u, v, valid = _moller_scalar_tri(
                tv, ox, oy, oz, dx, dy, dz, t_min, bt
            )
            tri_k = srow[0, k * TRI_STRIDE + 9].astype(jnp.int32)
            bt = jnp.where(valid, t, bt)
            btri = jnp.where(valid, tri_k, btri)
        return btri, bt

    acc, bt = jax.lax.fori_loop(
        0, K, body,
        (jnp.full((TS, TILE_L), -1, jnp.int32),
         jnp.full((TS, TILE_L), 1e4, jnp.float32)),
    )
    acc_ref[0] = acc[:8] + bt[:8].astype(jnp.int32)


def transp_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  ptris_ref, acc_ref):
    # Component-major leaf row: lanes [8c .. 8c+8) = component c of tris
    # 0..7. Transposed once per leaf -> contiguous [8,1] sublane slices.
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
        row = ptris_ref[pl.ds(block, 1), :]  # [1,96]
        col = jnp.transpose(row, (1, 0))  # [96,1]
        tv = [col[8 * c:8 * c + 8, :] for c in range(10)]
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, trif) = tv
        tric = trif.astype(jnp.int32)
        new_acc = []
        new_bt = []
        for r in range(TS):
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
            )  # [8,128]
            tcand = jnp.where(valid, t, 3.0e38)
            tmin8 = jnp.min(tcand, axis=0, keepdims=True)  # [1,128]
            trimin = jnp.max(
                jnp.where(tcand == tmin8,
                          jnp.broadcast_to(tric, tcand.shape), -1),
                axis=0, keepdims=True,
            )
            win = tmin8 < btr
            new_acc.append(jnp.where(win, trimin, acc[r:r + 1]))
            new_bt.append(jnp.where(win, tmin8, btr))
        return (jnp.concatenate(new_acc, axis=0),
                jnp.concatenate(new_bt, axis=0))

    acc, bt = jax.lax.fori_loop(
        0, K, body,
        (jnp.full((TS, TILE_L), -1, jnp.int32),
         jnp.full((TS, TILE_L), 1e4, jnp.float32)),
    )
    acc_ref[0] = acc[:8] + bt[:8].astype(jnp.int32)


def run(name, kern, scratch):
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene

    scene = create_benchmark_atrium(300_000)
    ds, _ = bake_scene(scene, leaf_size=8)
    spec = pl.BlockSpec((1, TS, TILE_L), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    rays = [jnp.ones((1, TS, TILE_L), jnp.float32) * 0.1 for _ in range(6)]
    fn = jax.jit(lambda *a: pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[spec] * 6 + [_FULL],
        out_specs=[pl.BlockSpec((1, 8, TILE_L), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, 8, TILE_L), jnp.int32)],
        scratch_shapes=scratch,
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
    rays_covered = TS * TILE_L
    print(f"{name:8s} {dt*FREQ_GHZ*1e9/K:7.1f} cyc/leaf-visit "
          f"({rays_covered} rays x 8 tris)", flush=True)


if __name__ == "__main__":
    try:
        run("smem", smem_kernel,
            [pltpu.SMEM((1, 96), jnp.float32), pltpu.SemaphoreType.DMA(())])
    except Exception as e:
        print("smem FAILED:", str(e)[:1500], flush=True)
    try:
        run("transp", transp_kernel, [])
    except Exception as e:
        print("transp FAILED:", str(e)[:300], flush=True)
