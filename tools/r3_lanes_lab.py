"""Lane-width sweep for the sub-packet kernel: 128 vs 256 vs 512 rays/row.

A traversal iteration costs ~394 cyc of serial pop/read/extract/route
latency against ~70 cyc of VPU slab work — the VPU idles ~80%. Widening a
row from one [8,128] vreg to 2 or 4 vregs amortizes the serial cost over
2-4x the rays; the price is each row's visit set becoming the UNION of
256/512 rays instead of 128 (unions grow sublinearly on sorted wavefronts:
4096-ray packets had 5360 visits vs 535 per 128 — tools/subpacket_lab.py).
The kernel code is lane-width-generic; this lab re-execs the module with
patched LANES and measures the real bounce-1 closest pass.

Run: python -u tools/r3_lanes_lab.py
"""

import functools
import importlib.util
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

WIDTH, HEIGHT = 1920, 1080
REPS = 3
SP_PATH = "/root/repo/raytracer_tpu/ops/pallas_subpacket.py"


def load_patched(lanes, drain=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = importlib.util.spec_from_file_location(f"sp_{lanes}", SP_PATH)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.LANES = lanes
    m.TILE = m.ROWS * lanes
    m.GROUP_TILES = max(1, (2048 * 128) // lanes)
    m._SP_SPEC = pl.BlockSpec((1, m.ROWS, lanes), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    if drain is not None:
        m.DRAIN_AT = drain
    return m


def _force(out):
    if hasattr(out, "t"):
        return float(jnp.sum(out.t))
    if isinstance(out, (tuple, list)):
        return float(jnp.sum(out[0]))
    return float(jnp.sum(out))


def measure(fn, *args):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        _force(out)
    return out, (time.perf_counter() - t0) / REPS


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    ds, _ = bake_scene(scene, leaf_size=cfg.bvh_leaf_size)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    state1 = sl_make_state1(ds, ubo, cfg, n)
    state1s = jax.jit(lambda s, d: wf._sort_wavefront(s, d))(state1, ds)
    float(jnp.sum(state1s.origin))
    origin, direction, alive = (state1s.origin, state1s.direction,
                                state1s.alive)

    ref_tri = None
    for lanes, drain in ((128, None), (256, None), (256, 6), (256, 8),
                         (512, None), (512, 8)):
        m = load_patched(lanes, drain)
        fn = jax.jit(lambda o, d, s, a, m=m: m.intersect_bvh_subpacket(
            o, d, s, 1e-3, 1e4, active_mask=a))
        rec, dt = measure(fn, origin, direction, ds, alive)
        tri = np.asarray(rec.tri)
        if ref_tri is None:
            ref_tri = tri
            mism = 0
        else:
            mism = int((tri != ref_tri).sum())
        print(f"closest LANES={lanes} drain={drain or 'def'}: "
              f"{dt*1e3:8.1f} ms  mism {mism}", flush=True)

    # Occlusion pass (vertical-ish shadow-like rays, all active).
    l0 = ds.light_center[0]
    hitpos = origin + direction * np.asarray(rec.t)[:, None]
    to_l = l0[None, :] - hitpos
    dist = jnp.sqrt(jnp.sum(to_l * to_l, axis=1))
    sdir = to_l / jnp.maximum(dist, 1e-6)[:, None]
    skip = jnp.full((n,), -1, jnp.int32)
    ref_occ = None

    def _occl(m, o, d, t, s, a):
        t_eff = jnp.where(a, t, cfg.t_min)
        return m.occlusion_bvh_subpacket(o, d, cfg.t_min, t_eff, ds, s)

    for lanes, drain in ((128, None), (256, None), (256, 8), (512, None)):
        m = load_patched(lanes, drain)
        occ, dt = measure(jax.jit(functools.partial(_occl, m)),
                          hitpos, sdir, dist * 0.999, skip, alive)
        occ_np = np.asarray(occ)
        if ref_occ is None:
            ref_occ = occ_np
            mism = 0
        else:
            mism = int((occ_np != ref_occ).sum())
        print(f"occlusion LANES={lanes} drain={drain or 'def'}: "
              f"{dt*1e3:8.1f} ms  mism {mism}", flush=True)


if __name__ == "__main__":
    main()
