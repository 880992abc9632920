"""Does fetch_surface's [N <- T,24] tri_shade gather pay the >16-width
slow path, like the sort's [N,17] did (tools/r3_sort16_lab.py, 1.14x)?

Variants on the real bounce-1 hit set:
  prod    one [N,24] row gather + one [N,16] material gather
  split   [N,16] + [N,8] slices of tri_shade (two fast-path gathers)

Run: python -u tools/r3_fetch_lab.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from raytracer_tpu.integrator import wavefront as wf  # noqa: E402

WIDTH, HEIGHT = 1920, 1080
REPS = 8


def measure(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out[0]))
    return out, (time.perf_counter() - t0) / REPS


def main():
    from tools.sort_lab import sl_make_state1
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
    hit1 = jax.jit(functools.partial(wf._trace, cfg=cfg))(
        ds, state1s.origin, state1s.direction, active=state1s.alive)
    lane = state1s.alive & hit1.hit
    jax.block_until_ready(hit1.t)

    @jax.jit
    def prod(hit, rdir, lane):
        s = wf.fetch_surface(ds, hit, rdir, lane)
        return (s.world_pos, s.world_nrm, s.albedo, s.roughness, s.mat)

    ref, dt0 = measure(prod, hit1, state1s.direction, lane)
    print(f"prod  fetch_surface ([N,24]+[N,16]): {dt0*1e3:7.1f} ms",
          flush=True)

    t_count = ds.tri_shade.shape[0]
    ts_lo = ds.tri_shade[:, :16]
    ts_hi = ds.tri_shade[:, 16:]

    # fetch_surface's internals aren't parameterizable; measure the GATHER
    # difference directly (the rest of the math is identical either way).
    @jax.jit
    def g24(hit):
        ti = jnp.clip(hit.tri, 0, t_count - 1)
        return (ds.tri_shade[ti],)

    @jax.jit
    def g16_8(hit):
        ti = jnp.clip(hit.tri, 0, t_count - 1)
        return (ts_lo[ti], ts_hi[ti])

    _, dt1 = measure(g24, hit1)
    print(f"gather [N<-T,24]:                    {dt1*1e3:7.1f} ms",
          flush=True)
    out2, dt2 = measure(g16_8, hit1)
    print(f"gather [N<-T,16] + [N<-T,8]:         {dt2*1e3:7.1f} ms "
          f"({dt1/dt2:.3f}x)", flush=True)
    a = np.asarray(jnp.concatenate(out2, axis=1))
    b = np.asarray(g24(hit1)[0])
    assert np.array_equal(a, b)
    print("identical rows", flush=True)


if __name__ == "__main__":
    main()
