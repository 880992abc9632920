"""Is the production sort's [N,17] gather a >16-width fast-path miss?

tools/gather_lab.py measured standalone [2M,17] ~60 ms vs [2M,8] ~10 ms
(width crossing 16 leaves the fast path), but the round-3 note says the
production sort's gather is "76 ms either way" in situ. 17 = 16 + 1:
bitcasting ONE f32 column (p_sample_light) into the integer gather makes
the splits exactly [N,16] f32 + [N,6] u32. This measures the production
_sort_wavefront against that repacked variant on the real bounce-1
wavefront, end-to-end under one jit each, with equality of every field.

Run: python -u tools/r3_sort16_lab.py
"""

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
    float(jnp.sum(out.origin))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out.origin))
    return out, (time.perf_counter() - t0) / REPS


def sort16(state, scene):
    """_sort_wavefront with p_sample_light bitcast into the int gather:
    [N,16] f32 + [N,6] u32."""
    extent = jnp.maximum(scene.scene_max - scene.scene_min, 1e-6)
    q = jnp.clip(
        (state.origin - scene.scene_min) / extent * 511.0, 0.0, 511.0
    ).astype(jnp.uint32)
    morton = (
        wf._morton9(q[:, 0]) | (wf._morton9(q[:, 1]) << 1)
        | (wf._morton9(q[:, 2]) << 2)
    )
    octant = (
        (state.direction[:, 0] >= 0).astype(jnp.uint32)
        | ((state.direction[:, 1] >= 0).astype(jnp.uint32) << 1)
        | ((state.direction[:, 2] >= 0).astype(jnp.uint32) << 2)
    )
    dead = (~state.alive).astype(jnp.uint32)
    key = (dead << 31) | (octant << 27) | morton
    perm = jnp.argsort(key)

    packed_f = jnp.concatenate(
        [
            state.origin,
            state.direction,
            state.color,
            state.throughput,
            state.prev_hit_pos,
            state.prev_brdf_pdf[:, None],
        ],
        axis=1,
    )[perm]
    flags = (
        state.alive.astype(jnp.uint32)
        | (state.first_bounce.astype(jnp.uint32) << 1)
        | (state.is_specular.astype(jnp.uint32) << 2)
        | (state.did_direct.astype(jnp.uint32) << 3)
    )
    packed_i = jnp.stack(
        [
            state.seed_rgen,
            state.seed,
            flags,
            state.channel.astype(jnp.uint32),
            state.pixel.astype(jnp.uint32),
            jax.lax.bitcast_convert_type(state.p_sample_light, jnp.uint32),
        ],
        axis=1,
    )[perm]
    return wf.WavefrontState(
        origin=packed_f[:, 0:3],
        direction=packed_f[:, 3:6],
        color=packed_f[:, 6:9],
        throughput=packed_f[:, 9:12],
        prev_hit_pos=packed_f[:, 12:15],
        prev_brdf_pdf=packed_f[:, 15],
        p_sample_light=jax.lax.bitcast_convert_type(
            packed_i[:, 5], jnp.float32
        ),
        seed_rgen=packed_i[:, 0],
        seed=packed_i[:, 1],
        alive=(packed_i[:, 2] & 1) != 0,
        first_bounce=(packed_i[:, 2] & 2) != 0,
        is_specular=(packed_i[:, 2] & 4) != 0,
        did_direct=(packed_i[:, 2] & 8) != 0,
        channel=packed_i[:, 3].astype(jnp.int32),
        pixel=packed_i[:, 4].astype(jnp.int32),
    )


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
    jax.block_until_ready(state1.origin)

    prod = jax.jit(lambda s: wf._sort_wavefront(s, ds))
    ref, dt0 = measure(prod, state1)
    print(f"production [N,17]+[N,5] sort: {dt0*1e3:7.1f} ms", flush=True)

    v16 = jax.jit(lambda s: sort16(s, ds))
    got, dt1 = measure(v16, state1)
    print(f"repacked  [N,16]+[N,6] sort: {dt1*1e3:7.1f} ms "
          f"({dt0/dt1:.3f}x)", flush=True)

    for f in ref._fields:
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        assert np.array_equal(a, b), f"field {f} differs"
    print("all fields identical", flush=True)


if __name__ == "__main__":
    main()
