"""Phase-level timing of the bench workload on the real TPU.

Times each frame phase in isolation (own jit, forced readback via float(sum)
since block_until_ready is unreliable over the axon tunnel) so optimization
effort goes where the time is. Run via tools/tpu_run.sh.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

WIDTH, HEIGHT = 1920, 1080
REPS = 3


def bench(name, fn, *args):
    # Warm (compile + one run), then time REPS with forced readback.
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:42s} {dt*1e3:9.1f} ms", flush=True)
    return out, dt


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    return [float(jnp.sum(l.astype(jnp.float32))) if hasattr(l, "dtype")
            else l for l in leaves[:1]]


def main():
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops import rng
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3, accel="pallas")
    ds, bvh = bake_scene(scene, leaf_size=cfg.bvh_leaf_size)
    print(f"scene: {scene.num_triangles} tris, depth {ds.bvh_max_depth}, "
          f"lights {ds.num_lights}", flush=True)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}

    n = cfg.num_pixels
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)

    # --- build a depth-0 state and a depth-1 (bounced) state ---
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def make_state0(ubo, cfg):
        seed0 = rng.seed_pixels(pixel_idx, jnp.uint32(1))
        r1, seed_rgen = rng.rnd(seed0)
        r2, seed_rgen = rng.rnd(seed_rgen)
        jitter = 0.5 + (jnp.stack([r1, r2], axis=-1) - 0.5) * 0.4
        origin, direction = wf._camera_rays(
            ubo["inverse_view"], ubo["inverse_proj"], cfg.width, cfg.height,
            jitter, pixel_idx)
        return wf.WavefrontState(
            origin=origin, direction=direction,
            color=jnp.zeros((n, 3), jnp.float32),
            throughput=jnp.ones((n, 3), jnp.float32),
            seed_rgen=seed_rgen, seed=seed_rgen,
            alive=jnp.ones((n,), bool),
            first_bounce=jnp.ones((n,), bool),
            is_specular=jnp.zeros((n,), bool),
            prev_brdf_pdf=jnp.ones((n,), jnp.float32),
            prev_hit_pos=jnp.zeros((n, 3), jnp.float32),
            p_sample_light=jnp.zeros((n,), jnp.float32),
            did_direct=jnp.zeros((n,), bool),
            channel=jnp.full((n,), -1, jnp.int32),
            pixel=jnp.arange(n, dtype=jnp.int32),
        )

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def one_bounce(ds, state, cfg):
        hit = wf._trace(ds, state.origin, state.direction, cfg, state.alive)
        state, payload_hit, _ = wf._shade(ds, state, hit, cfg)
        return state._replace(alive=state.alive & payload_hit)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def sort_only(ds, state, cfg):
        return wf._sort_wavefront(state, ds)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def trace_only(ds, state, cfg):
        return wf._trace(ds, state.origin, state.direction, cfg, state.alive)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def trace_and_shade_no_nee(ds, state, cfg):
        hit = wf._trace(ds, state.origin, state.direction, cfg, state.alive)
        st, ph, _ = wf._shade(ds, state, hit, cfg, suppress_nee=True)
        return st.color

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def shade_only(ds, state, hit, cfg):
        st, ph, sh = wf._shade(ds, state, hit, cfg)
        return st.color

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def shade_only_no_nee(ds, state, hit, cfg):
        st, ph, sh = wf._shade(ds, state, hit, cfg, suppress_nee=True)
        return st.color

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def occl_down(ds, state, cfg):
        # Occlusion trace pattern resembling NEE: from hit points toward a
        # fixed light direction-ish target; uses the state's origins.
        d = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        return wf._occluded(ds, state.origin, d, jnp.full((n,), 8.0),
                            jnp.full((n,), -1, jnp.int32), cfg, state.alive)

    state0 = make_state0(ubo, cfg)
    force(state0)

    print("--- phases ---", flush=True)
    bench("primary closest (coherent)", trace_only, ds, state0, cfg)
    hit0 = trace_only(ds, state0, cfg)
    force(hit0)
    state1, _ = bench("bounce0 shade+NEE (incl occl)",
                      lambda ds, s, c: one_bounce(ds, s, c), ds, state0, cfg)
    bench("bounce0 shade only (no NEE)", shade_only_no_nee, ds, state0, hit0,
          cfg)
    alive1 = int(jnp.sum(state1.alive))
    print(f"alive after bounce 0: {alive1}/{n} ({100*alive1/n:.0f}%)",
          flush=True)

    state1s, _ = bench("sort (2M lanes, ~20 arrays)", sort_only, ds, state1,
                       cfg)
    bench("bounce1 closest (sorted)", trace_only, ds, state1s, cfg)
    hit1 = trace_only(ds, state1s, cfg)
    force(hit1)
    bench("bounce1 shade+NEE (incl occl)", shade_only, ds, state1s, hit1, cfg)
    bench("bounce1 shade only (no NEE)", shade_only_no_nee, ds, state1s, hit1,
          cfg)
    # NEE with the occlusion traversal stubbed out: isolates the pure
    # light-sampling/BRDF/MIS math + RNG cost of the NEE block.
    orig_occluded = wf._occluded
    try:
        wf._occluded = lambda scene, o, d, t, s, cfg2, a: jnp.zeros(
            o.shape[0], bool)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def shade_only_stub_occl(ds, state, hit, cfg):
            st, ph, sh = wf._shade(ds, state, hit, cfg)
            return st.color

        bench("bounce1 shade+NEE (occl stubbed)", shade_only_stub_occl,
              ds, state1s, hit1, cfg)
    finally:
        wf._occluded = orig_occluded
    bench("occlusion (vertical rays, live mask)", occl_down, ds, state1s, cfg)

    state2 = one_bounce(ds, state1s, cfg)
    force(state2)
    alive2 = int(jnp.sum(state2.alive))
    print(f"alive after bounce 1: {alive2}/{n} ({100*alive2/n:.0f}%)",
          flush=True)
    state2s = sort_only(ds, state2, cfg)
    force(state2s)
    bench("bounce2 closest (sorted)", trace_only, ds, state2s, cfg)
    hit2 = trace_only(ds, state2s, cfg)
    force(hit2)
    bench("bounce2 shade+NEE (incl occl)", shade_only, ds, state2s, hit2, cfg)

    # Full frame for reference.
    from raytracer_tpu.integrator.wavefront import render_wavefront

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def frame(ds, ubo, f, cfg):
        return render_wavefront(ds, ubo, f, cfg)

    bench("FULL FRAME", frame, ds, ubo, jnp.uint32(1), cfg)


if __name__ == "__main__":
    main()
