"""Sort-key / leaf-size experiments: minimize bounce-wavefront visit counts.

Packet traversal costs the union of its rays' BVH visits, so the sort key
controls everything for incoherent bounce passes (5360 visits/packet vs 604
for coherent primaries at the same cyc/visit). Tests direction-vs-position
bit budgets and BVH leaf size on the real bench wavefront.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.kernel_lab import run_closest_lab, measure  # noqa: E402
from raytracer_tpu.ops.pallas_traverse import (  # noqa: E402
    _ray_tiles, _to_tiles, _tile_count,
)
from raytracer_tpu.integrator.wavefront import _morton9  # noqa: E402

WIDTH, HEIGHT = 1920, 1080


def _mortonN(q, bits):
    """Interleave 3x `bits`-bit ints (bits <= 9)."""
    q = q >> (9 - bits) if bits < 9 else q
    return _morton9(q)


def make_key(state, scene, variant):
    extent = jnp.maximum(scene.scene_max - scene.scene_min, 1e-6)
    qp = jnp.clip(
        (state.origin - scene.scene_min) / extent * 511.0, 0.0, 511.0
    ).astype(jnp.uint32)
    d = state.direction
    dead = (~state.alive).astype(jnp.uint32)
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] >= 0).astype(jnp.uint32) << 2)
    )

    def dirq(bits_per_axis):
        lv = (1 << bits_per_axis) - 1
        qd = jnp.clip((d * 0.5 + 0.5) * (lv + 1), 0, lv).astype(jnp.uint32)
        return (qd[:, 0] | (qd[:, 1] << bits_per_axis)
                | (qd[:, 2] << (2 * bits_per_axis)))

    m27 = (_morton9(qp[:, 0]) | (_morton9(qp[:, 1]) << 1)
           | (_morton9(qp[:, 2]) << 2))
    if variant == "oct3_m27":  # production key
        return (dead << 31) | (octant << 27) | (m27 >> 1)  # (m27 fits 27)
    if variant == "m27_only":
        return (dead << 31) | m27
    if variant == "dir6_m24":
        return (dead << 31) | (dirq(2) << 24) | (m27 >> 3)
    if variant == "dir9_m21":
        return (dead << 31) | (dirq(3) << 21) | (m27 >> 6)
    if variant == "dir12_m18":
        return (dead << 31) | (dirq(4) << 18) | (m27 >> 9)
    if variant == "m21_dir9":   # position-major
        return (dead << 31) | ((m27 >> 6) << 9) | dirq(3)
    raise ValueError(variant)


def main():
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops import rng
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def make_state1(ds, ubo, cfg):
        seed0 = rng.seed_pixels(pixel_idx, jnp.uint32(1))
        r1, seed_rgen = rng.rnd(seed0)
        r2, seed_rgen = rng.rnd(seed_rgen)
        jitter = 0.5 + (jnp.stack([r1, r2], axis=-1) - 0.5) * 0.4
        origin, direction = wf._camera_rays(
            ubo["inverse_view"], ubo["inverse_proj"], cfg.width, cfg.height,
            jitter, pixel_idx)
        st = wf.WavefrontState(
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
        hit = wf._trace(ds, st.origin, st.direction, cfg, st.alive)
        st1, ph, _ = wf._shade(ds, st, hit, cfg)
        return st1._replace(alive=st1.alive & ph)

    @jax.jit
    def sorted_rays(state, ds, key):
        perm = jnp.argsort(key)
        st = jax.tree_util.tree_map(lambda a: a[perm], state)
        tm = jnp.where(st.alive, 1e4, 1e-3)
        nt = _tile_count(n)
        return _ray_tiles(st.origin, st.direction, nt) + [
            _to_tiles(tm, nt, fill=1e-3)
        ]

    for leaf_size in (8,):
        ds, _ = bake_scene(scene, leaf_size=leaf_size)
        state1 = make_state1(ds, ubo, cfg)
        float(jnp.sum(state1.origin))
        n_tiles = _tile_count(n)
        fn = jax.jit(functools.partial(run_closest_lab, variant="nored"))
        for kv in ("oct3_m27", "m27_only", "dir6_m24", "dir9_m21",
                   "dir12_m18", "m21_dir9"):
            key = jax.jit(functools.partial(make_key, variant=kv))(state1, ds)
            rays = sorted_rays(state1, ds, key)
            [float(jnp.sum(r)) for r in rays[:1]]
            out, dt = measure(kv, fn, *rays, ds.root_meta, ds.pnodes,
                              ds.ptris)
            visits = int(jnp.sum(out[4][:, 0, 0]))
            leaves = int(jnp.sum(out[5][:, 0, 0]))
            print(f"leaf{leaf_size} {kv:10s} {dt*1e3:8.1f} ms  "
                  f"visits/packet {visits//n_tiles:6d} "
                  f"(leaf {100*leaves/max(visits,1):.0f}%)", flush=True)


if __name__ == "__main__" and "--tiles" not in sys.argv:
    main()


def tile_sweep():
    """visits/packet vs packet width, production kernel structure."""
    import tools.kernel_lab as kl
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    ds, _ = bake_scene(scene, leaf_size=8)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    import tools.sort_lab as sl
    state1 = sl_make_state1(ds, ubo, cfg, n)
    float(jnp.sum(state1.origin))

    from raytracer_tpu.integrator.wavefront import _sort_wavefront
    state1s = jax.jit(lambda s, d: _sort_wavefront(s, d))(state1, ds)
    float(jnp.sum(state1s.origin))

    for label, st in (("primary", None), ("bounce1", state1s)):
        for tile_s in (8, 16, 32):
            tile = tile_s * 128
            nt = (n + tile - 1) // tile
            if st is None:
                origin, direction, alive = _primary_rays(ds, ubo, cfg, n)
            else:
                origin, direction, alive = st.origin, st.direction, st.alive

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
                        comps.append(a.reshape(nt, tile_s, 128))
                a = jnp.concatenate([tm, jnp.full(nt * tile - n, 1e-3)])
                comps.append(a.reshape(nt, tile_s, 128))
                return comps

            rays = prep(origin, direction, alive)
            [float(jnp.sum(r)) for r in rays[:1]]
            fn = jax.jit(functools.partial(kl.run_closest_ts, tile_s=tile_s))
            out, dt = measure("ts", fn, *rays, ds.root_meta, ds.pnodes,
                              ds.ptris)
            visits = int(jnp.sum(out[4][:, 0, 0]))
            print(f"{label:8s} rays/packet {tile:5d}: {dt*1e3:8.1f} ms  "
                  f"visits/packet {visits//nt:6d}  total visits {visits}",
                  flush=True)


def sl_make_state1(ds, ubo, cfg, n):
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops import rng
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def mk(ds, ubo, cfg):
        seed0 = rng.seed_pixels(pixel_idx, jnp.uint32(1))
        r1, seed_rgen = rng.rnd(seed0)
        r2, seed_rgen = rng.rnd(seed_rgen)
        jitter = 0.5 + (jnp.stack([r1, r2], axis=-1) - 0.5) * 0.4
        origin, direction = wf._camera_rays(
            ubo["inverse_view"], ubo["inverse_proj"], cfg.width, cfg.height,
            jitter, pixel_idx)
        st = wf.WavefrontState(
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
        hit = wf._trace(ds, st.origin, st.direction, cfg, st.alive)
        st1, ph, _ = wf._shade(ds, st, hit, cfg)
        return st1._replace(alive=st1.alive & ph)
    return mk(ds, ubo, cfg)


def _primary_rays(ds, ubo, cfg, n):
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops import rng
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def mk(ubo, cfg):
        seed0 = rng.seed_pixels(pixel_idx, jnp.uint32(1))
        r1, seed_rgen = rng.rnd(seed0)
        r2, seed_rgen = rng.rnd(seed_rgen)
        jitter = 0.5 + (jnp.stack([r1, r2], axis=-1) - 0.5) * 0.4
        o, d = wf._camera_rays(
            ubo["inverse_view"], ubo["inverse_proj"], cfg.width, cfg.height,
            jitter, pixel_idx)
        return o, d, jnp.ones((n,), bool)
    return mk(ubo, cfg)


if __name__ == "__main__" and "--tiles" in sys.argv:
    tile_sweep()
    sys.exit(0)
