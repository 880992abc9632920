"""spp-batching union measurement: does merging S jittered frames into one
sorted wavefront shrink per-sub-packet BVH visit unions ~like shrinking the
group size by S? (The S copies of each pixel's path start nearly identical,
so after sorting, a 128-ray group covers ~1/S the spatial extent.)

MEASURED (300k-tri atrium, bounce-1 wavefront, 1080p, 4096 sampled groups):
    S=1: visits/128-group mean 534.7  p90 1105.0  max8adj 733.4  leaf% 17.1
    S=2: visits/128-group mean 494.0  p90 1055.0  max8adj 692.6  leaf% 16.9
    S=4: visits/128-group mean 478.2  p90 1000.5  max8adj 679.2  leaf% 16.9
    S=8: visits/128-group mean 463.9  p90  995.5  max8adj 668.0  leaf% 16.8

CONCLUSION: dead end. Even 8-frame batching shrinks unions only 13% — after
bounce-1 BRDF sampling the S copies of a pixel's path have fully decorrelated
directions, so sorted neighborhoods don't densify the way primary rays would.
Not worth the S x memory and latency."""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import tools.kernel_lab as kl  # noqa: E402
from raytracer_tpu.integrator import wavefront as wf  # noqa: E402
from raytracer_tpu.ops import rng  # noqa: E402
from raytracer_tpu.ops.camera import Camera  # noqa: E402
from raytracer_tpu.scene.benchmark import create_benchmark_atrium  # noqa: E402
from raytracer_tpu.scene.device_scene import bake_scene  # noqa: E402
from raytracer_tpu.utils.config import RenderConfig  # noqa: E402

WIDTH, HEIGHT = 1920, 1080


def make_state1_frames(ds, ubo, cfg, n, frames):
    """Bounce-1 wavefront for `frames` merged jittered frames: per-frame
    states from the production single-frame path, merged and sorted with the
    production key in numpy (avoids tracing an S*n-lane graph)."""
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def mk(ds, ubo, frame, cfg):
        frame_lane = jnp.full((n,), frame, jnp.uint32)
        seed0 = rng.seed_pixels(pixel_idx, frame_lane)
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
        return st1.origin, st1.direction, st1.alive & ph

    os_, ds_, as_ = [], [], []
    for f in frames:
        o, d, a = mk(ds, ubo, jnp.uint32(f), cfg)
        os_.append(np.asarray(o))
        ds_.append(np.asarray(d))
        as_.append(np.asarray(a))
    origin = np.concatenate(os_)
    direction = np.concatenate(ds_)
    alive = np.concatenate(as_)

    # Production sort key (wavefront._sort_wavefront) in numpy.
    smin = np.asarray(ds.scene_min)
    smax = np.asarray(ds.scene_max)
    extent = np.maximum(smax - smin, 1e-6)
    q = np.clip((origin - smin) / extent * 511.0, 0.0, 511.0).astype(
        np.uint32)

    def m9(x):
        x = x.astype(np.uint64) & 0x1FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = m9(q[:, 0]) | (m9(q[:, 1]) << 1) | (m9(q[:, 2]) << 2)
    octant = ((direction[:, 0] >= 0).astype(np.uint64)
              | ((direction[:, 1] >= 0).astype(np.uint64) << 1)
              | ((direction[:, 2] >= 0).astype(np.uint64) << 2))
    dead = (~alive).astype(np.uint64)
    key = (dead << 31) | (octant << 27) | morton
    perm = np.argsort(key, kind="stable")
    from types import SimpleNamespace
    return SimpleNamespace(origin=origin[perm], direction=direction[perm],
                           alive=alive[perm])


def main():
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

    SAMPLE_GROUPS = 4096
    for S in (1, 2, 4, 8):
        st = make_state1_frames(ds, ubo, cfg, n, list(range(1, 1 + S)))
        origin = np.asarray(st.origin)
        direction = np.asarray(st.direction)
        alive = np.asarray(st.alive)
        total = S * n
        g = 128
        ngroups = min(SAMPLE_GROUPS, total // g)
        stride = (total // g) // ngroups
        idx = (np.arange(ngroups) * stride)[:, None] * g + np.arange(g)
        o = origin[idx.reshape(-1)]
        d = direction[idx.reshape(-1)]
        al = alive[idx.reshape(-1)]
        tm = np.where(al, 1e4, 1e-3).astype(np.float32)

        def tile(a, fill):
            a = a.reshape(ngroups, 1, 128)
            out = np.full((ngroups, 8, 128), fill, np.float32)
            out[:, :1, :] = a
            return jnp.asarray(out)

        args = [tile(o[:, c], 0.0) for c in range(3)]
        args += [tile(d[:, c], 1.0) for c in range(3)]
        args += [tile(tm, 1e-3)]
        fn = jax.jit(functools.partial(kl.run_closest_ts, tile_s=8))
        out, _ = kl.measure("sp", fn, *args, ds.root_meta, ds.pnodes,
                            ds.ptris)
        visits = np.asarray(out[4][:, 0, 0])
        leaves = np.asarray(out[5][:, 0, 0])
        v8 = visits[: ngroups // 8 * 8].reshape(-1, 8).max(axis=1)
        print(f"S={S}: visits/128-group mean {visits.mean():7.1f} "
              f"p90 {np.percentile(visits, 90):7.1f} max8adj {v8.mean():7.1f}"
              f" leaf% {100*leaves.sum()/max(visits.sum(),1):4.1f}",
              flush=True)


if __name__ == "__main__":
    main()
