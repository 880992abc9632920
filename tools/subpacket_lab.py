"""Sub-packet union measurement: visits/packet at 128..1024-ray granularity.

The packet kernel pays the UNION of its rays' BVH visits; Mosaic allows
dynamic indexing on the SUBLANE dim, so a kernel where each of the 8 sublane
rows traverses its OWN 128-ray sub-packet is implementable (per-row node and
leaf fetch, [8,1]->[8,128] lane broadcasts, no scalar extracts). Whether it
pays depends on how much the union shrinks from 4096 -> 128 rays.

Method: group the sorted bounce-1 wavefront into g-ray groups, pad each to an
[8,128] tile with dead rows (dead lanes never pass a slab test, so a tile's
visit count == the union of its g real rays), and run the counting kernel.

Also reports max-over-8-adjacent-subpackets (the lockstep cost of an 8-row
divergent kernel instance) and the leaf fraction.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import tools.kernel_lab as kl  # noqa: E402
from tools.sort_lab import sl_make_state1, _primary_rays  # noqa: E402
from raytracer_tpu.integrator.wavefront import _sort_wavefront  # noqa: E402
from raytracer_tpu.ops.camera import Camera  # noqa: E402
from raytracer_tpu.scene.benchmark import create_benchmark_atrium  # noqa: E402
from raytracer_tpu.scene.device_scene import bake_scene  # noqa: E402
from raytracer_tpu.utils.config import RenderConfig  # noqa: E402

WIDTH, HEIGHT = 1920, 1080


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

    state1 = sl_make_state1(ds, ubo, cfg, n)
    state1s = jax.jit(lambda s, d: _sort_wavefront(s, d))(state1, ds)
    float(jnp.sum(state1s.origin))
    o0, d0, a0 = _primary_rays(ds, ubo, cfg, n)

    # Limit to a sample (memory: each 128-group becomes a full tile).
    SAMPLE_GROUPS = 4096  # x g rays

    for label, (origin, direction, alive) in (
        ("bounce1", (state1s.origin, state1s.direction, state1s.alive)),
        ("primary", (o0, d0, a0)),
    ):
        origin = np.asarray(origin)
        direction = np.asarray(direction)
        alive = np.asarray(alive)
        for g in (128, 256, 512, 1024):
            rows = g // 128
            ngroups = min(SAMPLE_GROUPS, n // g)
            # Sample contiguous groups evenly across the wavefront.
            stride = (n // g) // ngroups
            idx = (np.arange(ngroups) * stride)[:, None] * g + np.arange(g)
            o = origin[idx.reshape(-1)]
            d = direction[idx.reshape(-1)]
            al = alive[idx.reshape(-1)]
            tm = np.where(al, 1e4, 1e-3).astype(np.float32)

            # Pad each group to an [8,128] tile with dead rows.
            def tile(a, fill):
                a = a.reshape(ngroups, rows, 128)
                out = np.full((ngroups, 8, 128), fill, np.float32)
                out[:, :rows, :] = a
                return jnp.asarray(out)

            args = [tile(o[:, c], 0.0) for c in range(3)]
            args += [tile(d[:, c], 1.0) for c in range(3)]
            args += [tile(tm, 1e-3)]
            fn = jax.jit(functools.partial(kl.run_closest_ts, tile_s=8))
            out, dt = kl.measure("sp", fn, *args, ds.root_meta, ds.pnodes,
                                 ds.ptris)
            visits = np.asarray(out[4][:, 0, 0])
            leaves = np.asarray(out[5][:, 0, 0])
            v8max = visits.reshape(-1, 8).max(axis=1) if ngroups % 8 == 0 \
                else visits[: ngroups // 8 * 8].reshape(-1, 8).max(axis=1)
            print(
                f"{label:8s} g={g:5d}: visits/group mean {visits.mean():7.1f}"
                f"  p90 {np.percentile(visits, 90):7.1f}"
                f"  max8adj-mean {v8max.mean():7.1f}"
                f"  leaf% {100*leaves.sum()/max(visits.sum(),1):4.1f}"
                f"  ray-visit-pairs/ray {visits.mean()/g:6.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
