"""Multi-chip scaling evidence on the virtual CPU mesh (VERDICT r2 #8).

Real multi-chip hardware is not attached, so wall-clock scaling cannot be
honestly measured here; what CAN be verified and recorded is the structural
claim behind the linear-scaling story:

  - pixel tiles partition the ray work exactly (per-tile traced-ray counts
    sum to the single-chip count, max/mean imbalance recorded),
  - the sharded image is BIT-IDENTICAL to single-chip at every mesh size
    (global seeds/camera indices; zero collectives in the hot loop),
  - per-device output placement is a true 1/D shard (no replication).

Writes SCALING.json at the repo root. Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python tools/scaling_curve.py
(self-provisions the flag when unset).
"""

import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")


def main():
    import functools

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    from raytracer_tpu.integrator.wavefront import (
        accumulate,
        render_wavefront,
    )
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.parallel.sharding import AXIS
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.scene.model import create_cornell_box
    from raytracer_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=64, height=64).resolve_accel()
    ds, _ = bake_scene(create_cornell_box())
    cam = Camera.create(position=(0, 0, -3), aspect=1.0)
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    # Single-chip reference (with per-frame ray count).
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def single(ds, ubo, frame, cfg):
        rad, stats = render_wavefront(ds, ubo, frame, cfg, with_stats=True)
        return rad, stats["total_rays"]

    ref_img, ref_rays = single(ds, ubo, jnp.uint32(1), cfg)
    ref_img = np.asarray(ref_img)
    ref_rays = int(ref_rays)

    results = {"workload": {"scene": "cornell_box", "resolution": "64x64",
                            "total_rays_single_chip": ref_rays}}
    curve = []
    for d in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:d]), (AXIS,))
        n_local = n // d

        def tile_fn(ds, ubo, frame):
            tile = jax.lax.axis_index(AXIS)
            start = tile.astype(jnp.uint32) * jnp.uint32(n_local)
            rad, stats = render_wavefront(
                ds, ubo, frame, cfg, pixel_start=start,
                num_pixels=n_local, with_stats=True,
            )
            return rad, stats["total_rays"][None]

        fn = jax.jit(shard_map(
            tile_fn, mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(AXIS, None), P(AXIS)),
            check_vma=False,
        ))
        img, tile_rays = fn(ds, ubo, jnp.uint32(1))
        img = np.asarray(img)
        tile_rays = np.asarray(tile_rays).astype(np.int64)
        bit_identical = bool((img == ref_img).all())
        entry = {
            "devices": d,
            "rays_per_tile": tile_rays.tolist(),
            "rays_total": int(tile_rays.sum()),
            "ray_partition_exact": int(tile_rays.sum()) == ref_rays,
            "tile_imbalance_max_over_mean": round(
                float(tile_rays.max() / tile_rays.mean()), 4),
            "bit_identical_to_single_chip": bit_identical,
        }
        curve.append(entry)
        print(entry, flush=True)
        assert bit_identical, f"mesh size {d} diverged from single-chip"
        assert entry["ray_partition_exact"], (
            f"mesh size {d}: ray work not partitioned exactly")

    results["curve"] = curve
    results["claim"] = (
        "Rays are embarrassingly parallel over disjoint pixel tiles with the "
        "scene replicated and ZERO hot-loop collectives (plain path; sharded "
        "ReSTIR adds one halo ppermute pair per spatial tap round). Per-chip "
        "ray throughput is therefore constant in the tile size; chips-to-"
        "target = ceil(200 / headline_mrays_per_chip). Bit-identity and "
        "exact ray partitioning verified above at 1/2/4/8 virtual devices."
    )
    with open("SCALING.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote SCALING.json", flush=True)


if __name__ == "__main__":
    main()
