"""Multi-chip rendering demo: pixel-tile data parallelism over a device
mesh, with and without ReSTIR DI.

The reference is strictly single-GPU (SURVEY.md §2.7); this is the
TPU-native scaling story: the scene pytree is replicated, the accumulation
buffer (and the ReSTIR reservoir) shard over a 1-D "pixels" mesh, and the
only in-loop collective is ReSTIR's spatial-reuse halo ppermute. Sharded
images are bit-identical to single-chip ones (global seeds/camera indices).

Run from the repo root. On a single-chip machine, force a virtual 8-device
CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # The axon plugin's sitecustomize overrides JAX_PLATFORMS at import
    # time; re-assert the user's choice (same dance as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

if len(jax.devices()) < 2:
    sys.exit("need >= 2 devices; see the module docstring for the CPU mesh")

from raytracer_tpu.api import ProgressiveRenderer  # noqa: E402
from raytracer_tpu.parallel.sharding import (  # noqa: E402
    ShardedProgressiveRenderer,
)
from raytracer_tpu.scene.model import create_cornell_box  # noqa: E402
from raytracer_tpu.utils.config import RenderConfig  # noqa: E402
from raytracer_tpu.utils.image import write_image  # noqa: E402


def main():
    n_dev = len(jax.devices())
    frames = 4

    cfg = RenderConfig(width=64, height=64)
    sharded = ShardedProgressiveRenderer(create_cornell_box(), None, cfg)
    img = sharded.render(frames)
    single = ProgressiveRenderer(create_cornell_box(), None, cfg)
    ref = single.render(frames)
    print(f"path tracing on {n_dev} devices: max |sharded - single| = "
          f"{np.abs(img - ref).max():.2e}")
    write_image("multichip.png", img)

    # ReSTIR DI sharded: the reservoir tiles with the pixels; radius 2 keeps
    # the halo exact at this tile height (see restir_direct docs).
    cfg_r = cfg.replace(use_restir=True, restir_spatial_radius=2.0,
                        restir_spatial_neighbors=2)
    sharded_r = ShardedProgressiveRenderer(create_cornell_box(), None, cfg_r)
    img_r = sharded_r.render(frames)
    ref_r = ProgressiveRenderer(create_cornell_box(), None, cfg_r).render(
        frames)
    print(f"ReSTIR DI on {n_dev} devices:     max |sharded - single| = "
          f"{np.abs(img_r - ref_r).max():.2e}")
    write_image("multichip_restir.png", img_r)


if __name__ == "__main__":
    main()
