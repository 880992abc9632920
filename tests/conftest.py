"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (SURVEY.md §4: multi-chip tests
use the CPU fake backend; the real chip is exercised by bench.py and the
driver's compile checks)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize register() overrides jax_platforms to
# "axon,cpu" at import time; force it back so tests run on the virtual
# 8-device CPU mesh regardless of plugin presence.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    from raytracer_tpu.scene.model import create_cornell_box

    return create_cornell_box()


@pytest.fixture(scope="session")
def cornell_device_scene(cornell_scene):
    from raytracer_tpu.scene.device_scene import bake_scene

    ds, _bvh = bake_scene(cornell_scene)
    return ds


@pytest.fixture()
def rng_np():
    return np.random.default_rng(seed=1234)
