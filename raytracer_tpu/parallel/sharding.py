"""Multi-chip rendering: pixel-tile data parallelism over a device mesh.

The reference's only parallelism is per-pixel SPMD within one GPU
(`vkCmdTraceRaysKHR(width, height, 1)`, command_buffer.odin:261-273); it has
no multi-device code at all (SURVEY.md §2.7). The TPU-native scaling story:

  - 1-D `jax.sharding.Mesh` over all chips, axis "pixels".
  - The accumulation buffer f32[N,3] is sharded on its pixel dim; the scene
    pytree is fully replicated (scenes are small; rays are embarrassingly
    parallel, so this is pure DP — no TP/PP/EP analog exists or is invented).
  - `shard_map` gives each chip a contiguous pixel tile; per-tile pixel
    offsets keep seeds/camera rays GLOBAL, so the sharded image is
    bit-identical to the single-chip one.
  - There are NO collectives in the hot loop: tiles are disjoint, the scene
    is read-only. The only cross-chip traffic is the final tile gather when
    the host assembles the image (jax.device_get on the sharded array rides
    ICI/DCN via XLA's gather), exactly as SURVEY.md §2.7 prescribes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytracer_tpu.integrator.wavefront import accumulate, render_wavefront
from raytracer_tpu.utils.config import RenderConfig

AXIS = "pixels"


def make_pixel_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (AXIS,))


def shard_accum(accum, mesh: Mesh):
    """Place the accumulation buffer sharded over pixels."""
    return jax.device_put(accum, NamedSharding(mesh, P(AXIS, None)))


def replicate(tree, mesh: Mesh):
    """Replicate the scene pytree / camera UBO on every chip."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(2,)
)
def render_frame_sharded(scene, camera_ubo, accum, frame_number,
                         cfg: RenderConfig, mesh: Mesh):
    """One progressive sample with pixel tiles sharded over `mesh`.

    Requires cfg.num_pixels % mesh.size == 0 (pad the height if needed)."""
    n_dev = mesh.size
    n = cfg.num_pixels
    assert n % n_dev == 0, (
        f"pixel count {n} not divisible by mesh size {n_dev}"
    )
    n_local = n // n_dev

    def tile_fn(scene, camera_ubo, accum_tile, frame_number):
        tile = jax.lax.axis_index(AXIS)
        start = tile.astype(jnp.uint32) * jnp.uint32(n_local)
        radiance = render_wavefront(
            scene, camera_ubo, frame_number, cfg,
            pixel_start=start, num_pixels=n_local,
        )
        return accumulate(accum_tile, radiance, frame_number)

    fn = shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS, None), P()),
        out_specs=P(AXIS, None),
        # The bounce-loop carry mixes tile-varying lanes with initially
        # replicated values (frame counters); skip the varying-axes check.
        check_vma=False,
    )
    return fn(scene, camera_ubo, accum, frame_number)


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(2, 3)
)
def render_frame_restir_sharded(scene, camera_ubo, accum, reservoir,
                                frame_number, cfg: RenderConfig, mesh: Mesh):
    """One ReSTIR DI progressive sample with pixel tiles sharded over `mesh`.

    The reservoir state is sharded alongside the accumulation buffer; spatial
    reuse crosses tile boundaries through per-iteration halo exchanges
    (ppermute of the (radius+1)·width boundary rows — the ONLY in-loop
    collective in the framework). Bit-identical to the single-chip ReSTIR
    path whenever each tile is at least one halo tall (see
    integrator/restir.py:restir_direct)."""
    from raytracer_tpu.integrator.restir import render_frame_restir

    n_dev = mesh.size
    n = cfg.num_pixels
    assert n % n_dev == 0, (
        f"pixel count {n} not divisible by mesh size {n_dev}"
    )
    n_local = n // n_dev

    def tile_fn(scene, camera_ubo, accum_tile, res_tile, frame_number):
        tile = jax.lax.axis_index(AXIS)
        start = tile.astype(jnp.uint32) * jnp.uint32(n_local)
        return render_frame_restir(
            scene, camera_ubo, accum_tile, res_tile, frame_number, cfg,
            pixel_start=start, num_pixels=n_local,
            num_tiles=n_dev, axis_name=AXIS,
        )

    fn = shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS, None), P(AXIS), P()),
        out_specs=(P(AXIS, None), P(AXIS)),
        check_vma=False,
    )
    return fn(scene, camera_ubo, accum, reservoir, frame_number)


class ShardedProgressiveRenderer:
    """Multi-chip variant of api.ProgressiveRenderer: same semantics, pixel
    tiles spread across the mesh. The image() gather is the only collective."""

    def __init__(self, scene, camera=None, config: Optional[RenderConfig] = None,
                 mesh: Optional[Mesh] = None):
        from raytracer_tpu.api import ProgressiveRenderer

        self.mesh = mesh or make_pixel_mesh()
        self._inner = ProgressiveRenderer(scene, camera, config)
        cfg = self._inner.config
        if cfg.num_pixels % self.mesh.size != 0:
            raise ValueError(
                f"{cfg.width}x{cfg.height} pixels do not tile over "
                f"{self.mesh.size} devices; adjust the height"
            )
        self._inner.device_scene = replicate(self._inner.device_scene, self.mesh)
        self._inner.accum = shard_accum(self._inner.accum, self.mesh)
        if self._inner.reservoir is not None:
            self._inner.reservoir = self._shard_reservoir(
                self._inner.reservoir
            )

    def _shard_reservoir(self, reservoir):
        return jax.device_put(
            reservoir, NamedSharding(self.mesh, P(AXIS))
        )

    @property
    def config(self):
        return self._inner.config

    @property
    def frame(self):
        return self._inner.frame

    def reset_accumulation(self):
        self._inner.reset_accumulation()
        self._inner.accum = shard_accum(self._inner.accum, self.mesh)
        if self._inner.reservoir is not None:
            self._inner.reservoir = self._shard_reservoir(
                self._inner.reservoir
            )

    def step(self) -> bool:
        inner = self._inner
        inner.begin_frame()
        limit = inner.config.accumulation_limit
        if limit is not None and inner.frame >= limit:
            return False
        if not hasattr(inner.accum, "sharding") or inner.accum.sharding.is_fully_replicated:
            inner.accum = shard_accum(inner.accum, self.mesh)
        if inner.config.use_restir:
            inner.accum, inner.reservoir = render_frame_restir_sharded(
                inner.device_scene,
                replicate(inner._camera_ubo_dev, self.mesh),
                inner.accum,
                inner.reservoir,
                jnp.uint32(inner.frame),
                inner.config,
                self.mesh,
            )
        else:
            inner.accum = render_frame_sharded(
                inner.device_scene,
                replicate(inner._camera_ubo_dev, self.mesh),
                inner.accum,
                jnp.uint32(inner.frame),
                inner.config,
                self.mesh,
            )
        inner.frame += 1
        return True

    def render(self, num_frames: int):
        for _ in range(num_frames):
            if not self.step():
                break
        return self.image()

    def image(self):
        return self._inner.image()
