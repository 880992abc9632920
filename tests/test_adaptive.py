"""Adaptive sampling (integrator/adaptive.py, BEYOND-REFERENCE).

Exactness contract: each pixel's sample stream is indexed by its own
count, so adaptive_tol=0 must reproduce the plain progressive
accumulation bit-for-bit; with a positive tolerance, converged pixels
freeze and the image stays within an SSIM gate of the full render.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.api import ProgressiveRenderer
from raytracer_tpu.integrator.adaptive import (
    AdaptiveState,
    active_mask,
    render_frame_adaptive,
)
from raytracer_tpu.integrator.wavefront import render_frame
from raytracer_tpu.ops.camera import Camera
from raytracer_tpu.scene.device_scene import bake_scene
from raytracer_tpu.scene.model import create_cornell_box
from raytracer_tpu.utils.config import RenderConfig

W = H = 16
FRAMES = 4


def _setup(**cfg_kw):
    scene = create_cornell_box()
    cfg = RenderConfig(width=W, height=H, accel="bvh", **cfg_kw)
    ds, _ = bake_scene(scene)
    cam = Camera.create(position=(0.0, 0.0, -3.0), aspect=W / H)
    mats = cam.matrices()
    ubo = {
        "inverse_view": jnp.asarray(mats["inverse_view"]),
        "inverse_proj": jnp.asarray(mats["inverse_proj"]),
    }
    return ds, ubo, cfg


def test_tol_zero_matches_plain_accumulation_bitwise():
    ds, ubo, cfg = _setup(adaptive_tol=0.0)
    accum = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    st = AdaptiveState.empty(cfg.num_pixels)
    plain = jax.jit(lambda a, f: render_frame(ds, ubo, a, f, cfg))
    adapt = jax.jit(lambda s: render_frame_adaptive(ds, ubo, s, cfg))
    for f in range(FRAMES):
        accum = plain(accum, jnp.uint32(f))
        st = adapt(st)
    assert np.array_equal(np.asarray(accum), np.asarray(st.mean))
    assert (np.asarray(st.count) == FRAMES).all()


def test_background_pixels_converge_and_freeze():
    # Miss-only pixels have zero luminance variance: after
    # adaptive_min_frames samples they must retire, and their mean must
    # stop changing while unconverged pixels keep counting.
    ds, ubo, cfg = _setup(adaptive_tol=1e-4, adaptive_min_frames=2)
    st = AdaptiveState.empty(cfg.num_pixels)
    adapt = jax.jit(lambda s: render_frame_adaptive(ds, ubo, s, cfg))
    for _ in range(3):
        st = adapt(st)
    act = np.asarray(active_mask(st, cfg))
    frozen = ~act
    assert frozen.any(), "zero-variance pixels should have retired"
    assert act.any(), "noisy pixels should still be sampling"
    mean_before = np.asarray(st.mean)
    count_before = np.asarray(st.count)
    st = adapt(st)
    assert np.array_equal(np.asarray(st.mean)[frozen], mean_before[frozen])
    assert np.array_equal(np.asarray(st.count)[frozen],
                          count_before[frozen])
    assert (np.asarray(st.count)[act] == count_before[act] + 1).all()


def test_renderer_adaptive_quality_and_checkpoint(tmp_path):
    scene = create_cornell_box()
    cfg_a = RenderConfig(width=W, height=H, accel="bvh", adaptive_tol=0.05,
                         adaptive_min_frames=4)
    cfg_p = RenderConfig(width=W, height=H, accel="bvh")
    ra = ProgressiveRenderer(create_cornell_box(), config=cfg_a)
    rp = ProgressiveRenderer(scene, config=cfg_p)
    for _ in range(12):
        ra.step()
        rp.step()
    a = ra.image()
    p = rp.image()
    # A pixel only freezes when its mean's relative standard error is
    # under tol, so the adaptive image must track the full render within
    # a small multiple of tol in mean relative error (SSIM at 16x16 with
    # few samples is noise-dominated and not the right gate).
    rel = np.abs(a - p).mean() / max(p.mean(), 1e-6)
    assert rel < 0.1, rel
    assert ra.adaptive_converged_fraction() > 0.0

    # Checkpoint roundtrip carries the Welford state exactly.
    ck = str(tmp_path / "a.npz")
    ra.save_checkpoint(ck)
    rb = ProgressiveRenderer(create_cornell_box(), config=cfg_a)
    rb.load_checkpoint(ck)
    for st_field in ("mean", "m2", "count"):
        assert np.array_equal(
            np.asarray(getattr(ra.adaptive, st_field)),
            np.asarray(getattr(rb.adaptive, st_field)),
        )


def test_plain_checkpoint_into_adaptive_keeps_sampling(tmp_path):
    """Resuming a NON-adaptive checkpoint with adaptive sampling has no
    variance history: m2=0 would instantly mark every pixel converged and
    freeze the render; instead nothing may retire (m2 seeds to +inf) and
    the accumulation must keep improving."""
    ck = str(tmp_path / "plain.npz")
    cfg_p = RenderConfig(width=8, height=8, accel="bvh")
    rp = ProgressiveRenderer(create_cornell_box(), config=cfg_p)
    for _ in range(9):  # past adaptive_min_frames
        rp.step()
    rp.save_checkpoint(ck)

    cfg_a = RenderConfig(width=8, height=8, accel="bvh", adaptive_tol=0.5)
    ra = ProgressiveRenderer(create_cornell_box(), config=cfg_a)
    ra.load_checkpoint(ck)
    assert ra.adaptive_converged_fraction() == 0.0
    before = np.asarray(ra.adaptive.count).copy()
    ra.step()
    assert (np.asarray(ra.adaptive.count) == before + 1).all()
    assert ra.adaptive_converged_fraction() == 0.0  # still no history


def test_adaptive_checkpoint_stores_image_once(tmp_path):
    cfg = RenderConfig(width=8, height=8, accel="bvh", adaptive_tol=0.1)
    r = ProgressiveRenderer(create_cornell_box(), config=cfg)
    r.step()
    ck = str(tmp_path / "a.npz")
    r.save_checkpoint(ck)
    keys = set(np.load(ck).keys())
    assert "adaptive_mean" not in keys  # the mean IS accum
    assert {"accum", "adaptive_m2", "adaptive_count"} <= keys


def test_adaptive_resets_with_accumulation():
    """Camera/scene invalidation must restart the Welford state along with
    the accumulation (stale variance would freeze pixels against the OLD
    image)."""
    cfg = RenderConfig(width=8, height=8, accel="bvh", adaptive_tol=0.1)
    r = ProgressiveRenderer(create_cornell_box(), config=cfg)
    r.step()
    r.step()
    assert (np.asarray(r.adaptive.count) == 2).all()
    r.set_camera(Camera.create(position=(0.1, 0.0, -3.0), aspect=1.0))
    r.step()
    assert (np.asarray(r.adaptive.count) == 1).all()
    assert r.frame == 1


def test_restir_and_adaptive_are_exclusive():
    with pytest.raises(ValueError):
        ProgressiveRenderer(
            create_cornell_box(),
            config=RenderConfig(width=8, height=8, accel="bvh",
                                adaptive_tol=0.1, use_restir=True),
        )


def test_adaptive_sharded_bit_identical():
    from raytracer_tpu.parallel.sharding import (
        make_pixel_mesh,
        render_frame_adaptive_sharded,
        shard_adaptive,
    )

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    ds, ubo, cfg = _setup(adaptive_tol=0.1, adaptive_min_frames=2)
    st1 = AdaptiveState.empty(cfg.num_pixels)
    adapt = jax.jit(lambda s: render_frame_adaptive(ds, ubo, s, cfg))
    mesh = make_pixel_mesh(devs[:4])
    st4 = shard_adaptive(AdaptiveState.empty(cfg.num_pixels), mesh)
    from raytracer_tpu.parallel.sharding import replicate

    ds4 = replicate(ds, mesh)
    ubo4 = replicate(ubo, mesh)
    for _ in range(3):
        st1 = adapt(st1)
        st4 = render_frame_adaptive_sharded(ds4, ubo4, st4, cfg, mesh)
    # Same comparison convention as test_sharding.py: per-lane math is
    # identical, but XLA fuses differently at tile vs full shapes (ULP).
    for f in ("mean", "m2"):
        np.testing.assert_allclose(
            np.asarray(getattr(st1, f)), np.asarray(getattr(st4, f)),
            rtol=1e-5, atol=1e-6, err_msg=f,
        )
    assert np.array_equal(np.asarray(st1.count), np.asarray(st4.count))
