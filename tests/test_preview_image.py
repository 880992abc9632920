"""preview_image: the scaled, denoised, upscaled side-channel render for
interactive cadence (the reference's live viewport is its raw accumulating
image, ui.odin:491-571; the TPU build trades 1/k^2 of the rays for a
filtered full-size preview). Must never touch progressive state."""

import numpy as np
import pytest


def _renderer(width=32, height=32, mesh=None, **cfg_kwargs):
    from raytracer_tpu.api import ProgressiveRenderer
    from raytracer_tpu.scene.model import create_cornell_box
    from raytracer_tpu.utils.config import RenderConfig

    return ProgressiveRenderer(
        create_cornell_box(), None,
        RenderConfig(width=width, height=height, **cfg_kwargs), mesh=mesh,
    )


def test_preview_shape_and_state_untouched():
    r = _renderer()
    r.step()
    accum_before = np.asarray(r.accum).copy()
    frame_before = r.frame
    img = r.preview_image(scale=4, denoise=True)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0
    assert r.frame == frame_before
    assert np.array_equal(np.asarray(r.accum), accum_before)


def test_preview_deterministic_and_decorrelated():
    r = _renderer()
    r.step()
    a = r.preview_image(scale=2)
    b = r.preview_image(scale=2)
    # Same frame index => same RNG streams => identical preview.
    assert np.array_equal(a, b)
    r.step()
    c = r.preview_image(scale=2)
    # Advancing the frame decorrelates the preview sample.
    assert not np.array_equal(a, c)


def test_preview_scale_one_no_denoise_is_a_raw_sample():
    r = _renderer(width=16, height=16)
    img = r.preview_image(scale=1, denoise=False)
    assert img.shape == (16, 16, 3)
    # frame 0 preview = frame 0 radiance = what step() would accumulate.
    r.step()
    assert np.allclose(img, np.asarray(r.accum).reshape(16, 16, 3),
                       atol=1e-6)


def test_preview_brightness_tracks_full_render():
    r = _renderer()
    full = r.preview_image(scale=1, denoise=False)
    quarter = r.preview_image(scale=4, denoise=True)
    # Not the same pixels, but the same scene: mean luminance agrees.
    assert abs(quarter.mean() - full.mean()) / full.mean() < 0.35


def test_preview_denoise_smooths():
    r = _renderer()
    raw = r.preview_image(scale=2, denoise=False)
    den = r.preview_image(scale=2, denoise=True)
    # The a-trous filter reduces high-frequency energy on 1-spp noise.
    def hf(img):
        return np.abs(np.diff(img, axis=0)).mean()

    assert hf(den) < hf(raw)


def test_preview_sharded_matches_across_meshes():
    import jax

    from raytracer_tpu.parallel.sharding import make_pixel_mesh

    # 32x32 previews at scale 2 -> 16x16 = 256 px, divisible by 8.
    r8 = _renderer(mesh=make_pixel_mesh(jax.devices()[:8]))
    r1m = _renderer(mesh=make_pixel_mesh(jax.devices()[:1]))
    a = r8.preview_image(scale=2, denoise=True)
    b = r1m.preview_image(scale=2, denoise=True)
    # Seam-free tiling with global seeds: mesh sizes agree to float
    # reassociation (a seed/tile bug would change the noise by O(1)) —
    # the suite's sharded-vs-single standard (test_sharding.py).
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    c = _renderer().preview_image(scale=2, denoise=True)
    np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-6)


def test_preview_sharded_indivisible_raises():
    import jax

    from raytracer_tpu.parallel.sharding import make_pixel_mesh

    mesh = make_pixel_mesh(jax.devices()[:8])
    r = _renderer(width=24, height=24, mesh=mesh)
    with pytest.raises(ValueError, match="does not tile"):
        # 24//7 x 24//7 = 3x3 = 9 px, 9 % 8 != 0.
        r.preview_image(scale=7)


def test_preview_reflects_pending_camera_and_scene_edits():
    """The edit->preview loop must not require an interleaved step():
    preview_image replays the change journal / camera dirty flag itself
    (it IS the editor-facing readback)."""
    import dataclasses

    from raytracer_tpu.ops.camera import Camera

    r = _renderer()
    a = r.preview_image(scale=2, denoise=False)
    # Camera move, then preview WITHOUT step(): must show the new view.
    r.set_camera(Camera.create(position=(0.4, 0.2, -2.5), aspect=1.0))
    b = r.preview_image(scale=2, denoise=False)
    assert not np.array_equal(a, b)
    # Scene edit (repaint every wall emissive off->on would be drastic;
    # brighten the light instead), then preview WITHOUT step().
    li = next(i for i, m in enumerate(r.scene.materials)
              if m.emission_power > 0)
    m = r.scene.materials[li]
    r.scene.update_material(
        li, dataclasses.replace(m, emission_power=m.emission_power * 8))
    c = r.preview_image(scale=2, denoise=False)
    assert c.mean() > b.mean() * 1.5  # visibly brighter scene


def test_preview_gbuffer_cache_invalidated_on_edit():
    import dataclasses

    r = _renderer()
    r.preview_image(scale=2, denoise=True)
    assert r._preview_gbuffers
    # A material edit must drop the cached preview G-buffers (albedo feeds
    # the filter's demodulation).
    mat = dataclasses.replace(r.scene.materials[0], albedo=(0.9, 0.1, 0.1))
    r.scene.update_material(0, mat)
    r.step()
    assert r._preview_gbuffers == {}


def test_cli_preview_scale(tmp_path):
    from raytracer_tpu.cli import main
    from raytracer_tpu.utils.image import read_png

    out = str(tmp_path / "p.png")
    rc = main(["/root/reference/scenes/cornell_box.json",
               "--width", "32", "--height", "32", "--accel", "bvh",
               "--spp", "2", "--out", out,
               "--preview", "1", "--preview-scale", "2"])
    assert rc == 0
    # Final write is the full-resolution accumulated image.
    assert read_png(out).shape == (32, 32, 3)


def test_aovs_shapes_and_semantics():
    from raytracer_tpu.integrator.denoise import MISS_DEPTH

    r = _renderer()
    aov = r.aovs()
    assert set(aov) == {"normal", "depth", "albedo"}
    assert aov["normal"].shape == (32, 32, 3)
    assert aov["depth"].shape == (32, 32)
    assert aov["albedo"].shape == (32, 32, 3)
    hit = aov["depth"] < MISS_DEPTH
    assert hit.any()
    # Hit normals are unit; miss normals are zero (denoise.py contract).
    n = np.linalg.norm(aov["normal"], axis=-1)
    assert np.allclose(n[hit], 1.0, atol=1e-4)
    assert np.allclose(n[~hit], 0.0)
    assert np.allclose(aov["albedo"][~hit], 1.0)
    # The AOV pass shares the denoiser G-buffer cache.
    assert r._gbuffer is not None
