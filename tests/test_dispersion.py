"""Dielectric transmission + chromatic dispersion (BASELINE config 3)."""

import numpy as np
import pytest

from raytracer_tpu.api import render
from raytracer_tpu.ops.camera import Camera
from raytracer_tpu.scene.model import Material, Scene, create_plane, create_sphere
from raytracer_tpu.utils.config import RenderConfig


def _glass_scene(dispersion=0.0):
    scene = Scene()
    glass = scene.add_material(
        Material(name="glass", albedo=(1.0, 1.0, 1.0), roughness=0.0,
                 transmission=1.0, ior=1.5, dispersion=dispersion)
    )
    wall = scene.add_material(
        Material(name="wall", albedo=(0.8, 0.8, 0.8), roughness=1.0)
    )
    sphere = scene.add_mesh(create_sphere(24, 24))
    plane = scene.add_mesh(create_plane())
    scene.add_object("Glass Ball", sphere, glass)
    scene.add_object("Backdrop", plane, wall, position=(0, 0, 6),
                     scale=(30, 30, 1), rotation=(0, 180, 0))
    return scene


def test_transmission_refracts_light():
    """A glass sphere must transmit (image behind it visible, not black) and
    differ from an opaque render of the same geometry."""
    cfg = RenderConfig(width=48, height=48, max_depth=8,
                       background=(0.3, 0.5, 0.9))
    cam = Camera.create(position=(0, 0, -3), aspect=1.0)
    img_glass = render(_glass_scene(), cam, cfg, num_frames=8)

    cfg_opaque = cfg.replace(enable_transmission=False)
    img_opaque = render(_glass_scene(), cam, cfg_opaque, num_frames=8)

    assert np.isfinite(img_glass).all()
    center = img_glass[20:28, 20:28]
    assert center.mean() > 0.05  # light gets through the glass
    assert np.abs(img_glass - img_opaque).max() > 0.05


def test_dispersion_splits_channels():
    """With dispersion on, refraction is wavelength-dependent: the image
    must differ per channel more than the non-dispersive render does."""
    cfg = RenderConfig(width=40, height=40, max_depth=10, rr_start_depth=10,
                       background=(1.0, 1.0, 1.0))
    cam = Camera.create(position=(0, 0, -2.2), aspect=1.0)
    plain = render(_glass_scene(0.0), cam, cfg, num_frames=24)
    disp = render(_glass_scene(0.4), cam, cfg, num_frames=24)

    def channel_spread(img):
        return np.abs(img - img.mean(axis=-1, keepdims=True)).mean()

    assert np.isfinite(disp).all()
    # The dispersive render shows more chroma than the plain one.
    assert channel_spread(disp) > channel_spread(plain) * 1.5, (
        channel_spread(disp), channel_spread(plain)
    )


def test_transmission_zero_matches_reference_path():
    """Materials with transmission == 0 must take exactly the reference RNG
    path: enabling the feature cannot change such scenes."""
    from raytracer_tpu.scene.model import create_cornell_box

    cfg_on = RenderConfig(width=24, height=24, enable_transmission=True)
    cfg_off = RenderConfig(width=24, height=24, enable_transmission=False)
    a = render(create_cornell_box(), None, cfg_on, num_frames=2)
    b = render(create_cornell_box(), None, cfg_off, num_frames=2)
    # Same RNG stream and samples; only last-ulp fusion-order noise differs
    # between the two compiled programs.
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_multi_dispersion_scene_renders():
    import os

    path = "/root/reference/scenes/multi-dispersion.gltf"
    if not os.path.exists(path):
        pytest.skip("reference scenes not mounted")
    from raytracer_tpu.scene.loaders import load_scene

    scene = load_scene(path)
    cfg = RenderConfig(width=32, height=32, max_depth=8)
    cam = Camera.create(position=(0, 1, -6), aspect=1.0, target=(0, 1, 0))
    img = render(scene, cam, cfg, num_frames=2)
    assert np.isfinite(img).all()
