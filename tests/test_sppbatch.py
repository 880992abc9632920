"""Samples-per-launch batching (cfg.spp_batch): S progressive samples of a
tile rendered in ONE wavefront must match S sequential 1-spp steps — the
production form of the measured small-tile mitigation (TILESIZE_LAB.json).
Lanes are per-pixel independent, so batching only changes the launch shape;
the suite's sharded-vs-single 1e-6 standard applies (XLA fusion may
reassociate across program shapes)."""

import jax
import numpy as np
import pytest

from raytracer_tpu.utils.config import RenderConfig


def _render(scene_factory, cfg, samples, mesh=None):
    from raytracer_tpu.api import ProgressiveRenderer

    r = ProgressiveRenderer(scene_factory(), None, cfg, mesh=mesh)
    img = r.render(samples)
    return img, r.frame


def test_spp_batch_matches_sequential(cornell_scene):
    from raytracer_tpu.scene.model import create_cornell_box

    cfg = RenderConfig(width=32, height=24)
    seq, n_seq = _render(create_cornell_box, cfg, 4)
    bat, n_bat = _render(create_cornell_box, cfg.replace(spp_batch=2), 4)
    assert n_seq == n_bat == 4
    np.testing.assert_allclose(bat, seq, rtol=1e-6, atol=1e-6)


def test_spp_batch_whole_render_in_one_launch(cornell_scene):
    from raytracer_tpu.scene.model import create_cornell_box

    cfg = RenderConfig(width=32, height=24)
    seq, _ = _render(create_cornell_box, cfg, 4)
    bat, n = _render(create_cornell_box, cfg.replace(spp_batch=4), 4)
    assert n == 4
    np.testing.assert_allclose(bat, seq, rtol=1e-6, atol=1e-6)


def test_spp_batch_sharded_matches_unsharded_sequential():
    from raytracer_tpu.parallel.sharding import make_pixel_mesh
    from raytracer_tpu.scene.model import create_cornell_box

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device backend")
    mesh = make_pixel_mesh()
    cfg = RenderConfig(width=32, height=32)
    seq, _ = _render(create_cornell_box, cfg, 4)
    bat, n = _render(
        create_cornell_box, cfg.replace(spp_batch=2), 4, mesh=mesh
    )
    assert n == 4
    np.testing.assert_allclose(bat, seq, rtol=1e-6, atol=1e-6)


def test_spp_batch_respects_accumulation_limit():
    from raytracer_tpu.scene.model import create_cornell_box

    cfg = RenderConfig(width=16, height=16, spp_batch=2,
                       accumulation_limit=4)
    from raytracer_tpu.api import ProgressiveRenderer

    r = ProgressiveRenderer(create_cornell_box(), None, cfg)
    assert r.step() and r.step()
    assert r.frame == 4
    assert not r.step()  # limit reached: frame skipped
    assert r.frame == 4


def test_spp_batch_config_validation():
    with pytest.raises(ValueError):
        RenderConfig(spp_batch=0)
    with pytest.raises(ValueError):
        RenderConfig(spp_batch=2, use_restir=True)
    with pytest.raises(ValueError):
        RenderConfig(spp_batch=2, adaptive_tol=0.1)
    with pytest.raises(ValueError):
        RenderConfig(spp_batch=4, accumulation_limit=6)
    RenderConfig(spp_batch=4, accumulation_limit=8)  # divisible: fine


def test_cli_rejects_bad_spp_batch(tmp_path):
    from raytracer_tpu.cli import build_parser, main

    parser = build_parser()
    args = parser.parse_args(["scene.json", "--spp", "8", "--spp-batch", "4"])
    assert args.spp_batch == 4
    with pytest.raises(SystemExit):
        main(["scene.json", "--spp", "9", "--spp-batch", "4",
              "--out", str(tmp_path / "x.png")])
    with pytest.raises(SystemExit):
        main(["scene.json", "--spp", "8", "--spp-batch", "4", "--restir",
              "--out", str(tmp_path / "x.png")])
