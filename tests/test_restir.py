"""ReSTIR DI: reservoir math units + convergence vs the NEE path tracer."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.integrator.restir import Reservoir, _finalize, _reservoir_update
from raytracer_tpu.utils.config import RenderConfig


def test_empty_reservoir_matches_struct_defaults():
    r = Reservoir.empty(4)
    assert float(r.weight_sum.sum()) == 0.0
    assert (np.asarray(r.light_index) == -1).all()
    assert float(r.w.sum()) == 0.0


def test_reservoir_update_selects_by_weight():
    r = Reservoir.empty(2)
    # First candidate always selected when weight > 0 (r*wsum <= w).
    r = _reservoir_update(
        r,
        cand_light=jnp.asarray([3, 5], jnp.int32),
        cand_uv=jnp.zeros((2, 2)),
        cand_dist=jnp.asarray([1.0, 2.0]),
        cand_target=jnp.asarray([0.5, 0.0]),
        cand_weight=jnp.asarray([2.0, 0.0]),
        r=jnp.asarray([0.99, 0.0]),
    )
    assert int(r.light_index[0]) == 3
    assert int(r.light_index[1]) == -1  # zero weight never selected
    assert float(r.m[0]) == 1.0


def test_finalize_weight():
    r = Reservoir.empty(1)
    r = r._replace(
        weight_sum=jnp.asarray([6.0]),
        target_pdf=jnp.asarray([2.0]),
        m=jnp.asarray([3.0]),
    )
    out = _finalize(r)
    assert abs(float(out.w[0]) - 1.0) < 1e-6  # 6/(3*2)


def test_finalize_z_count_denominator():
    """Alg.-6 unbiased combination: W divides by the Z-count (M-mass of
    participants that could have produced the sample), not the full M.
    Here 3 candidates were seen but only Z=1.5 worth covered the choice."""
    r = Reservoir.empty(1)
    r = r._replace(
        weight_sum=jnp.asarray([6.0]),
        target_pdf=jnp.asarray([2.0]),
        m=jnp.asarray([3.0]),
    )
    out = _finalize(r, z=jnp.asarray([1.5]))
    assert abs(float(out.w[0]) - 2.0) < 1e-6  # 6/(1.5*2)
    # z=0 (nothing covers it — cannot happen for a chosen sample, but the
    # guard must not divide by zero) -> W = 0.
    out0 = _finalize(r, z=jnp.asarray([0.0]))
    assert float(out0.w[0]) == 0.0


def test_ris_unbiased_single_lane():
    """RIS over M candidates of a two-'light' toy integrand: the estimator
    <target>/p̂ * W must average to the true integral."""
    import jax

    from raytracer_tpu.ops import rng

    # Toy: f(i) over {0: 1.0, 1: 3.0}, uniform source pdf 0.5.
    f = jnp.asarray([1.0, 3.0])
    true_sum = 4.0
    n = 20000
    seeds = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(9))
    res = Reservoir.empty(n)
    seed = seeds
    for _ in range(4):
        r_pick, seed = rng.rnd(seed)
        r_keep, seed = rng.rnd(seed)
        light = (r_pick < 0.5).astype(jnp.int32)
        target = f[light]
        w = target / 0.5
        res = _reservoir_update(
            res, light, jnp.zeros((n, 2)), jnp.ones(n), target, w, r_keep
        )
    res = _finalize(res)
    est = f[jnp.clip(res.light_index, 0, 1)] * res.w
    assert abs(float(jnp.mean(est)) - true_sum) < 0.1


@pytest.mark.slow
def test_restir_converges_to_nee_reference():
    """Cornell box: ReSTIR accumulation must converge to the same image as
    the plain NEE path tracer (both unbiased-ish; allow a loose SSIM/mean
    tolerance at modest spp)."""
    from raytracer_tpu.api import ProgressiveRenderer
    from raytracer_tpu.scene.model import create_cornell_box
    from raytracer_tpu.utils.image import ssim

    spp = 48
    base_cfg = RenderConfig(width=48, height=48)
    img_nee = ProgressiveRenderer(
        create_cornell_box(), None, base_cfg
    ).render(spp)
    img_restir = ProgressiveRenderer(
        create_cornell_box(), None, base_cfg.replace(use_restir=True)
    ).render(spp)

    assert np.isfinite(img_restir).all()
    # Means agree within 15% (both estimate the same radiance).
    m1, m2 = img_nee.mean(), img_restir.mean()
    assert abs(m1 - m2) / max(m1, 1e-6) < 0.15, (m1, m2)
    score = ssim(
        np.clip(img_nee, 0, 1).astype(np.float32),
        np.clip(img_restir, 0, 1).astype(np.float32),
        data_range=1.0,
    )
    assert score > 0.7, score


def test_restir_visibility_kills_occluded_samples():
    """Regression: occlusion must actually remove energy. Previously only
    res.w was zeroed and the _finalize after temporal/spatial reuse
    recomputed w from the untouched weight_sum, so an all-True occlusion_fn
    produced the same direct radiance as all-False (no shadows at all)."""
    import jax.numpy as jnp

    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.integrator.restir import GBuffer, restir_direct
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.scene.model import create_cornell_box

    w = h = 16
    cfg = RenderConfig(width=w, height=h, use_restir=True).resolve_accel()
    ds, _ = bake_scene(create_cornell_box())
    cam = Camera.create(position=(0, 0, -3), aspect=1.0)
    mats = cam.matrices()
    n = w * h
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    jitter = jnp.full((n, 2), 0.5, jnp.float32)
    origin, direction = wf._camera_rays(
        jnp.asarray(mats["inverse_view"]), jnp.asarray(mats["inverse_proj"]),
        w, h, jitter, pixel_idx,
    )
    alive = jnp.ones((n,), bool)
    hit = wf._trace(ds, origin, direction, cfg, alive)
    lane = alive & hit.hit
    surf = wf.fetch_surface(ds, hit, direction, lane)
    gbuf = GBuffer(
        position=surf.world_pos, normal=surf.world_nrm, albedo=surf.albedo,
        roughness=surf.roughness, metallic=surf.metallic,
        emission=surf.emission_color * surf.emission_power[:, None],
        hit=lane, object=surf.obj,
    )

    def all_visible(o, d, t_max, skip_obj, active):
        return jnp.zeros((n,), bool)

    def all_occluded(o, d, t_max, skip_obj, active):
        return jnp.ones((n,), bool)

    direct_vis, res_vis, _ = restir_direct(
        ds, gbuf, direction, None, 1, cfg, all_visible
    )
    direct_occ, res_occ, _ = restir_direct(
        ds, gbuf, direction, None, 1, cfg, all_occluded
    )
    assert float(jnp.sum(direct_vis)) > 0.0
    assert float(jnp.sum(jnp.abs(direct_occ))) == 0.0
    # The killed reservoirs must carry no resurrectable weight into the next
    # frame's temporal reuse.
    assert float(jnp.max(res_occ.weight_sum)) == 0.0
    assert float(jnp.max(res_occ.w)) == 0.0


def test_restir_final_visibility_feedback_invalidates_reservoir():
    """The step-6 occlusion verdict must invalidate the reservoir handed to
    the next frame (restir_final_visibility_feedback): without it, a sample
    imported by spatial reuse that is occluded at THIS pixel survives
    temporal reuse with M up to restir_max_m and shades black for ~M frames
    (the dominant atrium bias-floor term, RESTIR_BIAS_DIAG.json). Step-3
    visibility is disabled so ONLY the step-6 feedback can do the killing."""
    import jax.numpy as jnp

    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.integrator.restir import GBuffer, restir_direct
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.scene.model import create_cornell_box

    w = h = 16
    base = RenderConfig(width=w, height=h, use_restir=True,
                        restir_initial_visibility=False,
                        restir_final_visibility_feedback=True).resolve_accel()
    ds, _ = bake_scene(create_cornell_box())
    cam = Camera.create(position=(0, 0, -3), aspect=1.0)
    mats = cam.matrices()
    n = w * h
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    jitter = jnp.full((n, 2), 0.5, jnp.float32)
    origin, direction = wf._camera_rays(
        jnp.asarray(mats["inverse_view"]), jnp.asarray(mats["inverse_proj"]),
        w, h, jitter, pixel_idx,
    )
    alive = jnp.ones((n,), bool)
    hit = wf._trace(ds, origin, direction, base, alive)
    lane = alive & hit.hit
    surf = wf.fetch_surface(ds, hit, direction, lane)
    gbuf = GBuffer(
        position=surf.world_pos, normal=surf.world_nrm, albedo=surf.albedo,
        roughness=surf.roughness, metallic=surf.metallic,
        emission=surf.emission_color * surf.emission_power[:, None],
        hit=lane, object=surf.obj,
    )

    def all_occluded(o, d, t_max, skip_obj, active):
        return jnp.ones((n,), bool)

    direct, res, _ = restir_direct(ds, gbuf, direction, None, 1, base,
                                   all_occluded)
    assert float(jnp.sum(jnp.abs(direct))) == 0.0
    assert float(jnp.max(res.w)) == 0.0
    assert float(jnp.max(res.weight_sum)) == 0.0
    assert (np.asarray(res.light_index) == -1).all()

    # The guard documents the old behavior: with feedback off the occluded
    # samples DO survive into the returned reservoir.
    off = base.replace(restir_final_visibility_feedback=False)
    direct2, res2, _ = restir_direct(ds, gbuf, direction, None, 1, off,
                                     all_occluded)
    assert float(jnp.sum(jnp.abs(direct2))) == 0.0  # shading is still dark
    assert float(jnp.max(res2.w)) > 0.0  # ...but the sample persists


def test_restir_reset_on_camera_move():
    from raytracer_tpu.api import ProgressiveRenderer
    from raytracer_tpu.scene.model import create_cornell_box

    cfg = RenderConfig(width=16, height=16, use_restir=True)
    r = ProgressiveRenderer(create_cornell_box(), None, cfg)
    r.step()
    r.step()
    assert float(jnp.max(r.reservoir.m)) > 0
    r.camera.move((0.05, 0, 0))
    r.step()
    assert r.frame == 1


def test_restir_checkpoint_roundtrip(tmp_path):
    """Resuming a ReSTIR render must restore the reservoir (temporal
    history), not silently drop it."""
    import numpy as np

    from raytracer_tpu.api import ProgressiveRenderer
    from raytracer_tpu.scene.model import create_cornell_box

    cfg = RenderConfig(width=16, height=16, use_restir=True)
    r = ProgressiveRenderer(create_cornell_box(), None, cfg)
    r.step()
    r.step()
    path = str(tmp_path / "ck.npz")
    r.save_checkpoint(path)

    r2 = ProgressiveRenderer(create_cornell_box(), None, cfg)
    r2.load_checkpoint(path)
    assert r2.frame == r.frame
    for a, b in zip(r.reservoir, r2.reservoir):
        assert np.allclose(np.asarray(a), np.asarray(b))
    # Continue rendering: the resumed path must produce the same next frame
    # as the uninterrupted one (reservoir state included in the contract).
    r.step()
    r2.step()
    assert np.allclose(np.asarray(r.accum), np.asarray(r2.accum))


def test_restir_no_initial_visibility_stays_close():
    """cfg.restir_initial_visibility=False drops the step-3 pass (half the
    ReSTIR shadow rays); the final-sample visibility keeps the estimator
    correct, so the accumulated Cornell render must stay close to the
    default pipeline (it consumes no RNG draws, so streams are unshifted)."""
    import numpy as np

    from raytracer_tpu.api import ProgressiveRenderer
    from raytracer_tpu.scene.model import create_cornell_box

    frames = 24
    base_cfg = RenderConfig(width=24, height=24, use_restir=True)
    a = ProgressiveRenderer(create_cornell_box(), None, base_cfg).render(frames)
    b = ProgressiveRenderer(
        create_cornell_box(), None,
        base_cfg.replace(restir_initial_visibility=False),
    ).render(frames)
    ma, mb = float(a.mean()), float(b.mean())
    assert abs(ma - mb) / max(ma, 1e-9) < 0.06, (ma, mb)
    diff = np.abs(a - b).mean()
    assert diff / max(ma, 1e-9) < 0.35, diff


def test_restir_many_lights_no_spatial_feedback():
    """64-light-class scene (benchmark lightgrid, reduced): spatial reuse
    must read a pre-spatial SNAPSHOT of the reservoir buffer (Bitterli
    et al. 2020 Alg. 5's separate input buffer). Reading the evolving
    buffer instead lets tap k import a neighbor that already merged this
    pixel's sample at tap k-1 — a positive feedback loop: M grew ~2x per
    tap (observed 1768 vs the 648 design bound) and the accumulated image
    brightened to ~2x the oracle by frame 16. Gates: M respects its exact
    design bound (candidates + clamped temporal + taps x clamped
    neighbor), the ReSTIR mean tracks plain NEE, and the running mean does
    not drift frame-over-frame."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.integrator.restir import (
        Reservoir,
        render_frame_restir,
    )
    from raytracer_tpu.integrator.wavefront import render_frame
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_lightgrid
    from raytracer_tpu.scene.device_scene import bake_scene

    W, H, FRAMES = 40, 24, 10
    scene = create_benchmark_lightgrid(n_lights=16, target_triangles=2_000)
    ds, _ = bake_scene(scene)
    cam = Camera.create(position=(0.0, 4.2, -10.5), aspect=W / H,
                        target=(0.0, 1.2, 1.5))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    cfg = RenderConfig(width=W, height=H).resolve_accel()
    cfg_r = cfg.replace(use_restir=True)

    step_r = jax.jit(lambda a, r, f: render_frame_restir(
        ds, ubo, a, r, f, cfg_r))
    step_p = jax.jit(lambda a, f: render_frame(ds, ubo, a, f, cfg))

    acc = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    res = Reservoir.empty(cfg.num_pixels)
    accp = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    means = []
    for f in range(FRAMES):
        acc, res = step_r(acc, res, jnp.uint32(f))
        accp = step_p(accp, jnp.uint32(f))
        means.append(float(jnp.mean(acc)))

    # Exact M design bound: initial candidates + temporal (clamped to
    # max_m) + spatial taps x (neighbor clamped to max_m).
    m_bound = (cfg_r.restir_initial_candidates + cfg_r.restir_max_m
               + cfg_r.restir_spatial_neighbors * cfg_r.restir_max_m)
    assert float(jnp.max(res.m)) <= m_bound + 1e-3, (
        float(jnp.max(res.m)), m_bound)

    # Mean agreement with plain NEE (the biased variant sits a few percent
    # DARK from the normal-similarity gate + visibility kills; the feedback
    # bug sat ~2x BRIGHT).
    mp = float(jnp.mean(accp))
    assert abs(means[-1] - mp) / max(mp, 1e-6) < 0.12, (means[-1], mp)

    # No frame-over-frame drift once warmed: the last mean stays within 8%
    # of the frame-4 mean (the bug showed +30% over the same span).
    assert abs(means[-1] - means[3]) / max(means[3], 1e-6) < 0.08, means
