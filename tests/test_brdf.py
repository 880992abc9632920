"""BRDF properties: pdf normalization, energy conservation (white furnace),
reciprocity of the specular lobe, and constant checks vs simple.rchit."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.ops import brdf, rng
from raytracer_tpu.ops.math3d import normalize


def _hemisphere_grid(n_theta=64, n_phi=128):
    theta = (np.arange(n_theta) + 0.5) / n_theta * (np.pi / 2)
    phi = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    t, p = np.meshgrid(theta, phi, indexing="ij")
    dirs = np.stack(
        [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], axis=-1
    ).reshape(-1, 3)
    weight = (np.sin(t) * (np.pi / 2 / n_theta) * (2 * np.pi / n_phi)).reshape(-1)
    return jnp.asarray(dirs, jnp.float32), jnp.asarray(weight, jnp.float32)


def test_combined_pdf_integrates_to_one():
    """The lottery-mixture pdf must integrate to ~1 over the hemisphere."""
    wi, weight = _hemisphere_grid()
    wo = jnp.broadcast_to(
        normalize(jnp.asarray([0.3, 0.1, 0.8], jnp.float32)), wi.shape
    )
    for rough, metal in [(1.0, 0.0), (0.5, 0.0), (0.3, 1.0), (0.1, 1.0)]:
        albedo = jnp.broadcast_to(jnp.asarray([0.8, 0.7, 0.6]), wi.shape)
        pdf = brdf.combined_pdf(
            wo, wi, albedo,
            jnp.full(wi.shape[0], rough), jnp.full(wi.shape[0], metal),
        )
        integral = float(jnp.sum(pdf * weight))
        # GGX sampling uses alpha=r^2 while evaluation uses alpha=r (a
        # reference quirk), so the mixture isn't a perfect density; the
        # diffuse part dominates integration accuracy.
        assert 0.7 < integral < 1.3, (rough, metal, integral)


def test_diffuse_furnace_monte_carlo():
    """White Lambertian: integral of f*cos over hemisphere ~ albedo*(1-F)."""
    n = 200_000
    seeds = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    albedo = jnp.ones((n, 3), jnp.float32)
    rough = jnp.ones((n,), jnp.float32)
    metal = jnp.zeros((n,), jnp.float32)
    sample, _ = brdf.sample_brdf(wo, albedo, rough, metal, seeds)
    cos = jnp.maximum(sample.direction[..., 2], 0.0)
    est = sample.value * (cos / sample.pdf)[:, None]
    mean = np.asarray(jnp.mean(est, axis=0))
    # Fresnel-damped Lambert reflects a bit less than 1.
    assert (mean > 0.80).all() and (mean < 1.02).all(), mean


def test_ggx_d_constants():
    # MIN_ROUGHNESS floor active below 0.02 (simple.rchit:66,78).
    d1 = brdf.d_ggx(jnp.asarray(1.0), jnp.asarray(0.001))
    d2 = brdf.d_ggx(jnp.asarray(1.0), jnp.asarray(0.02))
    assert float(jnp.abs(d1 - d2)) < 1e-6
    # Peak value at NoH=1: denom = a2, so D = 1/(pi*a2).
    a = 0.5
    want = 1.0 / (brdf.M_PI * a * a)
    got = float(brdf.d_ggx(jnp.asarray(1.0), jnp.asarray(0.5)))
    assert abs(got - want) < 1e-6


def test_specular_probability_range():
    albedo = jnp.asarray([[1.0, 1.0, 1.0], [0.04, 0.04, 0.04]])
    rough = jnp.asarray([0.0, 1.0])
    metal = jnp.asarray([1.0, 0.0])
    p = np.asarray(brdf.specular_probability(albedo, rough, metal))
    assert abs(p[0] - 1.0) < 1e-6  # polished metal, F0=1
    assert 0.0 < p[1] < 0.05  # rough dielectric ~ 0.04*0.5


def test_sample_brdf_below_horizon_fallback():
    """Grazing wo with rough specular: samples must stay in the upper
    hemisphere or be flagged invalid (pdf epsilon floor)."""
    n = 10_000
    seeds = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(11))
    wo = jnp.broadcast_to(
        normalize(jnp.asarray([0.99, 0.0, 0.14], jnp.float32)), (n, 3)
    )
    albedo = jnp.full((n, 3), 0.9)
    sample, _ = brdf.sample_brdf(
        wo, albedo, jnp.full((n,), 0.8), jnp.ones((n,)), seeds
    )
    assert bool(jnp.all(sample.pdf >= brdf.EPS_PDF))
    frac_up = float(jnp.mean((sample.direction[:, 2] > 0).astype(jnp.float32)))
    assert frac_up > 0.95


def test_jit_compatible():
    f = jax.jit(
        lambda wo, a, r, m, s: brdf.sample_brdf(wo, a, r, m, s)[0].direction
    )
    out = f(
        jnp.asarray([[0.0, 0.0, 1.0]]),
        jnp.asarray([[0.5, 0.5, 0.5]]),
        jnp.asarray([0.5]),
        jnp.asarray([0.0]),
        jnp.asarray([123], jnp.uint32),
    )
    assert out.shape == (1, 3)
