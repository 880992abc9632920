"""GGX metallic-roughness BRDF: evaluation, sampling, pdfs.

Faithful batched port of the shading math in `shaders/simple.rchit`:
  - D_GGX with MIN_ROUGHNESS=0.02 floor          (simple.rchit:77-83)
  - Smith G1*G1 with k = a/2                      (simple.rchit:85-93)
  - Schlick Fresnel, F0 = mix(0.04, albedo, metal)(simple.rchit:96-98)
  - Lambert diffuse * (1 - F) * (1 - metallic)    (simple.rchit:143-147)
  - specular-vs-diffuse lottery probability       (simple.rchit:69-75)
  - GGX half-vector sampling (a = roughness^2)    (simple.rchit:202-217)
  - cosine-weighted diffuse sampling              (simple.rchit:100-110)
  - combined pdf p_spec*pdf_spec + (1-p)*pdf_diff (simple.rchit:443-448)
  - below-horizon specular falls back to diffuse  (simple.rchit:412-423)

All functions operate in the local shading frame (normal = +z) on arrays with
arbitrary leading batch dims; every constant matches the reference so images
line up for the SSIM gate. Pure elementwise f32 -> VPU-friendly, fully
fuseable by XLA into the surrounding wavefront step.

Dielectric transmission (fields declared but never read by the reference,
ray_common.glsl:9-10) lives in integrator/wavefront.py, not here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from raytracer_tpu.ops import rng
from raytracer_tpu.ops.math3d import cos_theta, dot, max3, normalize, reflect, smoothstep

M_PI = 3.14159265359  # math.glsl:1 (the reference's value, not np.pi)

EPS_PDF = 1e-6  # simple.rchit:63
EPS_COS = 1e-4  # simple.rchit:64
EPS_VOH = 1e-4  # simple.rchit:65
MIN_ROUGHNESS = 0.02  # simple.rchit:66


def f0_from_material(albedo, metallic):
    """F0 = mix(0.04, albedo, metallic) (simple.rchit:70,140)."""
    return 0.04 + (albedo - 0.04) * metallic[..., None]


def specular_probability(albedo, roughness, metallic):
    """Spec-vs-diffuse lottery probability (simple.rchit:69-75)."""
    base = max3(f0_from_material(albedo, metallic))
    influence = smoothstep(0.0, 1.0, roughness * 0.7)
    return base + (base * 0.5 - base) * influence  # mix(base, base*0.5, t)


def d_ggx(n_dot_h, roughness):
    """GGX NDF with alpha = max(roughness, MIN_ROUGHNESS) (simple.rchit:77-83)."""
    a = jnp.maximum(roughness, MIN_ROUGHNESS)
    a2 = a * a
    nh = jnp.clip(n_dot_h, 0.0, 1.0)
    denom = nh * nh * (a2 - 1.0) + 1.0
    return a2 / (M_PI * denom * denom)


def g_smith(n_dot_v, n_dot_l, roughness):
    """Smith G1*G1 with k = a/2 (simple.rchit:85-93)."""
    a = jnp.maximum(roughness, MIN_ROUGHNESS)
    k = a * 0.5
    nv = jnp.clip(n_dot_v, EPS_COS, 1.0)
    nl = jnp.clip(n_dot_l, EPS_COS, 1.0)
    g1v = nv / (nv * (1.0 - k) + k)
    g1l = nl / (nl * (1.0 - k) + k)
    return g1v * g1l


def f_schlick(f0, v_dot_h):
    """Schlick Fresnel (simple.rchit:96-98)."""
    p = jnp.power(jnp.clip(1.0 - v_dot_h, 0.0, 1.0), 5.0)
    return f0 + (1.0 - f0) * p[..., None]


class BRDFEval(NamedTuple):
    diffuse: jnp.ndarray  # [..., 3]
    specular: jnp.ndarray  # [..., 3]
    diffuse_pdf: jnp.ndarray  # [...]
    specular_pdf: jnp.ndarray  # [...]


def evaluate_components(wo, wi, albedo, roughness, metallic) -> BRDFEval:
    """evaluateBRDFComponents (simple.rchit:118-160), local frame.

    Zero everything when either direction is below the horizon."""
    n_dot_l = cos_theta(wi)
    n_dot_v = cos_theta(wo)
    valid = (n_dot_l > 0.0) & (n_dot_v > 0.0)

    h = normalize(wo + wi)
    n_dot_h = cos_theta(h)
    v_dot_h = dot(wo, h)

    f0 = f0_from_material(albedo, metallic)
    f = f_schlick(f0, v_dot_h)

    diffuse_albedo = albedo * (1.0 - metallic)[..., None]
    diffuse = diffuse_albedo * (1.0 - f) / M_PI
    diffuse_pdf = n_dot_l / M_PI

    d = d_ggx(n_dot_h, roughness)
    g = g_smith(n_dot_v, n_dot_l, roughness)
    denom = 4.0 * jnp.maximum(n_dot_v * n_dot_l, 1e-12)
    specular = (d * g / denom)[..., None] * f
    specular_pdf = d * n_dot_h / (4.0 * jnp.maximum(v_dot_h, 1e-12))

    vm = valid[..., None]
    return BRDFEval(
        diffuse=jnp.where(vm, diffuse, 0.0),
        specular=jnp.where(vm, specular, 0.0),
        diffuse_pdf=jnp.where(valid, diffuse_pdf, 0.0),
        specular_pdf=jnp.where(valid, specular_pdf, 0.0),
    )


def evaluate_full(wo, wi, albedo, roughness, metallic):
    """evaluateFullBRDF (simple.rchit:163-166): diffuse + specular."""
    ev = evaluate_components(wo, wi, albedo, roughness, metallic)
    return ev.diffuse + ev.specular


def microfacet_f(wo, wi, h, albedo, roughness, metallic):
    """Cook-Torrance specular lobe only (simple.rchit:168-193)."""
    n_dot_l = cos_theta(wi)
    n_dot_v = cos_theta(wo)
    valid = (n_dot_l > 0.0) & (n_dot_v > 0.0)
    d = d_ggx(cos_theta(h), roughness)
    g = g_smith(n_dot_v, n_dot_l, roughness)
    f = f_schlick(f0_from_material(albedo, metallic), dot(wo, h))
    denom = 4.0 * jnp.maximum(n_dot_v * n_dot_l, 1e-12)
    return jnp.where(valid[..., None], (d * g / denom)[..., None] * f, 0.0)


def microfacet_pdf(wo, h, roughness):
    """Half-vector pdf converted to wi measure (simple.rchit:195-200)."""
    nh = jnp.maximum(cos_theta(h), EPS_COS)
    voh = jnp.maximum(dot(wo, h), EPS_VOH)
    d = d_ggx(nh, roughness)
    return jnp.maximum(d * nh / (4.0 * voh), EPS_PDF)


def sample_ggx(r1, r2, roughness):
    """GGX half-vector sample, local frame, alpha = roughness^2
    (simple.rchit:202-217)."""
    a = roughness * roughness
    phi = 2.0 * M_PI * r1
    cos_t = jnp.sqrt((1.0 - r2) / jnp.maximum(1.0 + (a * a - 1.0) * r2, 1e-12))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )


def sample_cosine(r1, r2):
    """Cosine-weighted hemisphere sample, local frame (simple.rchit:100-110)."""
    phi = 2.0 * M_PI * r1
    cos_t = jnp.sqrt(r2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    return jnp.stack(
        [jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1
    )


class BSDFSample(NamedTuple):
    direction: jnp.ndarray  # [..., 3] local frame
    value: jnp.ndarray  # [..., 3] BRDF value (no cosine)
    pdf: jnp.ndarray  # [...]
    is_specular: jnp.ndarray  # [...] bool


def _diffuse_value(wo, wi, albedo, metallic):
    """Diffuse lobe with Fresnel damping, as computed inside sampleBRDF
    (simple.rchit:416-422,434-440)."""
    h = normalize(wo + wi)
    v_dot_h = jnp.clip(dot(wo, h), 0.0, 1.0)
    f = f_schlick(f0_from_material(albedo, metallic), v_dot_h)
    diffuse_albedo = albedo * (1.0 - metallic)[..., None]
    return diffuse_albedo * (1.0 - f) / M_PI


def sample_brdf(wo, albedo, roughness, metallic, seed) -> tuple:
    """sampleBRDF (simple.rchit:403-449) in lockstep-SIMD form.

    Consumes RNG exactly like the reference: the caller has already drawn
    (r1, r2) = `random`; this draws one more for the lobe lottery. Returns
    (BSDFSample, new_seed).

    Branchless port of the reference's control flow:
      lottery < p_spec:  wi = reflect(-wo, sampleGGX(r1, r2))
                         below horizon -> cosine sample + diffuse value
                         else          -> specular microfacet value
      otherwise:         wi = cosine sample, diffuse value
    The final pdf always mixes both lobes (simple.rchit:443-448).
    """
    # NOTE: argument order — the reference draws `random` (r1, r2) from the
    # payload seed BEFORE the lottery draw (simple.rchit:638-639 then :408).
    r1, seed = rng.rnd(seed)
    r2, seed = rng.rnd(seed)
    lottery, seed = rng.rnd(seed)

    p_spec = specular_probability(albedo, roughness, metallic)
    take_spec = lottery < p_spec

    h = sample_ggx(r1, r2, roughness)
    wi_spec = reflect(-wo, h)
    spec_ok = cos_theta(wi_spec) > 0.0

    wi_diff = sample_cosine(r1, r2)

    use_spec = take_spec & spec_ok
    wi = jnp.where(use_spec[..., None], wi_spec, wi_diff)

    value_spec = microfacet_f(wo, wi_spec, h, albedo, roughness, metallic)
    value_diff = _diffuse_value(wo, wi, albedo, metallic)
    value = jnp.where(use_spec[..., None], value_spec, value_diff)

    h_final = normalize(wo + wi)
    spec_pdf = microfacet_pdf(wo, h_final, roughness)
    diff_pdf = jnp.maximum(cos_theta(wi), 0.0) / M_PI
    pdf = p_spec * spec_pdf + (1.0 - p_spec) * diff_pdf
    pdf = jnp.maximum(pdf, EPS_PDF)

    return BSDFSample(direction=wi, value=value, pdf=pdf, is_specular=use_spec), seed


def combined_pdf(wo, wi, albedo, roughness, metallic):
    """calculatePDF (simple.rchit:464-469): lottery-weighted mixture pdf."""
    ev = evaluate_components(wo, wi, albedo, roughness, metallic)
    p_spec = specular_probability(albedo, roughness, metallic)
    return p_spec * ev.specular_pdf + (1.0 - p_spec) * ev.diffuse_pdf
