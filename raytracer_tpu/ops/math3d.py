"""Vector math utilities shared by the shading/sampling kernels.

Ports the *math* of `shaders/math.glsl` (power/balance MIS heuristics, ONB
construction, world<->local frames) into batched JAX ops. All functions are
written SoA-first: every argument may carry leading batch dimensions with the
3-vector in the trailing axis, so a whole ray wavefront is processed per call.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def dot(a, b):
    """Batched dot product over the trailing axis, keepdims=False."""
    return jnp.sum(a * b, axis=-1)


def dot_k(a, b):
    """Batched dot product, keepdims=True (for broadcasting against vec3s)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 0.0))


def normalize(v, eps: float = EPS):
    return v / jnp.maximum(length(v), eps)[..., None]


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n,i)*n (i points toward the surface)."""
    return i - 2.0 * dot_k(n, i) * n


def luminance_rec709(color):
    """Rec.709 luma — used by russian roulette (simple.rgen:59)."""
    w = jnp.asarray([0.2126, 0.7152, 0.0722], color.dtype)
    return dot(color, w)


def luminance_rec601(color):
    """Rec.601 luma — the rchit 'luminance' helper (simple.rchit:113-115)."""
    w = jnp.asarray([0.299, 0.587, 0.114], color.dtype)
    return dot(color, w)


def power_heuristic(pdf_a, pdf_b):
    """Power heuristic beta=2 (math.glsl:3-7). No zero-guard — see
    mis_weight_power for the guarded version used in shading."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    return a2 / (a2 + b2)


def mis_weight_power(pdf1, pdf2):
    """Guarded power heuristic (simple.rchit:234-237): 0 if either pdf<=0."""
    a2 = pdf1 * pdf1
    w = a2 / jnp.maximum(a2 + pdf2 * pdf2, 1e-30)
    return jnp.where((pdf1 <= 0.0) | (pdf2 <= 0.0), 0.0, w)


def mis_weight_balance(pdf1, pdf2):
    """Guarded balance heuristic (simple.rchit:228-231)."""
    w = pdf1 / jnp.maximum(pdf1 + pdf2, 1e-30)
    return jnp.where((pdf1 <= 0.0) | (pdf2 <= 0.0), 0.0, w)


def make_basis(normal):
    """Orthonormal basis with `normal` as the z-axis.

    Mirrors createBasis (math.glsl:9-15): pick helper (0,1,0) when
    |n.x| > 0.9 else (1,0,0); axis1 = normalize(cross(n, a));
    axis0 = cross(n, axis1). Returns (t, b, n) = (axis0, axis1, axis2) rows.
    """
    n = normalize(normal)
    use_y = jnp.abs(n[..., 0:1]) > 0.9
    a = jnp.where(
        use_y,
        jnp.asarray([0.0, 1.0, 0.0], n.dtype),
        jnp.asarray([1.0, 0.0, 0.0], n.dtype),
    )
    axis1 = normalize(cross(n, a))
    axis0 = cross(n, axis1)
    return axis0, axis1, n


def world_to_local(v, basis):
    """Project world vector onto basis rows (math.glsl:18-24)."""
    t, b, n = basis
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def local_to_world(v, basis):
    """math.glsl:27-29."""
    t, b, n = basis
    return (
        t * v[..., 0:1] + b * v[..., 1:2] + n * v[..., 2:3]
    )


def cos_theta(w):
    """z component in the local shading frame (math.glsl:31-33)."""
    return w[..., 2]


def max3(v):
    """Max over the trailing 3-vector (math.glsl:39-41)."""
    return jnp.max(v, axis=-1)


def smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)
