"""Counter-based per-pixel RNG: TEA-16 seeding + Numerical-Recipes LCG.

Reproduces the exact RNG of the reference (`shaders/random.glsl:23-53`):
per-pixel seed = tea(pixel_index, frame_number), stream = LCG with
a=1664525, c=1013904223, output = (state & 0xFFFFFF) / 2^24 in [0, 1).

Matching this stream (and its masked, data-dependent consumption order — see
integrator/wavefront.py) keeps rendered images statistically aligned with the
reference, which matters for the SSIM gate.

Everything here is elementwise uint32 math: it vectorizes onto VPU lanes with
no gathers, so a whole [N]-ray wavefront advances its RNG in one fused op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32

# Constants as NUMPY scalars: module-level jnp scalars would be device
# arrays created at import time and embedded as device constants at every
# lowering (a host->device fetch per compile).
# TEA round constants (shaders/random.glsl:29-35).
_TEA_DELTA = np.uint32(0x9E3779B9)
_TEA_K0 = np.uint32(0xA341316C)
_TEA_K1 = np.uint32(0xC8013EA4)
_TEA_K2 = np.uint32(0xAD90777D)
_TEA_K3 = np.uint32(0x7E95761E)

# Numerical Recipes LCG (shaders/random.glsl:41-47).
_LCG_A = np.uint32(1664525)
_LCG_C = np.uint32(1013904223)
_MASK_24 = np.uint32(0x00FFFFFF)
_INV_2_24 = np.float32(1.0 / float(0x01000000))


def tea(val0, val1):
    """16-round Tiny Encryption Algorithm hash of two uint32s -> uint32.

    Used to decorrelate (pixel_index, frame_number) into a seed
    (shaders/random.glsl:23-37; seeded at simple.rgen:71).
    """
    v0 = jnp.asarray(val0, _U32)
    v1 = jnp.asarray(val1, _U32)
    v0, v1 = jnp.broadcast_arrays(v0, v1)
    s0 = jnp.zeros_like(v0)
    for _ in range(16):
        s0 = s0 + _TEA_DELTA
        v0 = v0 + (((v1 << 4) + _TEA_K0) ^ (v1 + s0) ^ ((v1 >> 5) + _TEA_K1))
        v1 = v1 + (((v0 << 4) + _TEA_K2) ^ (v0 + s0) ^ ((v0 >> 5) + _TEA_K3))
    return v0


def lcg_step(state):
    """One LCG step. Returns the new state (which is also the raw sample)."""
    return _LCG_A * state + _LCG_C


def rnd(state):
    """Draw a float in [0, 1) and advance the state.

    Returns (sample_f32, new_state) — the functional form of GLSL's
    `float rnd(inout uint prev)` (shaders/random.glsl:50-53).
    """
    new_state = lcg_step(state)
    sample = (new_state & _MASK_24).astype(jnp.float32) * _INV_2_24
    return sample, new_state


def rnd_masked(state, mask):
    """Draw a sample but only advance the state where `mask` is True.

    The reference consumes RNG data-dependently (e.g. NEE only fires with
    probability p_sample_light, simple.rchit:622-627). In a lockstep SIMD
    wavefront every lane computes the draw, but masked lanes must keep their
    old state so the per-pixel stream stays identical to the reference's
    serial consumption order.
    """
    sample, new_state = rnd(state)
    return sample, jnp.where(mask, new_state, state)


def seed_pixels(pixel_index, frame_number):
    """Per-pixel seeds for a frame: tea(y*W+x, frame) (simple.rgen:71)."""
    return tea(pixel_index, jnp.uint32(frame_number))
