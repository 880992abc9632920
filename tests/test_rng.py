"""RNG must match the reference's TEA-16 + LCG bit-for-bit
(shaders/random.glsl:23-53). Ground truth computed with Python ints."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.ops import rng

M32 = 0xFFFFFFFF


def tea_ref(val0: int, val1: int) -> int:
    v0, v1, s0 = val0, val1, 0
    for _ in range(16):
        s0 = (s0 + 0x9E3779B9) & M32
        v0 = (
            v0
            + ((((v1 << 4) & M32) + 0xA341316C) ^ ((v1 + s0) & M32)
               ^ (((v1 >> 5) + 0xC8013EA4) & M32))
        ) & M32
        v1 = (
            v1
            + ((((v0 << 4) & M32) + 0xAD90777D) ^ ((v0 + s0) & M32)
               ^ (((v0 >> 5) + 0x7E95761E) & M32))
        ) & M32
    return v0


def lcg_ref(prev: int) -> int:
    return (1664525 * prev + 1013904223) & M32


def test_tea_matches_reference():
    pairs = [(0, 0), (1, 0), (0, 1), (12345, 678), (0xFFFFFFFF, 0xDEADBEEF),
             (1920 * 1080 - 1, 4096)]
    v0 = jnp.asarray([p[0] for p in pairs], jnp.uint32)
    v1 = jnp.asarray([p[1] for p in pairs], jnp.uint32)
    got = np.asarray(rng.tea(v0, v1))
    want = np.asarray([tea_ref(*p) for p in pairs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_lcg_stream_matches_reference():
    state = 0xCAFEBABE
    jstate = jnp.uint32(state)
    for _ in range(100):
        state = lcg_ref(state)
        want = (state & 0x00FFFFFF) / float(1 << 24)
        sample, jstate = rng.rnd(jstate)
        assert int(jstate) == state
        assert abs(float(sample) - want) < 1e-9


def test_rnd_range():
    seeds = rng.tea(jnp.arange(10000, dtype=jnp.uint32), jnp.uint32(7))
    s, _ = rng.rnd(seeds)
    s = np.asarray(s)
    assert (s >= 0.0).all() and (s < 1.0).all()
    # Roughly uniform.
    assert abs(s.mean() - 0.5) < 0.01


def test_rnd_masked_only_advances_masked_lanes():
    seeds = jnp.asarray([1, 2, 3, 4], jnp.uint32)
    mask = jnp.asarray([True, False, True, False])
    _, out = rng.rnd_masked(seeds, mask)
    out = np.asarray(out)
    assert out[0] != 1 and out[2] != 3
    assert out[1] == 2 and out[3] == 4
