"""Pallas packet-traversal kernel vs the XLA lockstep walk (interpret mode
on CPU; the TPU path is exercised by bench.py and the CLI)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.ops.pallas_traverse import (
    intersect_bvh_pallas,
    occlusion_bvh_pallas,
)
from raytracer_tpu.ops.traverse import intersect_bvh, occlusion_bvh
from tests.conftest import make_traversal_scene


def _scene_and_rays(rng_np, t=160, r=1300):
    v0 = rng_np.uniform(-3, 3, (t, 3)).astype(np.float32)
    e1 = rng_np.uniform(-1, 1, (t, 3)).astype(np.float32)
    e2 = rng_np.uniform(-1, 1, (t, 3)).astype(np.float32)
    scene = make_traversal_scene(v0, e1, e2, leaf_size=8)
    o = rng_np.uniform(-4, 4, (r, 3)).astype(np.float32)
    d = rng_np.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return scene, jnp.asarray(o), jnp.asarray(d)


def test_closest_matches_xla_walk(rng_np):
    scene, o, d = _scene_and_rays(rng_np)
    ref = intersect_bvh(o, d, scene, 1e-3, 1e4)
    got = intersect_bvh_pallas(o, d, scene, 1e-3, 1e4, interpret=True)
    hits = np.asarray(ref.hit)
    np.testing.assert_array_equal(hits, np.asarray(got.hit))
    np.testing.assert_array_equal(
        np.asarray(ref.tri)[hits], np.asarray(got.tri)[hits]
    )
    np.testing.assert_allclose(
        np.asarray(ref.t)[hits], np.asarray(got.t)[hits], rtol=1e-5,
        atol=1e-5,
    )


def test_occlusion_matches_xla_walk(rng_np):
    scene, o, d = _scene_and_rays(rng_np)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e4, jnp.float32)
    skip = jnp.full((r,), -1, jnp.int32)
    ref = occlusion_bvh(o, d, 1e-3, t_max, scene, skip)
    got = occlusion_bvh_pallas(o, d, 1e-3, t_max, scene, skip,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_occlusion_skip_object(rng_np):
    v0 = np.asarray([[-1.0, -1.0, 1.0]], np.float32)
    e1 = np.asarray([[2.0, 0.0, 0.0]], np.float32)
    e2 = np.asarray([[0.0, 2.0, 0.0]], np.float32)
    scene = make_traversal_scene(
        v0, e1, e2, tri_object=np.asarray([7], np.int32), leaf_size=8
    )
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t_max = jnp.asarray([10.0])
    occ = occlusion_bvh_pallas(o, d, 1e-3, t_max, scene,
                               jnp.asarray([7], jnp.int32), interpret=True)
    assert not bool(occ[0])
    occ = occlusion_bvh_pallas(o, d, 1e-3, t_max, scene,
                               jnp.asarray([3], jnp.int32), interpret=True)
    assert bool(occ[0])


def test_active_mask_kills_lanes(rng_np):
    scene, o, d = _scene_and_rays(rng_np, r=64)
    mask = np.zeros(64, bool)
    mask[::2] = True
    rec = intersect_bvh_pallas(o, d, scene, 1e-3, 1e4,
                               active_mask=jnp.asarray(mask), interpret=True)
    assert not np.asarray(rec.hit)[~mask].any()


def test_single_triangle_scene():
    v0 = np.asarray([[-1.0, -1.0, 2.0]], np.float32)
    e1 = np.asarray([[2.0, 0.0, 0.0]], np.float32)
    e2 = np.asarray([[0.0, 2.0, 0.0]], np.float32)
    scene = make_traversal_scene(v0, e1, e2, leaf_size=8)
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    rec = intersect_bvh_pallas(o, d, scene, 1e-3, 1e4, interpret=True)
    assert bool(rec.hit[0]) and not bool(rec.hit[1])
    assert abs(float(rec.t[0]) - 2.0) < 1e-5
