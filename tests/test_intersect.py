"""Möller–Trumbore + BVH traversal vs a numpy oracle on random scenes."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.accel.bvh import build_bvh_numpy
from raytracer_tpu.ops.intersect import intersect_brute, moller_trumbore


def _numpy_oracle(origins, dirs, v0, e1, e2, t_min, t_max):
    """Straightforward O(R*T) closest hit in float64."""
    r = len(origins)
    best_t = np.full(r, t_max, np.float64)
    best_tri = np.full(r, -1, np.int64)
    for i in range(r):
        o, d = origins[i].astype(np.float64), dirs[i].astype(np.float64)
        pvec = np.cross(d, e2)
        det = np.einsum("ij,ij->i", e1, pvec)
        ok = np.abs(det) > 1e-10
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - v0
        u = np.einsum("ij,ij->i", tvec, pvec) * inv
        qvec = np.cross(tvec, e1)
        v = np.einsum("j,ij->i", d, qvec) * inv
        t = np.einsum("ij,ij->i", e2, qvec) * inv
        valid = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < best_t[i])
        if valid.any():
            j = np.argmin(np.where(valid, t, np.inf))
            best_t[i] = t[j]
            best_tri[i] = j
    return best_t, best_tri


def _random_tris(rng_np, t):
    base = rng_np.uniform(-2, 2, size=(t, 3)).astype(np.float32)
    e1 = rng_np.uniform(-0.7, 0.7, size=(t, 3)).astype(np.float32)
    e2 = rng_np.uniform(-0.7, 0.7, size=(t, 3)).astype(np.float32)
    return base, e1, e2


def _random_rays(rng_np, r):
    o = rng_np.uniform(-3, 3, size=(r, 3)).astype(np.float32)
    d = rng_np.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_moller_trumbore_unit():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.asarray([[0.25, 0.25, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, u, v, ok = moller_trumbore(o, d, v0, e1, e2, 1e-3, 1e4)
    assert bool(ok[0])
    assert abs(float(t[0]) - 1.0) < 1e-6
    assert abs(float(u[0]) - 0.25) < 1e-6
    assert abs(float(v[0]) - 0.25) < 1e-6
    # Backface hit also counts (no culling, gl_RayFlagsOpaque only).
    t, u, v, ok = moller_trumbore(o, -d, v0, e1, e2, 1e-3, 1e4)
    assert not bool(ok[0])  # pointing away -> no hit
    o2 = jnp.asarray([[0.25, 0.25, 1.0]])
    t, u, v, ok = moller_trumbore(o2, -d, v0, e1, e2, 1e-3, 1e4)
    assert bool(ok[0])


def test_brute_force_matches_oracle(rng_np):
    t_count, r_count = 128, 64
    v0, e1, e2 = _random_tris(rng_np, t_count)
    o, d = _random_rays(rng_np, r_count)
    want_t, want_tri = _numpy_oracle(o, d, v0, e1, e2, 1e-3, 1e4)
    rec = intersect_brute(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        1e-3, 1e4, chunk_size=32,
    )
    got_t = np.asarray(rec.t)
    got_tri = np.asarray(rec.tri)
    hits = want_tri >= 0
    np.testing.assert_array_equal(got_tri >= 0, hits)
    np.testing.assert_allclose(got_t[hits], want_t[hits], rtol=2e-4, atol=2e-4)
    # Same winning triangle except when two tris tie within tolerance.
    mismatch = (got_tri != want_tri) & hits
    assert mismatch.mean() < 0.05


def test_bvh_matches_brute(rng_np):
    from tests.conftest import make_traversal_scene
    from raytracer_tpu.ops.traverse import intersect_bvh, occlusion_bvh

    t_count, r_count = 512, 256
    v0, e1, e2 = _random_tris(rng_np, t_count)
    o, d = _random_rays(rng_np, r_count)

    scene = make_traversal_scene(v0, e1, e2, leaf_size=4)
    assert sorted(scene.perm.tolist()) == list(range(t_count))

    rec_bvh = intersect_bvh(jnp.asarray(o), jnp.asarray(d), scene, 1e-3, 1e4)
    rec_brute = intersect_brute(
        jnp.asarray(o), jnp.asarray(d),
        scene.tri_v0, scene.tri_e1, scene.tri_e2,
        1e-3, 1e4, chunk_size=64,
    )
    np.testing.assert_array_equal(
        np.asarray(rec_bvh.hit), np.asarray(rec_brute.hit)
    )
    hits = np.asarray(rec_brute.hit)
    np.testing.assert_allclose(
        np.asarray(rec_bvh.t)[hits], np.asarray(rec_brute.t)[hits],
        rtol=1e-5, atol=1e-5,
    )

    # Occlusion: a hit within range means occluded (no skip object).
    skip = jnp.full((r_count,), -1, jnp.int32)
    occ = occlusion_bvh(
        jnp.asarray(o), jnp.asarray(d), 1e-3,
        jnp.full((r_count,), 1e4, jnp.float32), scene, skip,
    )
    np.testing.assert_array_equal(np.asarray(occ), hits)


def test_bvh_skip_object_masking(rng_np):
    from tests.conftest import make_traversal_scene
    from raytracer_tpu.ops.traverse import occlusion_bvh

    # Single triangle belonging to object 7; skipping it => unoccluded.
    v0 = np.asarray([[-1.0, -1.0, 1.0]], np.float32)
    e1 = np.asarray([[2.0, 0.0, 0.0]], np.float32)
    e2 = np.asarray([[0.0, 2.0, 0.0]], np.float32)
    scene = make_traversal_scene(
        v0, e1, e2, tri_object=np.asarray([7], np.int32), leaf_size=4
    )

    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t_max = jnp.asarray([10.0])
    occ = occlusion_bvh(o, d, 1e-3, t_max, scene,
                        jnp.asarray([7], jnp.int32))
    assert not bool(occ[0])
    occ = occlusion_bvh(o, d, 1e-3, t_max, scene,
                        jnp.asarray([3], jnp.int32))
    assert bool(occ[0])
