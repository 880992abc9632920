"""Vectorized stackless BVH traversal — the TPU `traceRayEXT`.

Replaces the hardware traversal of `traceRayEXT`/`rayQueryEXT`
(simple.rgen:92-104, simple.rchit:362-371) with a lockstep walk of the
flattened skip-link BVH (accel/bvh.py) over the whole ray wavefront:

  per ray state: one node cursor + current best hit
  per step:      gather node AABB -> slab test against best-t
                 leaf? test its <=leaf_size triangles (gathered, masked)
                 advance: hit&internal -> node+1, else -> skip[node]

All rays advance in the same `lax.while_loop`; divergence costs masked work
(a ray that finishes early idles until the slowest ray in the wavefront is
done), which is the price of lockstep SIMD — mitigated by the shared scene
coherence of camera/bounce wavefronts. Gathers dominate: nodes and triangle
geometry are gathered per step, everything else is fused VPU arithmetic.

Two variants: `intersect_bvh` (closest hit) and `occlusion_bvh` (any hit
with an object-id skip mask, terminating each lane at first accepted hit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.ops.intersect import HitRecord, moller_trumbore


def _slab_test(o, inv_d, node_min, node_max, t_min, t_max):
    """Ray-AABB slab test. inv_d is precomputed 1/direction with the IEEE
    inf convention for zero components (then 0*inf -> nan is avoided by
    min/max ordering below)."""
    t0 = (node_min - o) * inv_d
    t1 = (node_max - o) * inv_d
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return t_near <= t_far


def _safe_inv(direction):
    """1/d with sign-preserving clamp to avoid 0*inf NaNs in the slab test."""
    d = jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.where(direction >= 0, 1e-20, -1e-20),
        direction,
    )
    return 1.0 / d


def intersect_bvh(origin, direction, scene, t_min: float, t_max,
                  leaf_size: int = 8, active_mask=None) -> HitRecord:
    """Closest-hit traversal. origin/direction f32[R,3]; `scene` is a
    SceneOnDevice (only node + tri geometry arrays are touched).
    `t_max` may be a scalar or f32[R]. `active_mask` (bool[R], optional)
    skips traversal for dead wavefront lanes (they report a miss)."""
    r = origin.shape[0]
    nn = scene.nodes_skip.shape[0]
    num_tris = scene.tri_v0.shape[0]
    inv_d = _safe_inv(direction)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    def cond(state):
        cur = state[0]
        return jnp.any(cur < nn)

    def body(state):
        cur, best_t, best_tri, best_u, best_v = state
        active = cur < nn
        node = jnp.minimum(cur, nn - 1)
        nmin = scene.nodes_min[node]
        nmax = scene.nodes_max[node]
        first = scene.nodes_first[node]
        count = scene.nodes_count[node]
        skip = scene.nodes_skip[node]

        hit_box = _slab_test(origin, inv_d, nmin, nmax, t_min, best_t) & active
        is_leaf = count > 0

        test_leaf = hit_box & is_leaf
        for k in range(leaf_size):
            ti = jnp.minimum(first + k, num_tris - 1)
            do = test_leaf & (k < count)
            v0 = scene.tri_v0[ti]
            e1 = scene.tri_e1[ti]
            e2 = scene.tri_e2[ti]
            t, u, v, valid = moller_trumbore(
                origin, direction, v0, e1, e2, t_min, best_t
            )
            upd = do & valid
            best_t = jnp.where(upd, t, best_t)
            best_tri = jnp.where(upd, ti.astype(jnp.int32), best_tri)
            best_u = jnp.where(upd, u, best_u)
            best_v = jnp.where(upd, v, best_v)

        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, cur + 1, skip)
        cur = jnp.where(active, nxt, cur)
        return cur, best_t, best_tri, best_u, best_v

    start = jnp.zeros((r,), jnp.int32)
    if active_mask is not None:
        start = jnp.where(active_mask, 0, nn)
    init = (
        start,
        t_max,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, init)
    return HitRecord(
        t=best_t, tri=best_tri, u=best_u, v=best_v, hit=best_tri >= 0
    )


def occlusion_bvh(origin, direction, t_min, t_max, scene, skip_object,
                  leaf_size: int = 8, active_mask=None):
    """Any-hit traversal for shadow rays: returns bool[R] `occluded`.

    Hits on `skip_object` (i32[R], the sampled light object) are ignored —
    the lockstep equivalent of isVisibleRQ treating the light instance as
    visible (simple.rchit:373-384). Lanes terminate at their first accepted
    hit. `active_mask` (bool[R], optional) pre-terminates lanes that don't
    need the test (their result is False)."""
    r = origin.shape[0]
    nn = scene.nodes_skip.shape[0]
    num_tris = scene.tri_v0.shape[0]
    inv_d = _safe_inv(direction)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    def cond(state):
        cur = state[0]
        return jnp.any(cur < nn)

    def body(state):
        cur, occluded = state
        active = cur < nn
        node = jnp.minimum(cur, nn - 1)
        nmin = scene.nodes_min[node]
        nmax = scene.nodes_max[node]
        first = scene.nodes_first[node]
        count = scene.nodes_count[node]
        skip = scene.nodes_skip[node]

        hit_box = _slab_test(origin, inv_d, nmin, nmax, t_min, t_max) & active
        is_leaf = count > 0

        found = jnp.zeros((r,), bool)
        test_leaf = hit_box & is_leaf
        for k in range(leaf_size):
            ti = jnp.minimum(first + k, num_tris - 1)
            do = test_leaf & (k < count)
            _, _, _, valid = moller_trumbore(
                origin, direction,
                scene.tri_v0[ti], scene.tri_e1[ti], scene.tri_e2[ti],
                t_min, t_max,
            )
            accepted = valid & (scene.tri_object[ti] != skip_object)
            found = found | (do & accepted)

        occluded = occluded | found
        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, cur + 1, skip)
        nxt = jnp.where(found, nn, nxt)  # early exit on first hit
        cur = jnp.where(active, nxt, cur)
        return cur, occluded

    start = jnp.zeros((r,), jnp.int32)
    if active_mask is not None:
        start = jnp.where(active_mask, 0, nn)
    init = (start, jnp.zeros((r,), bool))
    _, occluded = jax.lax.while_loop(cond, body, init)
    return occluded
