"""Divergent sub-packet kernel vs the XLA lockstep walk and the packet
kernel (interpret mode on CPU; the TPU path is exercised by bench.py and
tools/v3_kernel_lab.py, which measured 0 mismatches on the 1080p bench
wavefront)."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.ops.pallas_subpacket import (
    intersect_bvh_subpacket,
    occlusion_bvh_subpacket,
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
    got = intersect_bvh_subpacket(o, d, scene, 1e-3, 1e4, interpret=True)
    hits = np.asarray(ref.hit)
    np.testing.assert_array_equal(hits, np.asarray(got.hit))
    np.testing.assert_array_equal(
        np.asarray(ref.tri)[hits], np.asarray(got.tri)[hits]
    )
    np.testing.assert_allclose(
        np.asarray(ref.t)[hits], np.asarray(got.t)[hits], rtol=1e-5,
        atol=1e-5,
    )


def test_closest_active_mask(rng_np):
    scene, o, d = _scene_and_rays(rng_np, r=700)
    active = jnp.asarray(rng_np.uniform(size=700) < 0.6)
    ref = intersect_bvh(o, d, scene, 1e-3, 1e4, active_mask=active)
    got = intersect_bvh_subpacket(o, d, scene, 1e-3, 1e4,
                                  active_mask=active, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    hits = np.asarray(ref.hit)
    np.testing.assert_array_equal(
        np.asarray(ref.tri)[hits], np.asarray(got.tri)[hits]
    )


def test_occlusion_matches_xla_walk(rng_np):
    scene, o, d = _scene_and_rays(rng_np)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e4, jnp.float32)
    skip = jnp.full((r,), -1, jnp.int32)
    ref = occlusion_bvh(o, d, 1e-3, t_max, scene, skip)
    got = occlusion_bvh_subpacket(o, d, 1e-3, t_max, scene, skip,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_occlusion_skip_object_and_tmax(rng_np):
    v0 = np.asarray([[-1.0, -1.0, 1.0]], np.float32)
    e1 = np.asarray([[2.0, 0.0, 0.0]], np.float32)
    e2 = np.asarray([[0.0, 2.0, 0.0]], np.float32)
    scene = make_traversal_scene(
        v0, e1, e2, tri_object=np.asarray([7], np.int32), leaf_size=8
    )
    o = jnp.asarray([[0.0, 0.0, 0.0]] * 3, jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3, jnp.float32)
    t_max = jnp.asarray([10.0, 10.0, 0.5], jnp.float32)
    # Lane 0: occluder counts; lane 1: skipped via object id; lane 2: t_max
    # stops short of the plane at z=1.
    skip = jnp.asarray([-1, 7, -1], jnp.int32)
    occ = occlusion_bvh_subpacket(o, d, 1e-3, t_max, scene, skip,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), [True, False, False])


def test_multi_part_scene_matches_single(rng_np):
    """Scenes exceeding the VMEM budget bake into subtree parts; sequential
    per-part passes folding best-t / the occlusion mask must be hit-identical
    to the single-part kernel."""
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.scene.model import create_cornell_box

    scene = create_cornell_box()
    ds1, _ = bake_scene(scene)
    # ~6k tris pack into ~0.8 MB of rows; a 96 KB budget forces many parts.
    dsp, _ = bake_scene(scene, pallas_budget_bytes=96 * 1024)
    assert dsp.num_parts > 1
    assert dsp.pallas_vmem_bytes <= 96 * 1024
    assert dsp.part_max_depth >= 0

    r = 900
    o = rng_np.uniform(-1, 1, (r, 3)).astype(np.float32) * np.asarray(
        [2.0, 2.0, 2.0], np.float32)
    d = rng_np.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = intersect_bvh_subpacket(o, d, ds1, 1e-3, 1e4, interpret=True)
    got = intersect_bvh_subpacket(o, d, dsp, 1e-3, 1e4, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    hits = np.asarray(ref.hit)
    np.testing.assert_array_equal(
        np.asarray(ref.tri)[hits], np.asarray(got.tri)[hits]
    )
    np.testing.assert_allclose(
        np.asarray(ref.t)[hits], np.asarray(got.t)[hits], rtol=1e-6,
        atol=1e-6,
    )

    t_max = jnp.full((r,), 1e4, jnp.float32)
    skip = jnp.full((r,), -1, jnp.int32)
    occ1 = occlusion_bvh_subpacket(o, d, 1e-3, t_max, ds1, skip,
                                   interpret=True)
    occp = occlusion_bvh_subpacket(o, d, 1e-3, t_max, dsp, skip,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occp))


def test_single_leaf_root(rng_np):
    """A scene small enough that the BVH root is one leaf block (leaves
    never transit the stack — the init path must route the root into the
    leaf queue)."""
    v0 = rng_np.uniform(-1, 1, (4, 3)).astype(np.float32)
    e1 = rng_np.uniform(-1, 1, (4, 3)).astype(np.float32)
    e2 = rng_np.uniform(-1, 1, (4, 3)).astype(np.float32)
    scene = make_traversal_scene(v0, e1, e2, leaf_size=8)
    o = rng_np.uniform(-2, 2, (130, 3)).astype(np.float32)
    d = rng_np.normal(size=(130, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = intersect_bvh(o, d, scene, 1e-3, 1e4)
    got = intersect_bvh_subpacket(o, d, scene, 1e-3, 1e4, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    hits = np.asarray(ref.hit)
    np.testing.assert_array_equal(
        np.asarray(ref.tri)[hits], np.asarray(got.tri)[hits]
    )


def test_part_order_does_not_change_results(rng_np):
    """Near-to-far part ordering (round 3) only tightens t-caps; results
    must be identical to the fixed bake-order traversal."""
    import dataclasses

    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.scene.model import create_cornell_box

    scene = create_cornell_box()
    dsp, _ = bake_scene(scene, pallas_budget_bytes=96 * 1024)
    assert dsp.num_parts > 1
    assert dsp.part_aabb is not None
    assert dsp.part_aabb.shape == (dsp.num_parts, 6)
    # Disable ordering by dropping the AABBs -> fixed bake order.
    ds_fixed = dataclasses.replace(dsp, part_aabb=None)

    r = 900
    o = rng_np.uniform(-2, 2, (r, 3)).astype(np.float32)
    d = rng_np.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    a = intersect_bvh_subpacket(o, d, ds_fixed, 1e-3, 1e4, interpret=True)
    b = intersect_bvh_subpacket(o, d, dsp, 1e-3, 1e4, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))

    t_max = jnp.full((r,), 1e4, jnp.float32)
    skip = jnp.full((r,), -1, jnp.int32)
    occ_a = occlusion_bvh_subpacket(o, d, 1e-3, t_max, ds_fixed, skip,
                                    interpret=True)
    occ_b = occlusion_bvh_subpacket(o, d, 1e-3, t_max, dsp, skip,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


def test_full_render_multipart_matches_single(rng_np):
    """End-to-end render equality: a forced multi-part bake (part-affinity
    sorted wavefronts + near-to-far ordered passes) must produce the SAME
    image as the single-part bake — sorting is a lane permutation and part
    passes only tighten caps."""
    import raytracer_tpu.api as api
    from raytracer_tpu.api import ProgressiveRenderer
    from raytracer_tpu.scene.model import create_cornell_box
    from raytracer_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=16, height=16, accel="pallas")
    single = ProgressiveRenderer(create_cornell_box(), None, cfg).render(2)
    old = api.PALLAS_VMEM_BUDGET
    try:
        api.PALLAS_VMEM_BUDGET = 96 * 1024
        r = ProgressiveRenderer(create_cornell_box(), None, cfg)
        assert r.device_scene.num_parts > 1
        assert r.device_scene.part_aabb is not None
        multi = r.render(2)
    finally:
        api.PALLAS_VMEM_BUDGET = old
    np.testing.assert_allclose(multi, single, rtol=1e-6, atol=1e-6)


def test_part_affinity_miss_bucket():
    """Rays that miss every part AABB must land in the TOP affinity bucket
    (they die at every root slab; binning them with part 0 — argmin of an
    all-inf row — diluted part-0 kernel groups), and entering rays must get
    the part they enter first."""
    from raytracer_tpu.integrator.wavefront import _part_affinity
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.scene.model import create_cornell_box

    dsp, _ = bake_scene(create_cornell_box(),
                        pallas_budget_bytes=96 * 1024)
    assert dsp.num_parts > 1
    nb = max(1, min(3, int(dsp.num_parts).bit_length()))

    # Rays starting far outside, pointing AWAY from the scene: miss all.
    n = 8
    o = jnp.tile(jnp.asarray([[50.0, 50.0, 50.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    aff = np.asarray(_part_affinity(dsp, o, d, nb))
    assert (aff == (1 << nb) - 1).all(), aff

    # A ray inside the box hits SOME part, and never the miss bucket when
    # the bucket count exceeds the part count.
    o2 = jnp.zeros((n, 3), jnp.float32)
    aff2 = np.asarray(_part_affinity(dsp, o2, d, nb))
    if (1 << nb) - 1 >= dsp.num_parts:
        assert (aff2 < dsp.num_parts).all(), aff2
