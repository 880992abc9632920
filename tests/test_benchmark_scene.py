"""The procedural benchmark atrium (BASELINE config 4's BVH-stress stand-in)."""

import numpy as np

from raytracer_tpu.scene.benchmark import create_benchmark_atrium


def test_atrium_hits_triangle_budget():
    scene = create_benchmark_atrium(300_000)
    assert 250_000 <= scene.num_triangles <= 310_000
    lights = [
        o for o in scene.objects
        if scene.materials[o.material_index].emission_power > 0
    ]
    assert len(lights) == 1


def test_atrium_small_render():
    from raytracer_tpu.api import render
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_atrium(5_000)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=1.0,
                        target=(8.0, 3.0, 4.0))
    img = render(scene, cam, RenderConfig(width=24, height=24), num_frames=2)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01  # lit by the skylight


def test_atrium_deterministic_geometry():
    a = create_benchmark_atrium(50_000)
    b = create_benchmark_atrium(50_000)
    assert a.num_triangles == b.num_triangles
    np.testing.assert_array_equal(
        a.meshes[1].positions, b.meshes[1].positions
    )
