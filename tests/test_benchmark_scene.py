"""The procedural benchmark scenes (BASELINE config 4's BVH-stress
stand-ins): the atrium and the Sponza-geometry-class hall."""

import numpy as np

from raytracer_tpu.scene.benchmark import (
    create_benchmark_atrium,
    create_benchmark_hall,
)


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


def test_hall_hits_triangle_budget_and_scale_mix():
    scene = create_benchmark_hall(300_000)
    assert 250_000 <= scene.num_triangles <= 310_000
    lights = [
        o for o in scene.objects
        if scene.materials[o.material_index].emission_power > 0
    ]
    assert len(lights) == 2  # end panel + skylight strip

    # The Sponza-class property: >100:1 triangle-scale mix. Longest wall
    # triangle edge (world space) vs a drape cell's shortest edge.
    def world_edges(mesh, obj):
        m = obj.transform.model_matrix
        p = mesh.positions @ m[:3, :3].T + m[:3, 3]
        tri = p[mesh.indices.reshape(-1, 3)]
        e = np.linalg.norm(
            tri - np.roll(tri, 1, axis=1), axis=-1
        )
        return e

    by_name = {o.name: o for o in scene.objects}
    wall = by_name["Floor"]
    drape = by_name["drape_0_0"]
    wall_longest = world_edges(
        scene.meshes[wall.mesh_index], wall).max()
    drape_edges = world_edges(scene.meshes[drape.mesh_index], drape)
    # Median drape edge: the typical small triangle (not the degenerate
    # minimum).
    assert wall_longest / np.median(drape_edges) > 100.0


def test_hall_small_render():
    from raytracer_tpu.api import render
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_hall(6_000)
    cam = Camera.create(position=(-27.0, 5.0, 0.0), aspect=1.0,
                        target=(30.0, 5.0, 0.0))
    img = render(scene, cam, RenderConfig(width=24, height=24), num_frames=2)
    assert np.isfinite(img).all()
    assert img.mean() > 0.005  # lit by the far-end panel


def test_hall_deterministic_geometry():
    a = create_benchmark_hall(50_000)
    b = create_benchmark_hall(50_000)
    assert a.num_triangles == b.num_triangles
    np.testing.assert_array_equal(
        a.meshes[2].positions, b.meshes[2].positions
    )


def test_lightgrid_many_lights():
    from raytracer_tpu.scene.benchmark import create_benchmark_lightgrid

    scene = create_benchmark_lightgrid()
    lights = [
        o for o in scene.objects
        if scene.materials[o.material_index].emission_power > 0
    ]
    assert len(lights) == 64  # the many-light regime (MAXLIGHTS=256 cap)
    powers = {
        scene.materials[o.material_index].emission_power for o in lights
    }
    assert max(powers) / min(powers) >= 16.0  # selection must matter
    # The cap holds even when more are requested.
    big = create_benchmark_lightgrid(n_lights=1024)
    n_big = sum(
        1 for o in big.objects
        if big.materials[o.material_index].emission_power > 0
    )
    assert n_big <= 256


def test_lightgrid_small_render():
    from raytracer_tpu.api import render
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_lightgrid
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_lightgrid(n_lights=16, target_triangles=4_000)
    cam = Camera.create(position=(0.0, 4.2, -10.5), aspect=1.0,
                        target=(0.0, 1.2, 1.5))
    img = render(scene, cam, RenderConfig(width=24, height=24), num_frames=2)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01  # lit by the panel grid


def test_lightgrid_deterministic_geometry():
    from raytracer_tpu.scene.benchmark import create_benchmark_lightgrid

    a = create_benchmark_lightgrid()
    b = create_benchmark_lightgrid()
    assert a.num_triangles == b.num_triangles
    for ma, mb in zip(a.materials, b.materials):
        assert ma.emission_power == mb.emission_power
        assert ma.emission_color == mb.emission_color
