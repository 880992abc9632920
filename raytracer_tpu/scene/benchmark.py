"""Procedural benchmark scene at Sponza scale.

The reference's large scenes are unusable in this checkout: Sponza,
white-room and bed_room ship without their .bin geometry blobs
(.MISSING_LARGE_BLOBS), and conference.glb is a 468-triangle low-poly decimat
— so the ~300k-triangle BVH-stress workload BASELINE config 4 calls for has
to be generated. This builds a deterministic "atrium": a colonnade of
high-res spheres inside a walled room with an emissive ceiling panel —
architectural occlusion (columns shadowing each other), mixed materials
(diffuse/metal/glossy), and a triangle count tunable to the Sponza scale.
"""

from __future__ import annotations

from raytracer_tpu.scene.model import Material, Scene, create_plane, create_sphere


def create_benchmark_atrium(target_triangles: int = 300_000) -> Scene:
    scene = Scene()
    floor_mat = scene.add_material(
        Material(name="floor", albedo=(0.7, 0.68, 0.65), roughness=0.9)
    )
    wall_mat = scene.add_material(
        Material(name="wall", albedo=(0.75, 0.72, 0.6), roughness=1.0)
    )
    col_mats = [
        scene.add_material(
            Material(name="column_diffuse", albedo=(0.8, 0.78, 0.7),
                     roughness=0.8)
        ),
        scene.add_material(
            Material(name="column_metal", albedo=(0.85, 0.83, 0.8),
                     metallic=1.0, roughness=0.15)
        ),
        scene.add_material(
            Material(name="column_glossy", albedo=(0.4, 0.5, 0.7),
                     roughness=0.3)
        ),
    ]
    light_mat = scene.add_material(
        Material(name="skylight", albedo=(1.0, 1.0, 1.0),
                 emission_color=(1.0, 0.95, 0.9), emission_power=20.0)
    )

    plane = scene.add_mesh(create_plane())
    sphere = scene.add_mesh(create_sphere(32, 32))  # 1984 tris
    sphere_tris = scene.meshes[sphere].num_triangles

    # Room shell: 40 x 12 x 20 units.
    w, h, d = 40.0, 12.0, 20.0
    scene.add_object("Floor", plane, floor_mat, position=(0, 0, 0),
                     scale=(w, d, 1), rotation=(-90, 0, 0))
    scene.add_object("Ceiling", plane, wall_mat, position=(0, h, 0),
                     scale=(w, d, 1), rotation=(90, 0, 0))
    scene.add_object("Back", plane, wall_mat, position=(0, h / 2, d / 2),
                     scale=(w, h, 1), rotation=(0, 180, 0))
    scene.add_object("Front", plane, wall_mat, position=(0, h / 2, -d / 2),
                     scale=(w, h, 1))
    scene.add_object("Left", plane, wall_mat, position=(-w / 2, h / 2, 0),
                     scale=(d, h, 1), rotation=(0, 90, 0))
    scene.add_object("Right", plane, wall_mat, position=(w / 2, h / 2, 0),
                     scale=(d, h, 1), rotation=(0, -90, 0))
    scene.add_object("Skylight", plane, light_mat,
                     position=(0, h - 0.05, 0), scale=(w * 0.4, d * 0.4, 1),
                     rotation=(90, 0, 0))

    # Colonnade: stacked spheres as "columns" on a grid filling the
    # triangle budget.
    n_spheres = max(1, (target_triangles - 14) // sphere_tris)
    import math

    per_column = 4
    n_columns = max(1, n_spheres // per_column)
    cols_x = max(1, int(math.sqrt(n_columns * w / d)))
    cols_z = max(1, (n_columns + cols_x - 1) // cols_x)
    placed = 0
    for ix in range(cols_x):
        for iz in range(cols_z):
            if placed >= n_spheres:
                break
            x = -w / 2 + (ix + 0.5) * w / cols_x
            z = -d / 2 + (iz + 0.5) * d / cols_z
            for k in range(per_column):
                if placed >= n_spheres:
                    break
                y = 1.0 + k * 2.2
                r = 1.0 - 0.12 * k
                scene.add_object(
                    f"col_{ix}_{iz}_{k}", sphere,
                    col_mats[(ix + iz + k) % len(col_mats)],
                    position=(x, y, z), scale=(r, r, r),
                )
                placed += 1
    return scene
