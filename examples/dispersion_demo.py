"""Chromatic dispersion demo on the reference's multi-dispersion scene.

The shipped glTF has transmission=1/ior=1.5 glass but no
KHR_materials_dispersion (and the reference's shaders ignore transmission
entirely — SURVEY.md §2.5); this demo turns dispersion on through the scene
mutation API and renders the spectral fringes.

Run from the repo root:  python examples/dispersion_demo.py [out.png]
"""

import dataclasses
import sys

sys.path.insert(0, ".")

from raytracer_tpu.api import render
from raytracer_tpu.ops.camera import Camera
from raytracer_tpu.scene.loaders import load_scene
from raytracer_tpu.utils.config import RenderConfig
from raytracer_tpu.utils.image import write_image


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "dispersion_demo.png"
    scene = load_scene("/root/reference/scenes/multi-dispersion.gltf")
    for i, m in enumerate(scene.materials):
        if m.transmission > 0:
            scene.update_material(i, dataclasses.replace(m, dispersion=0.6))
    cam = Camera.create(
        position=(0.3, 0.35, 0.35), aspect=1.0, target=(-0.15, 0.08, -0.2)
    )
    cfg = RenderConfig(width=256, height=256, max_depth=8, rr_start_depth=3)
    img = render(scene, cam, cfg, num_frames=64)
    write_image(out, img)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
