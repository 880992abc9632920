"""Headless interactive-loop demo: orbit the camera around the Cornell box,
accumulating a few samples per stop — the application_run/update/render loop
(src/raytracer/application.odin:109-115) without a window. Each camera move
dirties the camera and resets progressive accumulation, exactly like the
reference's controller.

Run from the repo root:  python examples/turntable.py [n_stops] [out_prefix]
"""

import math
import sys

import numpy as np

sys.path.insert(0, ".")

from raytracer_tpu.api import ProgressiveRenderer
from raytracer_tpu.ops.camera import Camera
from raytracer_tpu.scene.model import create_cornell_box
from raytracer_tpu.utils.config import RenderConfig
from raytracer_tpu.utils.image import write_image
from raytracer_tpu.utils.stats import RenderStats


def main():
    n_stops = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    prefix = sys.argv[2] if len(sys.argv) > 2 else "turntable"
    scene = create_cornell_box()
    cfg = RenderConfig(width=160, height=160)
    camera = Camera.create(position=(0, 0, -3), aspect=1.0)
    r = ProgressiveRenderer(scene, camera, cfg)
    stats = RenderStats()
    stats.set_scene_counts(scene)

    radius = 3.0
    for stop in range(n_stops):
        angle = 2.0 * math.pi * stop / n_stops
        camera.position = np.asarray(
            [radius * math.sin(angle), 0.0, -radius * math.cos(angle)],
            np.float32,
        )
        camera.look_at((0.0, 0.0, 0.0))
        for _ in range(8):
            stats.frame_begin()
            r.step()
            stats.frame_end()
        assert r.frame == 8  # the move reset accumulation
        write_image(f"{prefix}_{stop:02d}.png", r.image())
        print(f"stop {stop}: wrote {prefix}_{stop:02d}.png")
    print(stats.format_table())


if __name__ == "__main__":
    main()
