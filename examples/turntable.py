"""Turntable animation: N orbit frames, ONE compiled program.

The camera UBO is a traced input of the frame program (api.py), so every
viewpoint of an orbit — or an animation's whole camera track — reuses the
same XLA executable: frame 1 pays the compile (or a persistent-cache
deserialize), frames 2..N pay only render time. The reference's editor
gets this for free from its rasterizer-style pipeline; here it falls out
of keeping the camera out of the jit signature.

Run: python examples/turntable.py [--frames N] [--spp S] [--size WxH]
Writes turntable_000.png .. into --outdir (default /tmp/turntable).
"""

import math
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from raytracer_tpu.api import ProgressiveRenderer
from raytracer_tpu.ops.camera import Camera
from raytracer_tpu.scene.model import create_cornell_box
from raytracer_tpu.utils.compile_cache import enable_persistent_cache
from raytracer_tpu.utils.config import RenderConfig
from raytracer_tpu.utils.image import write_image


def arg(flag, default, cast=str):
    return cast(sys.argv[sys.argv.index(flag) + 1]) \
        if flag in sys.argv else default


def main():
    enable_persistent_cache()
    frames = arg("--frames", 12, int)
    spp = arg("--spp", 4, int)
    w, h = (int(x) for x in arg("--size", "256x256").split("x"))
    outdir = arg("--outdir", "/tmp/turntable")
    os.makedirs(outdir, exist_ok=True)

    scene = create_cornell_box()
    r = ProgressiveRenderer(scene, None, RenderConfig(width=w, height=h))
    radius, height_y = 2.9, 0.1
    times = []
    for i in range(frames):
        a = 2 * math.pi * i / frames * 0.25 - math.pi * 0.125  # ±22.5° arc
        t0 = time.perf_counter()
        r.set_camera(Camera.create(
            position=(radius * math.sin(a), height_y,
                      -radius * math.cos(a)),
            aspect=w / h, target=(0.0, 0.0, 0.1),
        ))
        img = r.render(spp)  # camera change resets accumulation (journal)
        write_image(os.path.join(outdir, f"turntable_{i:03d}.png"), img)
        times.append(time.perf_counter() - t0)
        print(f"frame {i}: {times[-1]:.2f}s ({spp} spp)", flush=True)
    print(f"first frame (compile/cache): {times[0]:.2f}s; "
          f"steady state: {np.median(times[1:]):.2f}s/frame — "
          f"same executable for all {frames} viewpoints", flush=True)


if __name__ == "__main__":
    main()
