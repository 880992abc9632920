"""Deep-bounce compaction benefit on the real TPU.

Renders the 300k-tri atrium at 1080p with max_depth=8 (BASELINE config-3
style depth) with and without compact_deep, and reports s/frame. Depth-3
configs are untouched by design (compaction engages only past
rr_start_depth + 1).
"""

import sys
import time

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from raytracer_tpu.api import ProgressiveRenderer  # noqa: E402
from raytracer_tpu.ops.camera import Camera  # noqa: E402
from raytracer_tpu.scene.benchmark import create_benchmark_atrium  # noqa: E402
from raytracer_tpu.utils.config import RenderConfig  # noqa: E402

WIDTH, HEIGHT = 1920, 1080
FRAMES = 3


def run(compact):
    scene = create_benchmark_atrium(300_000)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=8,
                       accel="pallas", compact_deep=compact)
    r = ProgressiveRenderer(scene, cam, cfg)
    for _ in range(2):
        r.step()
        float(jnp.sum(r.accum))
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        r.step()
        float(jnp.sum(r.accum))
    dt = (time.perf_counter() - t0) / FRAMES
    mean = float(jnp.mean(r.accum))
    print(f"compact={compact}: {dt:.2f} s/frame  mean {mean:.4f}",
          flush=True)
    return dt, mean


def main():
    d1, m1 = run(True)
    d0, m0 = run(False)
    print(f"speedup {d0/d1:.2f}x  mean-diff {abs(m1-m0):.2e}", flush=True)


if __name__ == "__main__":
    main()
