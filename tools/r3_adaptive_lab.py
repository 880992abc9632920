"""Adaptive sampling on TPU: frame-time decay as pixels converge.

Renders the 300k-tri bench scene at preview resolution for K frames with
--adaptive-style per-pixel convergence (integrator/adaptive.py) and
records ms/frame + converged fraction per frame, against a plain run of
the same length. The win mechanism: retired lanes carry the dead-last
sort key, so their kernel groups terminate in one pop — frame cost should
track the unconverged fraction (plus the fixed shade/sort floor).

Run: python -u tools/r3_adaptive_lab.py [--scene atrium|cornell]
         [--tol T] [--frames K] [--min-frames M] [--size WxH]

Defaults reproduce the banked round-4 run (atrium, tol 0.05, 48 frames):
zero overhead (1.00x) but only 2.27% of pixels retire by frame 47 — the
atrium's NEE noise converges far slower than a 48-frame horizon, so no
decay is observable there. The decay mechanism needs either a longer run
or a faster-converging scene/tolerance; the non-default settings exist to
measure exactly that.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", choices=("atrium", "cornell"),
                    default="atrium")
    ap.add_argument("--tol", type=float, default=0.05)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--min-frames", type=int, default=8)
    ap.add_argument("--size", default="512x288")
    args = ap.parse_args()
    WIDTH, HEIGHT = (int(v) for v in args.size.split("x"))
    FRAMES, TOL, MIN_FRAMES = args.frames, args.tol, args.min_frames
    from raytracer_tpu.integrator.adaptive import (
        AdaptiveState,
        active_mask,
        render_frame_adaptive,
    )
    from raytracer_tpu.integrator.wavefront import render_frame
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    if args.scene == "atrium":
        scene = create_benchmark_atrium(300_000)
        cam_pos, cam_target = (-16.0, 6.5, -7.5), (8.0, 3.0, 4.0)
    else:
        from raytracer_tpu.scene.model import create_cornell_box
        scene = create_cornell_box()
        cam_pos, cam_target = (0.0, 1.0, 3.2), (0.0, 1.0, 0.0)
    ds, _ = bake_scene(scene)
    cam = Camera.create(position=cam_pos, aspect=WIDTH / HEIGHT,
                        target=cam_target)
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}

    cfg_a = RenderConfig(width=WIDTH, height=HEIGHT, accel="pallas",
                         adaptive_tol=TOL, adaptive_min_frames=MIN_FRAMES)
    cfg_p = RenderConfig(width=WIDTH, height=HEIGHT, accel="pallas")
    n = cfg_a.num_pixels

    adapt = jax.jit(lambda s: render_frame_adaptive(ds, ubo, s, cfg_a))
    plain = jax.jit(lambda a, f: render_frame(ds, ubo, a, f, cfg_p))

    # Warm both programs.
    st = adapt(AdaptiveState.empty(n))
    jax.block_until_ready(st)
    acc = plain(jnp.zeros((n, 3), jnp.float32), jnp.uint32(0))
    jax.block_until_ready(acc)

    st = AdaptiveState.empty(n)
    acc = jnp.zeros((n, 3), jnp.float32)
    print("frame  plain_ms  adaptive_ms  converged", flush=True)
    plain_total = adapt_total = 0.0
    for f in range(FRAMES):
        t0 = time.perf_counter()
        acc = plain(acc, jnp.uint32(f))
        jax.block_until_ready(acc)
        t_plain = time.perf_counter() - t0
        t0 = time.perf_counter()
        st = adapt(st)
        jax.block_until_ready(st)
        t_adapt = time.perf_counter() - t0
        conv = float(1.0 - jnp.mean(
            active_mask(st, cfg_a).astype(jnp.float32)))
        plain_total += t_plain
        adapt_total += t_adapt
        if f < 4 or f % 4 == 0 or f == FRAMES - 1:
            print(f"{f:5d}  {t_plain*1e3:8.1f}  {t_adapt*1e3:11.1f}  "
                  f"{conv:9.2%}", flush=True)

    a = np.asarray(st.mean)
    p = np.asarray(acc)
    rel = np.abs(a - p).mean() / max(p.mean(), 1e-6)
    print(f"\ntotals: plain {plain_total:.2f}s, adaptive {adapt_total:.2f}s "
          f"({plain_total/adapt_total:.2f}x), mean-rel-diff {rel:.4f}, "
          f"final converged {conv:.2%}", flush=True)


if __name__ == "__main__":
    main()
