"""Production spp-batch path throughput on TPU (round 5).

TILESIZE_LAB.json measured spp batching on raw `render_wavefront` calls;
this lab confirms the PRODUCTION path — `ProgressiveRenderer` with
`RenderConfig(spp_batch=S)`, i.e. `render_frame`'s batched dispatch plus
the S exact-sequential accumulate folds — delivers the same throughput
recovery on a small-tile-sized pixel grid.

Grid: 480x270 = 129,600 pixels, the 1/16-tile lane count from
TILESIZE_LAB.json (strided_1/16: 2.43 Mrays/s at S=1; batched_1/16_x16:
3.64). The atrium camera/scene match the headline workload so rates are
comparable. Writes SPPBATCH_PROD.json.

Reference workload being scaled: /root/reference/shaders/simple.rgen:92-104
(1 sample/pixel/frame); the batching knob has no reference analog.
"""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from raytracer_tpu.api import ProgressiveRenderer
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    W, H = 480, 270
    scene = create_benchmark_atrium(300_000)
    out = {
        "what": __doc__.split("\n")[0],
        "grid": f"{W}x{H} = {W * H} pixels (TILESIZE_LAB 1/16-tile lane "
                "count)",
        "scene": "atrium 300k (headline camera)",
        "variants": {},
    }
    ref_img = None
    for S in (1, 4, 16):
        cfg = RenderConfig(width=W, height=H, max_depth=3, accel="pallas",
                           spp_batch=S)
        cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=W / H,
                            target=(0.0, 4.0, 0.0))
        r = ProgressiveRenderer(scene, cam, cfg)
        t0 = time.perf_counter()
        r.step()  # compile + warmup
        np.asarray(r.accum).mean()
        warm = time.perf_counter() - t0
        launches = max(1, 32 // S)
        t0 = time.perf_counter()
        for _ in range(launches):
            r.step()
        jnp.asarray(r.accum).block_until_ready()
        dt = time.perf_counter() - t0
        samples = launches * S * W * H
        img = r.image()
        row = {
            "spp_batch": S,
            "launches_timed": launches,
            "samples_accumulated": r.frame,
            "warmup_s": round(warm, 1),
            "ms_per_launch": round(1e3 * dt / launches, 1),
            "msamples_per_sec": round(samples / dt / 1e6, 3),
            "mean_radiance": float(img.mean()),
        }
        if ref_img is None:
            ref_img = img
        else:
            # All variants accumulate the same sample set (frames
            # 0..S*launches) modulo count: compare at matched counts only
            # when equal; otherwise record the mean for sanity.
            row["mean_vs_s1"] = float(np.abs(img.mean() - ref_img.mean()))
        out["variants"][f"S{S}"] = row
        print(json.dumps(row))
    s1 = out["variants"]["S1"]["msamples_per_sec"]
    s16 = out["variants"]["S16"]["msamples_per_sec"]
    out["recovery_s16_vs_s1"] = round(s16 / s1, 2)
    with open("SPPBATCH_PROD.json", "w") as f:
        json.dump(out, f, indent=1)
    print("recovery S16/S1:", out["recovery_s16_vs_s1"])


if __name__ == "__main__":
    main()
