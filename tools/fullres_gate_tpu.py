"""Full-resolution, full-spp oracle gates on real TPU hardware.

The CPU test suite gates the BASELINE-config resolutions at low matched
spp (a 1-core CPU pays ~100-160 s per 256^2 fast-path frame;
tests/test_oracle.py). On the TPU the same frames are milliseconds, so
this runner gates the HIGH-spp goldens (cornell 256x256 @ 32 spp,
cornell_pbr 512x512 @ 16 spp, from tools/make_oracle_goldens.py
--fullres) through the production accelerated path and records
FULLRES_GATE.json. Queued in tools/bank_on_return.py; same 0.98 SSIM bar
as the reference's ssim_compare.py validation (ssim_compare.py:6-21).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "FULLRES_GATE.json")
ORACLE_DIR = os.path.join(os.path.dirname(OUT), "golden", "oracle")


def run():
    import jax

    from raytracer_tpu.api import render
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.loaders import load_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig
    from raytracer_tpu.utils.image import ssim, tonemap

    enable_persistent_cache()
    from tools.make_oracle_goldens import FULLRES

    report = {"device": str(jax.devices()[0]), "checks": {}, "ok": True}
    for name, path, cam_kind, size, spps in FULLRES:
        spp = max(spps)
        golden = os.path.join(ORACLE_DIR, f"{name}_{spp}spp_f32.npy")
        if not (os.path.exists(golden) and os.path.exists(path)):
            report["checks"][name] = {"skipped": "golden or scene missing"}
            continue
        cam = None
        if cam_kind == "pbr_cam":
            cam = Camera.create(position=(0, 1.0, 3.2), aspect=1.0,
                                target=(0, 1.0, 0))
        t0 = time.perf_counter()
        img = render(load_scene(path), cam,
                     RenderConfig(width=size, height=size), num_frames=spp)
        matched = np.load(golden)
        score = float(ssim(tonemap(matched), tonemap(img)))
        mean_err = float(abs(img.mean() - matched.mean())
                         / max(matched.mean(), 1e-6))
        ok = score >= 0.98 and mean_err < 0.05
        report["checks"][name] = {
            "ok": ok, "ssim": round(score, 5),
            "mean_err": round(mean_err, 5), "spp": spp,
            "resolution": f"{size}x{size}",
            "seconds": round(time.perf_counter() - t0, 1),
        }
        report["ok"] &= ok
        print(f"{name}: ssim {score:.5f} mean_err {mean_err:.4f} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
    report["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"fullres_gate": report}), flush=True)
    return report["ok"]


if __name__ == "__main__":
    sys.exit(0 if run() else 1)
