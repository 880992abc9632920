"""On-TPU Mosaic kernel regression check (VERDICT r2 #7).

All Pallas correctness tests run in interpret mode on CPU; a Mosaic
miscompile or layout regression would pass the suite and only surface as a
wrong benchmark image. This harness runs the REAL compiled kernels on the
attached TPU and asserts hit-identity against the XLA lockstep walk on a
bench-style workload:

  - closest-hit: sub-packet kernel vs XLA walk (tri ids + t within 1e-4),
  - any-hit: occlusion kernel vs XLA walk (exact mask equality),
  - multi-part: a forced 2+-part bake must be hit-identical to single-part,
  - stable-shapes: a capacity-padded bake (the interactive default) must be
    hit-identical on real Mosaic too — padded qnode/leaf rows must stay
    unreachable under the compiled layout, not just in interpret mode.

Writes TPU_SMOKE.json; bench.py runs this after its datapoints (skip with
RAYTRACER_TPU_SKIP_SMOKE=1). Reference analog: the Vulkan validation layers
running against the real driver (src/raytracer/device.odin:50-62).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def run(report_path="TPU_SMOKE.json"):
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.ops.pallas_subpacket import (
        intersect_bvh_subpacket,
        occlusion_bvh_subpacket,
    )
    from raytracer_tpu.ops.traverse import intersect_bvh, occlusion_bvh
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    t_start = time.perf_counter()
    # Small atrium + a 256x144 ray grid: big enough to exercise deep trees,
    # small enough that the XLA-walk oracle stays a few seconds.
    scene = create_benchmark_atrium(30_000)
    cfg = RenderConfig(width=256, height=144, accel="pallas")
    ds, _ = bake_scene(scene)
    dsp, _ = bake_scene(scene, pallas_budget_bytes=1 * 1024 * 1024)

    cam = Camera.create(position=(-16.0, 6.5, -7.5),
                        aspect=cfg.width / cfg.height, target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    n = cfg.num_pixels
    idx = jnp.arange(n, dtype=jnp.uint32)
    from raytracer_tpu.integrator.wavefront import _camera_rays

    origin, direction = _camera_rays(
        jnp.asarray(mats["inverse_view"]), jnp.asarray(mats["inverse_proj"]),
        cfg.width, cfg.height, jnp.full((n, 2), 0.5, jnp.float32), idx,
    )
    # A bounce-like incoherent set too: reflect off a pseudo-random normal.
    key = jax.random.PRNGKey(7)
    rnd = jax.random.normal(key, (n, 3))
    nrm = rnd / jnp.linalg.norm(rnd, axis=1, keepdims=True)
    bdir = direction - 2.0 * jnp.sum(direction * nrm, axis=1,
                                     keepdims=True) * nrm
    bdir = bdir / jnp.linalg.norm(bdir, axis=1, keepdims=True)

    checks = {}

    def closest_check(name, scene_ds, o, d):
        ref = jax.jit(lambda o, d: intersect_bvh(o, d, ds, 1e-3, 1e4))(o, d)
        got = jax.jit(lambda o, d: intersect_bvh_subpacket(
            o, d, scene_ds, 1e-3, 1e4, interpret=False))(o, d)
        hit_mism = int(np.sum(np.asarray(ref.hit) != np.asarray(got.hit)))
        hits = np.asarray(ref.hit)
        tri_mism = int(np.sum(
            np.asarray(ref.tri)[hits] != np.asarray(got.tri)[hits]))
        dt = (float(np.abs(np.asarray(ref.t)[hits]
                           - np.asarray(got.t)[hits]).max())
              if hits.any() else 0.0)
        ok = hit_mism == 0 and tri_mism == 0 and dt < 1e-4
        checks[name] = {"ok": ok, "hit_mism": hit_mism,
                        "tri_mism": tri_mism, "max_dt": dt}
        return ok

    def occl_check(name, scene_ds, o, d):
        t_max = jnp.full((n,), 1e4, jnp.float32)
        skip = jnp.full((n,), -1, jnp.int32)
        ref = jax.jit(lambda o, d: occlusion_bvh(
            o, d, 1e-3, t_max, ds, skip))(o, d)
        got = jax.jit(lambda o, d: occlusion_bvh_subpacket(
            o, d, 1e-3, t_max, scene_ds, skip, interpret=False))(o, d)
        mism = int(np.sum(np.asarray(ref) != np.asarray(got)))
        checks[name] = {"ok": mism == 0, "mism": mism}
        return mism == 0

    ok = True
    ok &= closest_check("closest_primary", ds, origin, direction)
    ok &= closest_check("closest_incoherent", ds, origin, bdir)
    ok &= occl_check("occlusion_primary", ds, origin, direction)
    ok &= closest_check(
        f"closest_multipart_p{dsp.num_parts}", dsp, origin, direction)
    ok &= occl_check(
        f"occlusion_multipart_p{dsp.num_parts}", dsp, origin, bdir)
    assert dsp.num_parts > 1
    dss, _ = bake_scene(scene, stable_shapes=True)
    assert dss.nodes_skip.shape[0] > ds.nodes_skip.shape[0]  # really padded
    ok &= closest_check("closest_stable_padded", dss, origin, bdir)
    ok &= occl_check("occlusion_stable_padded", dss, origin, direction)

    report = {
        "ok": bool(ok),
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "triangles": scene.num_triangles,
        "rays": int(n),
        "parts_forced": int(dsp.num_parts),
        "elapsed_s": round(time.perf_counter() - t_start, 1),
        "checks": checks,
    }
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"tpu_smoke": report}), flush=True)
    return ok


if __name__ == "__main__":
    sys.exit(0 if run() else 1)
