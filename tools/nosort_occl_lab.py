"""Is the shadow-ray position sort worth it at bounce 0 (image-ordered
primary hits) with the quad sub-packet kernel?"""
import functools, sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from tools.occl_lab import shadow_rays_at
from raytracer_tpu.integrator import wavefront as wf
from raytracer_tpu.ops.pallas_subpacket import occlusion_bvh_subpacket
from raytracer_tpu.ops.camera import Camera
from raytracer_tpu.scene.benchmark import create_benchmark_atrium
from raytracer_tpu.scene.device_scene import bake_scene
from raytracer_tpu.utils.config import RenderConfig
import numpy as np

WIDTH, HEIGHT = 1920, 1080

def measure(fn, *args):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
    return out, (time.perf_counter() - t0) / 3

def main():
    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3, accel="pallas")
    ds, _ = bake_scene(scene, leaf_size=8)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    m = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(m["inverse_view"]),
           "inverse_proj": jnp.asarray(m["inverse_proj"])}
    n = cfg.num_pixels
    for bounce in (0, 1):
        o, d, tm, skip, active = shadow_rays_at(ds, ubo, cfg, n, bounce)
        float(jnp.sum(o))
        f_sorted = jax.jit(lambda ds, o, d, t, s, a: wf._occluded(
            ds, o, d, t, s, cfg, a))
        occ_s, dt_s = measure(f_sorted, ds, o, d, tm, skip, active)
        f_plain = jax.jit(lambda o, d, t, s, a, ds: occlusion_bvh_subpacket(
            o, d, 1e-3, jnp.where(a, t, 1e-3), ds, s))
        occ_p, dt_p = measure(f_plain, o, d, tm, skip, active, ds)
        agree = int((np.asarray(occ_s & active) != np.asarray(
            occ_p & active)).sum())
        print(f"bounce{bounce}: sorted {dt_s*1e3:7.1f} ms  "
              f"unsorted {dt_p*1e3:7.1f} ms  disagree {agree}", flush=True)

main()
