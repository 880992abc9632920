"""Tree quality end-to-end: 3-axis binned SAH (now production) vs the
legacy widest-axis split.

Traversal cost is iteration-count x ~394 cyc serial latency, so tree
quality is the one lever that bypasses the latency floor. The CPU proxy
(tools/r3_sah_cpu_proxy.py) measured the 3-axis/32-bin tree at ~24% fewer
per-ray quad visits (primary 19.4 -> 14.8, bounce 15.0 -> 11.3); this lab
measures the headline frame end-to-end on the TPU with each tree.

Images may differ at razor ties (closest-hit ties broken by traversal
order) — report the pixel delta alongside the timing.

Run: python -u tools/r3_sah_axes_lab.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

WIDTH, HEIGHT = 1920, 1080
FRAMES = 5


def _sah_split_widest(lo, hi, centroids, idx, n_bins=16):
    """The legacy split: bin on the widest centroid axis only."""
    c = centroids[idx]
    cmin = c.min(axis=0)
    cmax = c.max(axis=0)
    extent = cmax - cmin
    axis = int(np.argmax(extent))
    if extent[axis] <= 1e-12:
        half = len(idx) // 2
        return idx[:half], idx[half:]

    scale = n_bins * (1.0 - 1e-6) / extent[axis]
    bins = ((c[:, axis] - cmin[axis]) * scale).astype(np.int32)
    bins = np.clip(bins, 0, n_bins - 1)

    counts = np.bincount(bins, minlength=n_bins)
    bin_min = np.full((n_bins, 3), np.inf, np.float32)
    bin_max = np.full((n_bins, 3), -np.inf, np.float32)
    np.minimum.at(bin_min, bins, lo[idx])
    np.maximum.at(bin_max, bins, hi[idx])

    def area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                      + d[..., 2] * d[..., 0])

    lmin = np.minimum.accumulate(bin_min, axis=0)
    lmax = np.maximum.accumulate(bin_max, axis=0)
    rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
    rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
    lcount = np.cumsum(counts)
    rcount = np.cumsum(counts[::-1])[::-1]

    nl = lcount[:-1]
    nr = rcount[1:]
    costs = np.where(
        (nl > 0) & (nr > 0),
        area(lmin[:-1], lmax[:-1]) * nl + area(rmin[1:], rmax[1:]) * nr,
        np.inf,
    )
    k = int(np.argmin(costs))
    if not np.isfinite(costs[k]):
        order = np.argsort(c[:, axis], kind="stable")
        half = len(idx) // 2
        return idx[order[:half]], idx[order[half:]]

    left_sel = bins <= k
    return idx[left_sel], idx[~left_sel]


def main():
    from raytracer_tpu.accel import bvh as bvh_mod
    from raytracer_tpu.accel import native_builder
    from raytracer_tpu.integrator.wavefront import render_wavefront
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(ds, ubo, frame, cfg):
        rad, stats = render_wavefront(ds, ubo, frame, cfg, with_stats=True)
        return rad, stats["total_rays"]

    orig_split = bvh_mod._sah_split
    orig_avail = native_builder.available

    def run(label):
        t0 = time.perf_counter()
        ds, bvh = bake_scene(scene, leaf_size=cfg.bvh_leaf_size)
        bake_s = time.perf_counter() - t0
        for f in range(2):
            rad, nrays = step(ds, ubo, jnp.uint32(f), cfg)
            float(jnp.sum(rad))
        times = []
        total = 0
        for f in range(2, 2 + FRAMES):
            t0 = time.perf_counter()
            rad, nrays = step(ds, ubo, jnp.uint32(f), cfg)
            float(jnp.sum(rad))
            times.append(time.perf_counter() - t0)
            total += int(nrays)
        dt = float(np.median(times))
        print(f"{label}: nodes {bvh.num_nodes}, bake {bake_s:.1f}s, "
              f"median {dt:.3f}s  {total/len(times)/dt/1e6:5.2f} Mrays/s",
              flush=True)
        return np.asarray(rad)

    try:
        ref = run("native 3-axis-32 (production)")
        native_builder.available = lambda: False
        img = run("numpy  3-axis-32")
        d = np.abs(img - ref)
        print(f"   numpy-vs-native delta: max {d.max():.2e} "
              f"({(d.max(axis=-1) > 1e-4).sum()} px)", flush=True)
        bvh_mod._sah_split = _sah_split_widest
        img = run("numpy  widest-16 (legacy)")
        d = np.abs(img - ref)
        print(f"   widest-16 delta: max {d.max():.2e} "
              f"({(d.max(axis=-1) > 1e-4).sum()} px)", flush=True)
    finally:
        bvh_mod._sah_split = orig_split
        native_builder.available = orig_avail


if __name__ == "__main__":
    main()
