"""Exact-sweep SAH vs production 32-bin binned SAH (CPU visit proxy).

Binned SAH evaluates only 31 candidate split planes per axis; the exact
sweep sorts the range and evaluates every between-primitives position.
If the tree it yields visits measurably fewer quads per ray, a hybrid
(exact below a range-size threshold, binned above) is worth productionizing
in both builders. Cost model as in tools/r3_sah_cpu_proxy.py: visits x
~394 cyc serial latency.

Run: JAX_PLATFORMS=cpu python -u tools/r3_sah_exact_lab.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.r3_sah_cpu_proxy import quad_sim, world_tris  # noqa: E402

LEAF = 16
N_PRIMARY = 4096
N_BOUNCE = 4096
SEED = 7
EXACT_BELOW = 1 << 62  # exact everywhere for the measurement


def _area(mn, mx):
    d = np.maximum(mx - mn, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def _sah_split_exact(lo, hi, centroids, idx):
    """Full-sweep SAH: for each axis sort by centroid and evaluate every
    split position with prefix/suffix AABB areas."""
    c = centroids[idx]
    cmin = c.min(axis=0)
    cmax = c.max(axis=0)
    extent = cmax - cmin
    widest = int(np.argmax(extent))
    if extent[widest] <= 1e-12:
        half = len(idx) // 2
        return idx[:half], idx[half:]

    n = len(idx)
    tlo = lo[idx]
    thi = hi[idx]
    best_cost = np.inf
    best = None
    counts = np.arange(1, n, dtype=np.float64)
    for axis in range(3):
        if extent[axis] <= 1e-12:
            continue
        order = np.argsort(c[:, axis], kind="stable")
        slo = tlo[order]
        shi = thi[order]
        lmin = np.minimum.accumulate(slo, axis=0)
        lmax = np.maximum.accumulate(shi, axis=0)
        rmin = np.minimum.accumulate(slo[::-1], axis=0)[::-1]
        rmax = np.maximum.accumulate(shi[::-1], axis=0)[::-1]
        costs = (_area(lmin[:-1], lmax[:-1]) * counts
                 + _area(rmin[1:], rmax[1:]) * counts[::-1])
        k = int(np.argmin(costs))
        if costs[k] < best_cost:
            best_cost = costs[k]
            best = (order, k)

    if best is None:
        order = np.argsort(c[:, widest], kind="stable")
        half = n // 2
        return idx[order[:half]], idx[order[half:]]
    order, k = best
    return idx[order[: k + 1]], idx[order[k + 1 :]]


def rays(scene_res, ipm, ivm, rng, n):
    w, h = scene_res
    px = rng.integers(0, w, n)
    py = rng.integers(0, h, n)
    ndc = np.stack([(px + 0.5) / w * 2 - 1, (py + 0.5) / h * 2 - 1], -1)
    tgt = np.concatenate([ndc, np.ones((n, 1)), np.ones((n, 1))], -1) @ ipm.T
    d = tgt[:, :3] / tgt[:, 3:4]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = (np.concatenate([d, np.zeros((n, 1))], -1) @ ivm.T)[:, :3]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    org = np.broadcast_to(ivm[:3, 3], dirs.shape).astype(np.float32)
    return org, dirs.astype(np.float32)


def main():
    from raytracer_tpu.accel import bvh as bvh_mod
    from raytracer_tpu.accel.bvh import build_bvh_numpy, collapse_bvh4
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium

    WIDTH, HEIGHT = 1920, 1080
    scene = create_benchmark_atrium(300_000)
    v0, e1, e2 = world_tris(scene)
    print(f"{len(v0)} world tris", flush=True)

    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ivm = np.asarray(mats["inverse_view"], np.float64)
    ipm = np.asarray(mats["inverse_proj"], np.float64)
    rng = np.random.default_rng(SEED)
    org0, dirs0 = rays((WIDTH, HEIGHT), ipm, ivm, rng, N_PRIMARY)

    binned = bvh_mod._sah_split

    def hybrid(lo, hi, centroids, idx):
        if len(idx) <= EXACT_BELOW:
            return _sah_split_exact(lo, hi, centroids, idx)
        return binned(lo, hi, centroids, idx)

    variants = [("binned-32 (production)", None), ("exact-sweep", hybrid)]
    results = {}
    orig = bvh_mod._sah_split
    try:
        for label, split in variants:
            bvh_mod._sah_split = orig if split is None else split
            t0 = time.perf_counter()
            bvh = build_bvh_numpy(v0, e1, e2, leaf_size=LEAF)
            build_s = time.perf_counter() - t0
            qnodes, qmeta, _, need = collapse_bvh4(bvh)
            iv, lvv, best_t = quad_sim(qnodes, qmeta, v0, e1, e2, bvh,
                                       org0, dirs0, LEAF)
            results[label] = (bvh, qnodes, qmeta, best_t)
            print(f"{label}: nodes {bvh.num_nodes}, quads {len(qnodes)}, "
                  f"build {build_s:.1f}s, stack_need {need} | "
                  f"primary visits/ray: internal {iv.mean():.1f} "
                  f"leaf {lvv.mean():.1f} total {(iv + lvv).mean():.1f}",
                  flush=True)
    finally:
        bvh_mod._sah_split = orig

    t_ref = results[variants[0][0]][3]
    hit = t_ref < 9e3
    hp = org0[hit] + dirs0[hit] * t_ref[hit][:, None] * 0.999
    k = min(N_BOUNCE, len(hp))
    sel = rng.permutation(len(hp))[:k]
    hp = hp[sel]
    z = rng.standard_normal((k, 3)).astype(np.float32)
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    print(f"bounce sample: {k} rays", flush=True)
    for label, (bvh, qnodes, qmeta, _) in results.items():
        iv, lvv, _ = quad_sim(qnodes, qmeta, v0, e1, e2, bvh, hp, z, LEAF)
        print(f"{label}: bounce visits/ray: internal {iv.mean():.1f} "
              f"leaf {lvv.mean():.1f} total {(iv + lvv).mean():.1f}",
              flush=True)


if __name__ == "__main__":
    main()
