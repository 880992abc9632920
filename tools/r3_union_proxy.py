"""Union-level tree-quality proxy: 256-ray GROUP visit unions (CPU).

The sub-packet kernel's cost is not per-ray visits but per-ROW visits,
where a row serves 256 lanes in lockstep: a node is visited if ANY of the
256 rays wants it (each with its own best-t). Per-ray proxies
(tools/r3_sah_cpu_proxy.py) can overstate a tree improvement if the union
re-absorbs it. This sims the union semantics directly: sort rays by the
production wavefront key (dead-last, direction octant, 27-bit origin
Morton — integrator/wavefront.py:_sort_wavefront), cut into 256-ray
groups, and DFS each group over the quad tree pushing a child when any
live ray's slab test passes (near-first by group-min t_near), draining
leaves against every ray's best-t.

Reports mean union visits per group for the legacy widest-axis tree vs
the production 3-axis/32-bin tree, on primary and bounce wavefront
samples of the 300k bench scene.

Run: JAX_PLATFORMS=cpu python -u tools/r3_union_proxy.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.r3_sah_axes_lab import _sah_split_widest  # noqa: E402
from tools.r3_sah_cpu_proxy import (  # noqa: E402
    primary_rays,
    quad_sim,
    world_tris,
)

LEAF = 16
GROUP = 256
N_GROUPS = 24  # groups sampled per wavefront
SEED = 7


def _morton9(q):
    q = q.astype(np.uint64) & 0x1FF
    q = (q | (q << 16)) & 0x030000FF
    q = (q | (q << 8)) & 0x0300F00F
    q = (q | (q << 4)) & 0x030C30C3
    q = (q | (q << 2)) & 0x09249249
    return q


def sort_key(origins, dirs, smin, smax):
    """The production bounce-wavefront key (all lanes alive, single part)."""
    extent = np.maximum(smax - smin, 1e-6)
    q = np.clip((origins - smin) / extent * 511.0, 0.0, 511.0).astype(np.uint64)
    morton = _morton9(q[:, 0]) | (_morton9(q[:, 1]) << 1) | (_morton9(q[:, 2]) << 2)
    octant = ((dirs[:, 0] >= 0).astype(np.uint64)
              | ((dirs[:, 1] >= 0).astype(np.uint64) << 1)
              | ((dirs[:, 2] >= 0).astype(np.uint64) << 2))
    return (octant << 27) | morton


def union_sim(qnodes, qmeta, v0, e1, e2, bvh, origins, dirs, leaf_size):
    """DFS one 256-ray group at a time over the quad tree with union pushes.

    Returns (internal_visits, leaf_visits) per group.
    """
    nm = qnodes[:, :24].reshape(-1, 4, 6)
    cmin = nm[:, :, 0:3]
    cmax = nm[:, :, 3:6]
    meta = qmeta.reshape(-1, 4)
    order = bvh.tri_order
    pv0, pe1, pe2 = v0[order], e1[order], e2[order]
    leaf_first = bvh.nodes_first[bvh.nodes_count > 0]
    leaf_count = bvh.nodes_count[bvh.nodes_count > 0]

    n = len(origins)
    assert n % GROUP == 0
    ivs, lvs = [], []
    for g in range(n // GROUP):
        o = origins[g * GROUP : (g + 1) * GROUP]
        d = dirs[g * GROUP : (g + 1) * GROUP]
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        best_t = np.full(GROUP, 1e4, np.float32)
        stack = [0]
        iv = lv = 0
        while stack:
            node = stack.pop()
            if node < 0:
                lv += 1
                lid = ~node
                f = leaf_first[lid]
                cnt = leaf_count[lid]
                for j in range(min(leaf_size, cnt)):
                    a, E1, E2 = pv0[f + j], pe1[f + j], pe2[f + j]
                    p = np.cross(d, E2[None, :])
                    det = (E1[None, :] * p).sum(-1)
                    ok = np.abs(det) > 1e-12
                    invd = 1.0 / np.where(ok, det, 1.0)
                    tv = o - a[None, :]
                    u = (tv * p).sum(-1) * invd
                    q = np.cross(tv, E1[None, :])
                    vv = (d * q).sum(-1) * invd
                    t = (E2[None, :] * q).sum(-1) * invd
                    hit = (ok & (u >= 0) & (vv >= 0) & (u + vv <= 1)
                           & (t > 1e-3) & (t < best_t))
                    best_t = np.where(hit, t, best_t)
                continue
            iv += 1
            t0 = (cmin[node][None] - o[:, None, :]) * inv[:, None, :]
            t1 = (cmax[node][None] - o[:, None, :]) * inv[:, None, :]
            tn = np.minimum(t0, t1).max(-1)  # [256,4]
            tf = np.maximum(t0, t1).min(-1)
            hit = (tf >= np.maximum(tn, 1e-3)) & (tn < best_t[:, None])
            hit &= ~np.isnan(cmin[node]).any(-1)[None, :]
            any_hit = hit.any(0)  # [4]
            tn_grp = np.where(hit, tn, np.inf).min(0)  # group-min t_near
            for c in np.argsort(-tn_grp, kind="stable"):
                if any_hit[c]:
                    stack.append(int(meta[node, c]))
        ivs.append(iv)
        lvs.append(lv)
    return np.asarray(ivs), np.asarray(lvs)


def main():
    from raytracer_tpu.accel import bvh as bvh_mod
    from raytracer_tpu.accel.bvh import build_bvh_numpy, collapse_bvh4
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium

    WIDTH, HEIGHT = 1920, 1080
    scene = create_benchmark_atrium(300_000)
    v0, e1, e2 = world_tris(scene)
    smin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2).min(0)
    smax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2).max(0)
    print(f"{len(v0)} world tris", flush=True)

    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ivm = np.asarray(mats["inverse_view"], np.float64)
    ipm = np.asarray(mats["inverse_proj"], np.float64)

    rng = np.random.default_rng(SEED)
    n = GROUP * N_GROUPS
    # Primary rays from a contiguous pixel block (image order = dispatch
    # order for the primary pass).
    base = rng.integers(0, WIDTH * HEIGHT - n)
    pix = np.arange(base, base + n)
    px, py = pix % WIDTH, pix // WIDTH
    org0, dirs0 = primary_rays(ipm, ivm, WIDTH, HEIGHT, px, py)

    orig = bvh_mod._sah_split
    trees = {}
    try:
        for label, split in [
            ("widest-16",
             lambda lo, hi, c, i: _sah_split_widest(lo, hi, c, i, 16)),
            ("3-axis-32 (production)", None),
        ]:
            bvh_mod._sah_split = orig if split is None else split
            t0 = time.perf_counter()
            bvh = build_bvh_numpy(v0, e1, e2, leaf_size=LEAF)
            qnodes, qmeta, _, _ = collapse_bvh4(bvh)
            print(f"{label}: build {time.perf_counter() - t0:.1f}s, "
                  f"quads {len(qnodes)}", flush=True)
            trees[label] = (bvh, qnodes, qmeta)
    finally:
        bvh_mod._sah_split = orig

    for label, (bvh, qnodes, qmeta) in trees.items():
        iv, lv = union_sim(qnodes, qmeta, v0, e1, e2, bvh, org0, dirs0, LEAF)
        print(f"{label}: PRIMARY union visits/group: internal "
              f"{iv.mean():.0f} leaf {lv.mean():.0f} "
              f"total {(iv + lv).mean():.0f}", flush=True)

    # Bounce wavefront: hits from the production tree, random hemisphere
    # dirs, sorted by the production key, grouped.
    bvh, qnodes, qmeta = trees["3-axis-32 (production)"]
    _, _, t_prim = quad_sim(qnodes, qmeta, v0, e1, e2, bvh, org0, dirs0, LEAF)
    hit = t_prim < 9e3
    hp = (org0[hit] + dirs0[hit] * t_prim[hit][:, None] * 0.999)
    k = (len(hp) // GROUP) * GROUP
    if k > GROUP * N_GROUPS:
        k = GROUP * N_GROUPS
    hp = hp[rng.permutation(len(hp))[:k]]
    z = rng.standard_normal((k, 3)).astype(np.float32)
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    key = sort_key(hp, z, smin, smax)
    o_sort = np.argsort(key, kind="stable")
    hp, z = hp[o_sort], z[o_sort]
    print(f"bounce sample: {k} rays sorted by production key", flush=True)
    for label, (bvh, qnodes, qmeta) in trees.items():
        iv, lv = union_sim(qnodes, qmeta, v0, e1, e2, bvh, hp, z, LEAF)
        print(f"{label}: BOUNCE union visits/group: internal "
              f"{iv.mean():.0f} leaf {lv.mean():.0f} "
              f"total {(iv + lv).mean():.0f}", flush=True)


if __name__ == "__main__":
    main()
