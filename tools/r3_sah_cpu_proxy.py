"""CPU proxy for tree quality: widest-axis SAH vs 3-axis SAH, no TPU needed.

The sub-packet kernel's cost is iteration count x ~394 cyc serial latency
(ARCHITECTURE.md), so the per-ray quad-tree visit count is the direct cost
model. This sims the production traversal (4-wide collapse, near-first
ordered pushes, per-ray best-t pruning) in numpy over a primary-ray sample
plus a synthetic diffuse bounce off the primary hits, and reports mean
visits per ray for each split policy. Also reports the classic SAH tree
cost as a sanity cross-check.

Decides whether tools/r3_sah_axes_lab.py (end-to-end, needs the TPU) is
worth running when the tunnel returns.

Run: JAX_PLATFORMS=cpu python -u tools/r3_sah_cpu_proxy.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.r3_sah_axes_lab import _sah_split_widest  # noqa: E402

N_PRIMARY = 4096
N_BOUNCE = 4096
SEED = 7


def primary_rays(ipm, ivm, width, height, px, py):
    """Camera rays for pixel coords (shared by the r3_* proxy labs so the
    NDC/Y-flip convention lives in ONE place)."""
    n = len(px)
    ndc = np.stack([(px + 0.5) / width * 2 - 1,
                    (py + 0.5) / height * 2 - 1], -1)
    tgt = np.concatenate([ndc, np.ones((n, 1)), np.ones((n, 1))], -1) @ ipm.T
    d = tgt[:, :3] / tgt[:, 3:4]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = (np.concatenate([d, np.zeros((n, 1))], -1) @ ivm.T)[:, :3]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    org = np.broadcast_to(ivm[:3, 3], dirs.shape).astype(np.float32)
    return org, dirs.astype(np.float32)


def world_tris(scene):
    v0s, e1s, e2s = [], [], []
    for obj in scene.objects:
        mesh = scene.meshes[obj.mesh_index]
        m = obj.transform.model_matrix
        wpos = mesh.positions @ m[:3, :3].T + m[:3, 3]
        tris = mesh.indices.reshape(-1, 3).astype(np.int64)
        a, b, c = wpos[tris[:, 0]], wpos[tris[:, 1]], wpos[tris[:, 2]]
        v0s.append(a)
        e1s.append(b - a)
        e2s.append(c - a)
    return (np.concatenate(v0s).astype(np.float32),
            np.concatenate(e1s).astype(np.float32),
            np.concatenate(e2s).astype(np.float32))


def sah_cost(bvh):
    def area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                      + d[:, 2] * d[:, 0])

    a = area(bvh.nodes_min, bvh.nodes_max)
    root = a[0] if a[0] > 0 else 1.0
    leaf = bvh.nodes_count > 0
    return (a[~leaf].sum() + 1.5 * (a[leaf] * bvh.nodes_count[leaf]).sum()) / root


def quad_sim(qnodes, qmeta, v0, e1, e2, bvh, origins, dirs, leaf_size):
    """Per-ray DFS over the quad tree with near-first ordering and best-t
    pruning — the sub-packet kernel's visit semantics at packet size 1.
    Vectorized over rays at each visit via a per-ray stack array.

    Returns (internal_visits, leaf_visits) per ray.
    """
    n = len(origins)
    nm = qnodes[:, :24].reshape(-1, 4, 6)  # [Q,4,(min,max)]
    cmin = nm[:, :, 0:3]
    cmax = nm[:, :, 3:6]
    meta = qmeta.reshape(-1, 4)

    # Pre-permute triangles to leaf order.
    order = bvh.tri_order
    pv0, pe1, pe2 = v0[order], e1[order], e2[order]
    leaf_first = bvh.nodes_first[bvh.nodes_count > 0]
    leaf_count = bvh.nodes_count[bvh.nodes_count > 0]

    inv = 1.0 / np.where(np.abs(dirs) < 1e-12, 1e-12, dirs)

    STACK = 128
    stack = np.full((n, STACK), -1, np.int64)
    sp = np.ones(n, np.int64)
    stack[:, 0] = 0  # quad root
    best_t = np.full(n, 1e4, np.float32)
    iv = np.zeros(n, np.int64)
    lv = np.zeros(n, np.int64)

    live = sp > 0
    while live.any():
        li = np.nonzero(live)[0]
        sp[li] -= 1
        node = stack[li, sp[li]]

        is_leaf = node < 0
        # --- leaf drains ---
        if is_leaf.any():
            ri = li[is_leaf]
            lid = ~node[is_leaf]
            lv[ri] += 1
            f = leaf_first[lid]
            for j in range(leaf_size):
                t_idx = f + j
                valid = j < leaf_count[lid]
                t_idx = np.where(valid, t_idx, 0)
                a = pv0[t_idx]
                E1 = pe1[t_idx]
                E2 = pe2[t_idx]
                d = dirs[ri]
                o = origins[ri]
                p = np.cross(d, E2)
                det = (E1 * p).sum(-1)
                ok = np.abs(det) > 1e-12
                invd = 1.0 / np.where(ok, det, 1.0)
                tv = o - a
                u = (tv * p).sum(-1) * invd
                q = np.cross(tv, E1)
                vv = (d * q).sum(-1) * invd
                t = (E2 * q).sum(-1) * invd
                hit = (ok & valid & (u >= 0) & (vv >= 0) & (u + vv <= 1)
                       & (t > 1e-3) & (t < best_t[ri]))
                best_t[ri] = np.where(hit, t, best_t[ri])
        # --- internal visits ---
        if (~is_leaf).any():
            ri = li[~is_leaf]
            q = node[~is_leaf]
            iv[ri] += 1
            o = origins[ri][:, None, :]
            t0 = (cmin[q] - o) * inv[ri][:, None, :]
            t1 = (cmax[q] - o) * inv[ri][:, None, :]
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            hit = (tf >= np.maximum(tn, 1e-3)) & (tn < best_t[ri][:, None])
            hit &= ~np.isnan(cmin[q]).any(-1)  # absent children are NaN
            tn = np.where(hit, tn, np.inf)
            # Near-first DFS: push far-to-near so the nearest pops first.
            far_order = np.argsort(-tn, axis=1, kind="stable")
            for c in range(4):
                slot = far_order[:, c]
                h = hit[np.arange(len(q)), slot]
                m = meta[q, slot]
                push = np.nonzero(h)[0]
                stack[ri[push], sp[ri[push]]] = m[push]
                sp[ri[push]] += 1
        live = sp > 0
    return iv, lv, best_t


def main():
    from raytracer_tpu.accel import bvh as bvh_mod
    from raytracer_tpu.accel.bvh import build_bvh_numpy, collapse_bvh4
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium

    WIDTH, HEIGHT = 1920, 1080
    LEAF = 16
    scene = create_benchmark_atrium(300_000)
    v0, e1, e2 = world_tris(scene)
    print(f"{len(v0)} world tris", flush=True)

    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ivm = np.asarray(mats["inverse_view"], np.float64)
    ipm = np.asarray(mats["inverse_proj"], np.float64)

    rng = np.random.default_rng(SEED)
    px = rng.integers(0, WIDTH, N_PRIMARY)
    py = rng.integers(0, HEIGHT, N_PRIMARY)
    org0, dirs0 = primary_rays(ipm, ivm, WIDTH, HEIGHT, px, py)

    # Production _sah_split is now the 3-axis/32-bin sweep (bvh.py); the
    # legacy widest-axis split lives in r3_sah_axes_lab for comparison.
    variants = [
        ("widest-16", lambda lo, hi, c, i: _sah_split_widest(lo, hi, c, i, 16), 16),
        ("3-axis-32 (production)", None, 32),
    ]

    orig = bvh_mod._sah_split
    results = {}
    try:
        for label, split, _bins in variants:
            bvh_mod._sah_split = orig if split is None else split
            t0 = time.perf_counter()
            bvh = build_bvh_numpy(v0, e1, e2, leaf_size=LEAF)
            build_s = time.perf_counter() - t0
            qnodes, qmeta, qroot, need = collapse_bvh4(bvh)
            cost = sah_cost(bvh)
            iv, lvv, best_t = quad_sim(qnodes, qmeta, v0, e1, e2, bvh,
                                       org0, dirs0, LEAF)
            results[label] = (bvh, qnodes, qmeta, best_t)
            print(f"{label}: nodes {bvh.num_nodes}, quads {len(qnodes)}, "
                  f"depth {bvh.max_depth()}, build {build_s:.1f}s, "
                  f"SAH {cost:.1f} | primary visits/ray: "
                  f"internal {iv.mean():.1f} leaf {lvv.mean():.1f} "
                  f"total {(iv + lvv).mean():.1f}", flush=True)
    finally:
        bvh_mod._sah_split = orig

    # Diffuse bounce off the production tree's primary hits (shared ray set
    # so the comparison is apples-to-apples).
    bvh0, qn0, qm0, t0s = results["widest-16"]
    hit = t0s < 9e3
    hp = org0[hit] + dirs0[hit] * t0s[hit][:, None] * 0.999
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
