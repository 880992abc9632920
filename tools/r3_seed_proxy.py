"""Origin-leaf best-t seeding for bounce rays (CPU union proxy).

Idea (exact variant of hash-based ray-path prediction, PAPERS.md
arxiv 1910.01304): before traversal, test each bounce ray against the
16-triangle leaf block CONTAINING ITS ORIGIN TRIANGLE. Any hit there is a
genuine hit, so its t is a sound initial best-t cap — traversal can only
confirm or find closer, and every node farther than the cap dies at the
slab test. Rays bouncing in corners/local geometry get tight caps; the
question is whether the 256-ray UNION actually shrinks (a single
uncapped ray in the group still forces the visit).

Measures union visits/group on the production tree with and without
seeding, plus the seed hit rate and the per-ray visit reduction.

Run: JAX_PLATFORMS=cpu python -u tools/r3_seed_proxy.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.r3_sah_cpu_proxy import primary_rays, world_tris  # noqa: E402
from tools.r3_union_proxy import sort_key, union_sim  # noqa: E402

LEAF = 16
GROUP = 256
N_GROUPS = 24
SEED = 7


def quad_sim_tri(qnodes, qmeta, v0, e1, e2, bvh, origins, dirs, leaf_size):
    """Per-ray quad DFS that also records the winning PERMUTED tri row."""
    nm = qnodes[:, :24].reshape(-1, 4, 6)
    cmin, cmax = nm[:, :, 0:3], nm[:, :, 3:6]
    meta = qmeta.reshape(-1, 4)
    order = bvh.tri_order
    pv0, pe1, pe2 = v0[order], e1[order], e2[order]
    leaf_first = bvh.nodes_first[bvh.nodes_count > 0]
    leaf_count = bvh.nodes_count[bvh.nodes_count > 0]

    n = len(origins)
    inv = 1.0 / np.where(np.abs(dirs) < 1e-12, 1e-12, dirs)
    STACK = 128
    stack = np.full((n, STACK), -1, np.int64)
    sp = np.ones(n, np.int64)
    stack[:, 0] = 0
    best_t = np.full(n, 1e4, np.float32)
    best_row = np.full(n, -1, np.int64)
    live = sp > 0
    while live.any():
        li = np.nonzero(live)[0]
        sp[li] -= 1
        node = stack[li, sp[li]]
        is_leaf = node < 0
        if is_leaf.any():
            ri = li[is_leaf]
            lid = ~node[is_leaf]
            f = leaf_first[lid]
            for j in range(leaf_size):
                t_idx = f + j
                valid = j < leaf_count[lid]
                t_idx = np.where(valid, t_idx, 0)
                a, E1, E2 = pv0[t_idx], pe1[t_idx], pe2[t_idx]
                d, o = dirs[ri], origins[ri]
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
                best_row[ri] = np.where(hit, t_idx, best_row[ri])
        if (~is_leaf).any():
            ri = li[~is_leaf]
            q = node[~is_leaf]
            o = origins[ri][:, None, :]
            t0 = (cmin[q] - o) * inv[ri][:, None, :]
            t1 = (cmax[q] - o) * inv[ri][:, None, :]
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            hit = (tf >= np.maximum(tn, 1e-3)) & (tn < best_t[ri][:, None])
            hit &= ~np.isnan(cmin[q]).any(-1)
            tn = np.where(hit, tn, np.inf)
            far = np.argsort(-tn, axis=1, kind="stable")
            for c in range(4):
                slot = far[:, c]
                h = hit[np.arange(len(q)), slot]
                m = meta[q, slot]
                push = np.nonzero(h)[0]
                stack[ri[push], sp[ri[push]]] = m[push]
                sp[ri[push]] += 1
        live = sp > 0
    return best_t, best_row


def main():
    from raytracer_tpu.accel.bvh import build_bvh_numpy, collapse_bvh4
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium

    WIDTH, HEIGHT = 1920, 1080
    scene = create_benchmark_atrium(300_000)
    v0, e1, e2 = world_tris(scene)
    smin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2).min(0)
    smax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2).max(0)
    print(f"{len(v0)} world tris", flush=True)

    bvh = build_bvh_numpy(v0, e1, e2, leaf_size=LEAF)
    qnodes, qmeta, _, _ = collapse_bvh4(bvh)
    order = bvh.tri_order
    pv0, pe1, pe2 = v0[order], e1[order], e2[order]
    leaf_first = bvh.nodes_first[bvh.nodes_count > 0]
    leaf_count = bvh.nodes_count[bvh.nodes_count > 0]

    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ivm = np.asarray(mats["inverse_view"], np.float64)
    ipm = np.asarray(mats["inverse_proj"], np.float64)
    rng = np.random.default_rng(SEED)
    n = GROUP * N_GROUPS * 2  # oversample; bounce set shrinks to hit count
    px = rng.integers(0, WIDTH, n)
    py = rng.integers(0, HEIGHT, n)
    org0, dirs0 = primary_rays(ipm, ivm, WIDTH, HEIGHT, px, py)

    t_prim, row_prim = quad_sim_tri(qnodes, qmeta, v0, e1, e2, bvh,
                                    org0, dirs0, LEAF)
    hit = t_prim < 9e3
    hp = org0[hit] + dirs0[hit] * t_prim[hit][:, None] * 0.999
    hrow = row_prim[hit]
    k = min((len(hp) // GROUP) * GROUP, GROUP * N_GROUPS)
    sel = rng.permutation(len(hp))[:k]
    hp, hrow = hp[sel], hrow[sel]
    z = rng.standard_normal((k, 3)).astype(np.float32)
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    key = sort_key(hp, z, smin, smax)
    o_sort = np.argsort(key, kind="stable")
    hp, z, hrow = hp[o_sort], z[o_sort], hrow[o_sort]
    print(f"bounce sample: {k} rays", flush=True)

    # Seed: closest hit within the origin triangle's leaf block.
    leaf_of = np.searchsorted(leaf_first, hrow, side="right") - 1
    f = leaf_first[leaf_of]
    cnt = leaf_count[leaf_of]
    seed_t = np.full(k, 1e4, np.float32)
    for j in range(LEAF):
        t_idx = np.where(j < cnt, f + j, 0)
        a, E1, E2 = pv0[t_idx], pe1[t_idx], pe2[t_idx]
        p = np.cross(z, E2)
        det = (E1 * p).sum(-1)
        ok = (np.abs(det) > 1e-12) & (j < cnt)
        invd = 1.0 / np.where(ok, det, 1.0)
        tv = hp - a
        u = (tv * p).sum(-1) * invd
        q = np.cross(tv, E1)
        vv = (z * q).sum(-1) * invd
        t = (E2 * q).sum(-1) * invd
        h = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > 1e-3) \
            & (t < seed_t)
        seed_t = np.where(h, t, seed_t)
    seeded = seed_t < 9e3
    print(f"seed hit rate: {seeded.mean():.2%}; "
          f"median seed t (of hits): "
          f"{np.median(seed_t[seeded]) if seeded.any() else np.nan:.3f}",
          flush=True)

    iv0, lv0 = union_sim(qnodes, qmeta, v0, e1, e2, bvh, hp, z, LEAF)
    print(f"unseeded: union visits/group internal {iv0.mean():.0f} "
          f"leaf {lv0.mean():.0f} total {(iv0 + lv0).mean():.0f}", flush=True)

    # Seeded union sim: same walk, initial best_t = seed.
    def union_sim_seeded(init_t):
        nm = qnodes[:, :24].reshape(-1, 4, 6)
        cmin, cmax = nm[:, :, 0:3], nm[:, :, 3:6]
        meta = qmeta.reshape(-1, 4)
        ivs, lvs = [], []
        for g in range(k // GROUP):
            o = hp[g * GROUP:(g + 1) * GROUP]
            dd = z[g * GROUP:(g + 1) * GROUP]
            inv = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
            best_t = init_t[g * GROUP:(g + 1) * GROUP].copy()
            stack = [0]
            iv = lv = 0
            while stack:
                node = stack.pop()
                if node < 0:
                    lv += 1
                    lid = ~node
                    ff = leaf_first[lid]
                    cc = leaf_count[lid]
                    for j in range(min(LEAF, cc)):
                        a, E1, E2 = pv0[ff + j], pe1[ff + j], pe2[ff + j]
                        p = np.cross(dd, E2[None, :])
                        det = (E1[None, :] * p).sum(-1)
                        ok = np.abs(det) > 1e-12
                        invd = 1.0 / np.where(ok, det, 1.0)
                        tv = o - a[None, :]
                        u = (tv * p).sum(-1) * invd
                        q = np.cross(tv, E1[None, :])
                        vv = (dd * q).sum(-1) * invd
                        t = (E2[None, :] * q).sum(-1) * invd
                        h = (ok & (u >= 0) & (vv >= 0) & (u + vv <= 1)
                             & (t > 1e-3) & (t < best_t))
                        best_t = np.where(h, t, best_t)
                    continue
                iv += 1
                t0 = (cmin[node][None] - o[:, None, :]) * inv[:, None, :]
                t1 = (cmax[node][None] - o[:, None, :]) * inv[:, None, :]
                tn = np.minimum(t0, t1).max(-1)
                tf = np.maximum(t0, t1).min(-1)
                h = (tf >= np.maximum(tn, 1e-3)) & (tn < best_t[:, None])
                h &= ~np.isnan(cmin[node]).any(-1)[None, :]
                any_h = h.any(0)
                tg = np.where(h, tn, np.inf).min(0)
                for c in np.argsort(-tg, kind="stable"):
                    if any_h[c]:
                        stack.append(int(meta[node, c]))
            ivs.append(iv)
            lvs.append(lv)
        return np.asarray(ivs), np.asarray(lvs)

    iv1, lv1 = union_sim_seeded(seed_t)
    print(f"seeded:   union visits/group internal {iv1.mean():.0f} "
          f"leaf {lv1.mean():.0f} total {(iv1 + lv1).mean():.0f} "
          f"({(iv1 + lv1).mean() / (iv0 + lv0).mean():.2f}x)", flush=True)


if __name__ == "__main__":
    main()
