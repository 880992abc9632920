"""Tree-position sort keys: can the bounce-wavefront union shrink further?

The grid lab (tools/r4_grid_proxy.py) showed the kernel's whole cost
structure is the 256-ray row UNION of tree visits. The production sort
key approximates traversal locality through SPACE (origin Morton +
direction octant, tools/sort_lab.py swept those variants in round 2) —
but for bounce rays we know something strictly better: the TREE POSITION
the ray starts from (the packed index of the triangle it just left).
Packed indices are DFS-ordered, so numerically-near positions share deep
subtrees by construction; rays grouped by equal/near positions share
their origin-side traversal context exactly, where a Morton cell may
straddle subtree boundaries.

This proxy builds the production tree, traces a primary wavefront, forms
the bounce wavefront (hit points + cosine-ish hemisphere dirs), sorts it
with each key variant, and measures 256-ray union visits/group
(tools/r3_union_proxy.py union_sim):

  prod_oct3_m27    dead|octant<<27|morton27      (production)
  pos_major        packed-pos<<3 | octant        (tree-topology-major)
  pos_dir9         packed-pos<<9 | dirq(3)       (finer direction minor)
  oct3_pos         octant<<19 | packed-pos       (direction-major, tree minor)

A >=10% union cut on the bounce wavefront would be a headline lever
(bounce closest-hit is the measured bound, BASELINE.md); the key is a
pure lane permutation, so production adoption cannot change images.

Run: tools/pytest_cpu.sh-style env: env -u PALLAS_AXON_POOL_IPS \
     JAX_PLATFORMS=cpu python -u tools/r4_sortkey_proxy.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.r3_sah_cpu_proxy import primary_rays, world_tris  # noqa: E402
from tools.r3_union_proxy import _morton9, union_sim  # noqa: E402

GROUP = 256
N_GROUPS = 16
SEED = 11
LEAF = 16


def brute_hits(o, d, v0, e1, e2, chunk=2048, ray_block=4096):
    """Exact nearest-hit triangle ids (numpy, blocked over rays AND
    triangles to bound the [rays, tris, 3] temporaries to ~200 MB)."""
    n_all = len(o)
    tri_all = np.empty(n_all, np.int64)
    t_all = np.empty(n_all, np.float64)
    for rs in range(0, n_all, ray_block):
        tri_all[rs:rs + ray_block], t_all[rs:rs + ray_block] = \
            _brute_hits_block(o[rs:rs + ray_block], d[rs:rs + ray_block],
                              v0, e1, e2, chunk)
    return tri_all, t_all


def _brute_hits_block(o, d, v0, e1, e2, chunk):
    n = len(o)
    best_t = np.full(n, 1e9, np.float64)
    best_tri = np.full(n, -1, np.int64)
    for s in range(0, len(v0), chunk):
        a = v0[s:s + chunk]
        E1 = e1[s:s + chunk]
        E2 = e2[s:s + chunk]
        p = np.cross(d[:, None, :], E2[None])
        det = (E1[None] * p).sum(-1)
        ok = np.abs(det) > 1e-12
        inv = 1.0 / np.where(ok, det, 1.0)
        tv = o[:, None, :] - a[None]
        u = (tv * p).sum(-1) * inv
        q = np.cross(tv, E1[None])
        vv = (d[:, None, :] * q).sum(-1) * inv
        t = (E2[None] * q).sum(-1) * inv
        hit = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > 1e-3)
        t = np.where(hit, t, 1e9)
        j = t.argmin(1)
        tj = t[np.arange(n), j]
        better = tj < best_t
        best_t = np.where(better, tj, best_t)
        best_tri = np.where(better, s + j, best_tri)
    return best_tri, best_t


def dirq(d, bits):
    lv = (1 << bits) - 1
    qd = np.clip(((d * 0.5 + 0.5) * (lv + 1)).astype(np.int64), 0, lv)
    return qd[:, 0] | (qd[:, 1] << bits) | (qd[:, 2] << (2 * bits))


def main():
    from raytracer_tpu.accel.bvh import build_bvh_numpy, collapse_bvh4
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium

    W, H = 1920, 1080
    scene = create_benchmark_atrium(300_000)
    v0, e1, e2 = world_tris(scene)
    smin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2).min(0)
    smax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2).max(0)
    t0 = time.perf_counter()
    bvh = build_bvh_numpy(v0, e1, e2, leaf_size=LEAF)
    qnodes, qmeta, _, _ = collapse_bvh4(bvh)
    # tri id -> packed (DFS) position in the baked layout.
    pos_of_tri = np.empty(len(v0), np.int64)
    pos_of_tri[bvh.tri_order] = np.arange(len(v0))
    print(f"tree built in {time.perf_counter() - t0:.1f}s", flush=True)

    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=W / H,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    rng = np.random.default_rng(SEED)
    n = GROUP * N_GROUPS * 4  # oversample; keep the hits
    base = rng.integers(0, W * H - n)
    pix = np.arange(base, base + n)
    o0, d0 = primary_rays(np.asarray(mats["inverse_proj"], np.float64),
                          np.asarray(mats["inverse_view"], np.float64),
                          W, H, pix % W, pix // W)
    t0 = time.perf_counter()
    tri, t_hit = brute_hits(o0, d0, v0, e1, e2)
    print(f"primary brute hits in {time.perf_counter() - t0:.1f}s, "
          f"{(tri >= 0).mean():.2f} hit rate", flush=True)

    hit = tri >= 0
    hp = o0[hit] + d0[hit] * t_hit[hit][:, None] * 0.999
    htri = tri[hit]
    k = GROUP * N_GROUPS
    sel = rng.permutation(len(hp))[:k]
    hp, htri = hp[sel], htri[sel]
    z = rng.standard_normal((k, 3))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)

    ext = np.maximum(smax - smin, 1e-6)
    qp = np.clip((hp - smin) / ext * 511.0, 0.0, 511.0).astype(np.uint64)
    m27 = (_morton9(qp[:, 0]) | (_morton9(qp[:, 1]) << 1)
           | (_morton9(qp[:, 2]) << 2)).astype(np.int64)
    octant = ((z[:, 0] >= 0).astype(np.int64)
              | ((z[:, 1] >= 0).astype(np.int64) << 1)
              | ((z[:, 2] >= 0).astype(np.int64) << 2))
    pos = pos_of_tri[htri]

    keys = {
        "prod_oct3_m27": (octant << 27) | m27,
        "pos_major": (pos << 3) | octant,
        "pos_dir9": (pos << 9) | dirq(z, 3),
        "oct3_pos": (octant << 19) | pos,
    }
    out = {}
    for name, key in keys.items():
        order = np.argsort(key, kind="stable")
        iv, lv = union_sim(qnodes, qmeta, v0, e1, e2, bvh,
                           hp[order], z[order], LEAF)
        tot = float((iv + lv).mean())
        out[name] = {"internal": round(float(iv.mean()), 1),
                     "leaf": round(float(lv.mean()), 1),
                     "total": round(tot, 1)}
        print(f"{name:16s}: union visits/group {tot:7.1f} "
              f"(internal {iv.mean():.0f} leaf {lv.mean():.0f})", flush=True)
    base_v = out["prod_oct3_m27"]["total"]
    for name in keys:
        out[name]["vs_prod"] = round(out[name]["total"] / base_v, 3)
    print(json.dumps({"sortkey_proxy_bounce": out}), flush=True)


if __name__ == "__main__":
    main()
