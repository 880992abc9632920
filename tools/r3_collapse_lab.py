"""Quad-collapse strategy lab (CPU, visit-count proxy — no TPU needed).

The production collapse_bvh4 takes each binary node's GRANDCHILDREN as the
4 quad children — a fixed depth-2 cut. That wastes slots whenever the two
binary subtrees are unbalanced: a leaf child burns one slot while the
other subtree could have contributed three grandchildren. An SAH-aware
collapse instead grows the child set as a frontier, always expanding the
largest-surface-area internal node until 4 slots are filled — putting the
quad cut where the geometry is, not at a fixed depth.

Cost model: traversal cost = visit count x ~394 cyc serial latency
(ARCHITECTURE.md), so mean per-ray quad visits is the proxy, measured with
tools/r3_sah_cpu_proxy.quad_sim on a primary + diffuse-bounce ray sample
of the 300k bench scene. Hit results must be identical (same tree, same
leaves — only the internal cut changes).

Run: JAX_PLATFORMS=cpu python -u tools/r3_collapse_lab.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.r3_sah_cpu_proxy import (  # noqa: E402
    primary_rays,
    quad_sim,
    world_tris,
)

LEAF = 16
N_PRIMARY = 4096
N_BOUNCE = 4096
SEED = 7


def collapse_bvh4_greedy(bvh):
    """Area-greedy binary->4-wide collapse: each quad's children are the
    frontier obtained by repeatedly expanding the largest-area internal
    frontier node (starting from the binary node's two children) until 4
    slots are used or the frontier is all leaves. Same output contract as
    accel.bvh.collapse_bvh4 (qnodes f32[N4,32], qmeta i32[4*N4], qroot,
    stack_need)."""
    is_leaf = bvh.nodes_count > 0
    skip = bvh.nodes_skip

    def area(i):
        d = np.maximum(bvh.nodes_max[i] - bvh.nodes_min[i], 0.0)
        return float(2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0]))

    if is_leaf[0]:
        qnodes = np.full((1, 32), np.nan, np.float32)
        qnodes[:, 28:32] = 0.0
        qmeta = np.zeros((4,), np.int32)
        return qnodes, qmeta, np.asarray([~0], np.int32), 4

    leaf_ids = (np.cumsum(is_leaf) - 1).astype(np.int64)

    quad_of = {}
    order = []
    children_of = {}
    depth4 = {0: 0}
    max_d4 = 0
    stack = [0]
    while stack:
        x = stack.pop()
        quad_of[x] = len(order)
        order.append(x)
        left = x + 1
        right = int(skip[left])
        frontier = [left, right]
        while len(frontier) < 4:
            cands = [n for n in frontier if not is_leaf[n]]
            if not cands:
                break
            pick = max(cands, key=area)
            j = frontier.index(pick)
            pl = pick + 1
            pr = int(skip[pl])
            frontier[j : j + 1] = [pl, pr]
        kids = []
        for n in frontier:
            if is_leaf[n]:
                kids.append(("leaf", int(leaf_ids[n]), n))
            else:
                kids.append(("quad", None, n))
        children_of[x] = kids
        for kind, _, node in reversed(kids):
            if kind == "quad":
                depth4[node] = depth4[x] + 1
                max_d4 = max(max_d4, depth4[node])
                stack.append(node)

    n4 = len(order)
    assert n4 < (1 << 24)
    qnodes = np.full((n4, 32), np.nan, np.float32)
    qnodes[:, 28:32] = 0.0
    qmeta = np.zeros((4 * n4,), np.int32)
    for x in order:
        qid = quad_of[x]
        row = qnodes[qid]
        for c, (kind, lid, node) in enumerate(children_of[x]):
            row[6 * c + 0 : 6 * c + 3] = bvh.nodes_min[node]
            row[6 * c + 3 : 6 * c + 6] = bvh.nodes_max[node]
            meta = ~lid if kind == "leaf" else quad_of[node]
            row[24 + c] = np.float32(meta)
            qmeta[4 * qid + c] = meta
    return qnodes, qmeta, np.asarray([0], np.int32), 3 * (max_d4 + 1) + 1


def main():
    from raytracer_tpu.accel.bvh import build_bvh_numpy, collapse_bvh4
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium

    WIDTH, HEIGHT = 1920, 1080
    scene = create_benchmark_atrium(300_000)
    v0, e1, e2 = world_tris(scene)
    print(f"{len(v0)} world tris", flush=True)

    t0 = time.perf_counter()
    bvh = build_bvh_numpy(v0, e1, e2, leaf_size=LEAF)
    print(f"binary build {time.perf_counter() - t0:.1f}s, "
          f"{bvh.num_nodes} nodes", flush=True)

    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ivm = np.asarray(mats["inverse_view"], np.float64)
    ipm = np.asarray(mats["inverse_proj"], np.float64)

    rng = np.random.default_rng(SEED)
    px = rng.integers(0, WIDTH, N_PRIMARY)
    py = rng.integers(0, HEIGHT, N_PRIMARY)
    org0, dirs0 = primary_rays(ipm, ivm, WIDTH, HEIGHT, px, py)

    variants = [
        ("grandchild (production)", collapse_bvh4),
        ("greedy-area", collapse_bvh4_greedy),
    ]

    results = {}
    for label, collapse in variants:
        t0 = time.perf_counter()
        qnodes, qmeta, qroot, need = collapse(bvh)
        c_s = time.perf_counter() - t0
        iv, lvv, best_t = quad_sim(qnodes, qmeta, v0, e1, e2, bvh,
                                   org0, dirs0, LEAF)
        results[label] = (qnodes, qmeta, best_t)
        used = (np.abs(qnodes[:, :24].reshape(-1, 4, 6))
                < np.inf).all(-1).sum(-1)
        print(f"{label}: quads {len(qnodes)}, stack_need {need}, "
              f"collapse {c_s:.1f}s, mean-children {used.mean():.2f} | "
              f"primary visits/ray: internal {iv.mean():.1f} "
              f"leaf {lvv.mean():.1f} total {(iv + lvv).mean():.1f}",
              flush=True)

    # Hit results must be identical across collapses (same binary tree).
    t_ref = results[variants[0][0]][2]
    for label, (_, _, t) in results.items():
        same = np.array_equal(t, t_ref)
        print(f"{label}: best_t identical to production = {same}", flush=True)

    # Diffuse bounce sample off production-tree primary hits.
    hit = t_ref < 9e3
    hp = org0[hit] + dirs0[hit] * t_ref[hit][:, None] * 0.999
    k = min(N_BOUNCE, len(hp))
    sel = rng.permutation(len(hp))[:k]
    hp = hp[sel]
    z = rng.standard_normal((k, 3)).astype(np.float32)
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    print(f"bounce sample: {k} rays", flush=True)
    for label, (qnodes, qmeta, _) in results.items():
        iv, lvv, _ = quad_sim(qnodes, qmeta, v0, e1, e2, bvh, hp, z, LEAF)
        print(f"{label}: bounce visits/ray: internal {iv.mean():.1f} "
              f"leaf {lvv.mean():.1f} total {(iv + lvv).mean():.1f}",
              flush=True)


if __name__ == "__main__":
    main()
