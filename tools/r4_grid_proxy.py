"""Grid/DDA traversal proxy (CPU): the non-DFS algorithm class (VERDICT r3 #3).

The BVH kernel's wall is ~394 cyc of pop->push serial latency per
iteration (tools/v3_kernel_lab.py); a uniform-grid 3-D DDA has NO stack —
the next cell is three compares + adds of per-lane state — so its steps
could pipeline. But on TPU the per-CELL fetch (triangle list) is still a
per-ROW dynamic read, so a row of 256 lanes marches cells row-
synchronously: per iteration the row picks one cell (min linear id over
unfinished lanes), fetches its triangle chunk, lanes currently in that
cell test and advance. This lab measures the COUNT side of that design
on the bench atrium with the production wavefronts:

  - per-LANE ideal DDA steps (what a per-lane-divergent machine would pay),
  - per-ROW union iterations of the row-synchronous scheme (what the
    Mosaic kernel would actually execute), including extra iterations for
    cells holding more than CHUNK triangles,
  - the BVH union visits on the SAME ray groups (tools/r3_union_proxy.py
    union_sim, production 3-axis SAH tree),

and prints the BREAK-EVEN cycles/iteration the grid kernel would need to
match the BVH kernel (394 x bvh_iters / grid_iters). If that break-even is
below the ~70-cyc VPU slab/M-T floor, the class is dead on count alone and
the TPU microbench (tools/r4_grid_lab.py) is confirmation, not decision.

Reference analog: the fixed-function traversal this program competes with
(/root/reference/shaders/simple.rgen:92-104).

Run: JAX_PLATFORMS=cpu python -u tools/r4_grid_proxy.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.r3_sah_cpu_proxy import (  # noqa: E402
    primary_rays,
    quad_sim,
    world_tris,
)
from tools.r3_union_proxy import sort_key, union_sim  # noqa: E402

GROUP = 256
N_GROUPS = 12
SEED = 7
CHUNK = 16          # triangles fetched per row iteration (= production leaf)
BVH_CYC = 394.0     # measured serial latency per BVH iteration
T_MAX = 1e4
EPS = 1e-6


def build_grid(v0, e1, e2, n, smin, smax):
    """Bin triangle AABBs into an n=(nx,ny,nz) uniform grid (conservative
    AABB overlap, the standard duplication scheme). Returns
    (cell_start, cell_count, tri_ids, dup_factor)."""
    nx, ny, nz = n
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    ext = np.maximum(smax - smin, 1e-6)
    dims = np.asarray([nx, ny, nz], np.float64)
    ilo = np.clip(((lo - smin) / ext * dims).astype(np.int64), 0,
                  (dims - 1).astype(np.int64))
    ihi = np.clip(((hi - smin) / ext * dims).astype(np.int64), 0,
                  (dims - 1).astype(np.int64))
    span = ihi - ilo + 1
    cnt = span.prod(1)
    total = int(cnt.sum())
    tri_idx = np.repeat(np.arange(len(v0)), cnt)
    cum = np.concatenate([[0], np.cumsum(cnt)])
    local = np.arange(total) - np.repeat(cum[:-1], cnt)
    sp = span[tri_idx]
    lz = local % sp[:, 2]
    ly = (local // sp[:, 2]) % sp[:, 1]
    lx = local // (sp[:, 2] * sp[:, 1])
    cx = ilo[tri_idx, 0] + lx
    cy = ilo[tri_idx, 1] + ly
    cz = ilo[tri_idx, 2] + lz
    cid = (cx * ny + cy) * nz + cz
    order = np.argsort(cid, kind="stable")
    cid_s = cid[order]
    tri_s = tri_idx[order]
    n_cells = nx * ny * nz
    cell_count = np.bincount(cid_s, minlength=n_cells)
    cell_start = np.concatenate([[0], np.cumsum(cell_count)[:-1]])
    return cell_start, cell_count, tri_s, total / max(len(v0), 1)


def dda_state(o, d, smin, smax, n):
    """Amanatides-Woo setup for a batch of rays. Returns per-ray dict of
    arrays: cell (3,), t_next (3,), t_delta (3,), step (3,), t (scalar entry
    t), active."""
    nx, ny, nz = n
    dims = np.asarray([nx, ny, nz], np.float64)
    ext = np.maximum(smax - smin, 1e-6)
    cell_w = ext / dims
    d_safe = np.where(np.abs(d) < 1e-12, 1e-12, d)
    inv = 1.0 / d_safe
    # Clip to grid AABB.
    t0 = (smin[None] - o) * inv
    t1 = (smax[None] - o) * inv
    tn = np.minimum(t0, t1).max(1)
    tf = np.maximum(t0, t1).min(1)
    t_enter = np.maximum(tn, 1e-3)
    active = tf >= t_enter
    p = o + d * (t_enter[:, None] + EPS)
    cell = np.clip(((p - smin) / cell_w).astype(np.int64), 0,
                   (dims - 1).astype(np.int64))
    step = np.where(d >= 0, 1, -1).astype(np.int64)
    nxt = cell + (step > 0)
    bound = smin[None] + nxt * cell_w
    t_next = (bound - o) * inv
    t_delta = np.abs(cell_w[None] / d_safe)
    return {
        "cell": cell, "t_next": t_next, "t_delta": t_delta, "step": step,
        "t": t_enter, "active": active, "dims": dims.astype(np.int64),
    }


def lane_steps(st, cell_count, grid_n, limit=100_000):
    """Per-LANE ideal DDA step counts (free per-lane fetches): march every
    lane to grid exit counting (a) all cells stepped, (b) non-empty cells.
    Hits are not simulated here — this is the upper bound a perfect
    occupancy test would face; the union sim below handles termination."""
    nx, ny, nz = grid_n
    cell = st["cell"].copy()
    t_next = st["t_next"].copy()
    active = st["active"].copy()
    steps = np.zeros(len(cell), np.int64)
    nonempty = np.zeros(len(cell), np.int64)
    dims = st["dims"]
    for _ in range(limit):
        if not active.any():
            break
        cid = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]
        occ = cell_count[np.clip(cid, 0, len(cell_count) - 1)] > 0
        steps += active
        nonempty += active & occ
        ax = np.argmin(t_next, axis=1)
        rows = np.arange(len(cell))
        cell[rows, ax] += st["step"][rows, ax]
        t_next[rows, ax] += st["t_delta"][rows, ax]
        oob = (cell < 0).any(1) | (cell >= dims[None]).any(1)
        active &= ~oob
    return steps, nonempty


def union_dda_sim(st, cell_start, cell_count, tri_s, v0, e1, e2, o, d,
                  grid_n, limit=2_000_000):
    """Row-synchronous union DDA for one GROUP of rays: per iteration the
    row fetches ONE cell chunk (min linear cell id over unfinished lanes);
    lanes in that cell test its triangles (in-cell hit => done, since cells
    arrive in increasing t along each lane's own march) and advance one DDA
    step after the cell's LAST chunk. Returns (iterations, tri_tests)."""
    nx, ny, nz = grid_n
    cell = st["cell"].copy()
    t_next = st["t_next"].copy()
    active = st["active"].copy()
    dims = st["dims"]
    rows = np.arange(len(cell))
    iters = 0
    tri_tests = 0
    while active.any():
        cid = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]
        key = np.where(active, cid, np.iinfo(np.int64).max)
        fetch = key.min()
        in_cell = active & (cid == fetch)
        cnt = int(cell_count[fetch])
        start = int(cell_start[fetch])
        n_chunks = max((cnt + CHUNK - 1) // CHUNK, 1)
        iters += n_chunks
        if cnt:
            # Lanes in the cell test all chunks; in-cell acceptance bound is
            # the lane's own cell-exit t.
            t_exit = t_next.min(1)
            ids = tri_s[start:start + cnt]
            a = v0[ids]
            E1 = e1[ids]
            E2 = e2[ids]
            ol = o[in_cell]
            dl = d[in_cell]
            tri_tests += cnt * int(in_cell.sum())
            p = np.cross(dl[:, None, :], E2[None, :, :])
            det = (E1[None] * p).sum(-1)
            ok = np.abs(det) > 1e-12
            invd = 1.0 / np.where(ok, det, 1.0)
            tv = ol[:, None, :] - a[None]
            u = (tv * p).sum(-1) * invd
            q = np.cross(tv, E1[None, :, :])
            vv = (dl[:, None, :] * q).sum(-1) * invd
            t = (E2[None] * q).sum(-1) * invd
            hit = (ok & (u >= 0) & (vv >= 0) & (u + vv <= 1)
                   & (t > 1e-3) & (t < T_MAX)
                   & (t <= t_exit[in_cell, None] + EPS))
            lane_hit = hit.any(1)
            done_ids = rows[in_cell][lane_hit]
            active[done_ids] = False
            in_cell = active & (cid == fetch)
        # Advance the (still unfinished) lanes that were in the cell.
        if in_cell.any():
            ax = np.argmin(t_next[in_cell], axis=1)
            r2 = rows[in_cell]
            cell[r2, ax] += st["step"][r2, ax]
            t_next[r2, ax] += st["t_delta"][r2, ax]
            oob = (cell[r2] < 0).any(1) | (cell[r2] >= dims[None]).any(1)
            active[r2[oob]] = False
        if iters > limit:
            raise RuntimeError("union DDA did not converge")
    return iters, tri_tests


def run_wavefront(label, o, d, grids, bvh_pack, v0, e1, e2, out):
    bvh, qnodes, qmeta, leaf = bvh_pack
    iv, lv = union_sim(qnodes, qmeta, v0, e1, e2, bvh, o, d, leaf)
    bvh_iters = float((iv + lv).mean())
    print(f"  BVH(3-axis SAH quad): union visits/group "
          f"{bvh_iters:.0f} (internal {iv.mean():.0f} leaf {lv.mean():.0f})",
          flush=True)
    out[label] = {"bvh_union_iters_per_group": round(bvh_iters, 1)}
    for gname, (grid_n, cell_start, cell_count, tri_s, dup) in grids.items():
        st_all = dda_state(o, d, out["smin"], out["smax"], grid_n)
        steps, nonempty = lane_steps(st_all, cell_count, grid_n)
        g_iters = []
        g_tests = []
        for g in range(len(o) // GROUP):
            sl = slice(g * GROUP, (g + 1) * GROUP)
            st = {k: (v[sl] if isinstance(v, np.ndarray) and
                      v.shape[:1] == (len(o),) else v)
                  for k, v in st_all.items()}
            it, tt = union_dda_sim(
                st, cell_start, cell_count, tri_s, v0, e1, e2,
                o[sl], d[sl], grid_n)
            g_iters.append(it)
            g_tests.append(tt)
        gi = float(np.mean(g_iters))
        breakeven = BVH_CYC * bvh_iters / gi
        print(f"  grid {gname}: union iters/group {gi:.0f} "
              f"(x{gi / bvh_iters:.2f} vs BVH), per-lane ideal steps "
              f"{steps.mean():.0f} (nonempty {nonempty.mean():.0f}), "
              f"tri tests/group {np.mean(g_tests):.0f}, "
              f"BREAK-EVEN {breakeven:.0f} cyc/iter", flush=True)
        out[label][gname] = {
            "union_iters_per_group": round(gi, 1),
            "ratio_vs_bvh": round(gi / bvh_iters, 2),
            "lane_ideal_steps": round(float(steps.mean()), 1),
            "lane_nonempty_steps": round(float(nonempty.mean()), 1),
            "tri_tests_per_group": round(float(np.mean(g_tests)), 0),
            "breakeven_cyc_per_iter": round(breakeven, 0),
        }


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

    t0 = time.perf_counter()
    bvh = build_bvh_numpy(v0, e1, e2, leaf_size=CHUNK)
    qnodes, qmeta, _, _ = collapse_bvh4(bvh)
    print(f"production tree: {time.perf_counter() - t0:.1f}s build", flush=True)
    bvh_pack = (bvh, qnodes, qmeta, CHUNK)

    grids = {}
    for lam in (1.0, 4.0):
        # Density heuristic: n_i proportional to extent, lam*T cells total.
        ext = smax - smin
        vol = float(np.prod(ext))
        k = (lam * len(v0) / vol) ** (1.0 / 3.0)
        n = tuple(int(max(2, round(e * k))) for e in ext)
        t0 = time.perf_counter()
        cs, cc, ts, dup = build_grid(v0, e1, e2, n, smin, smax)
        occ = float((cc > 0).mean())
        print(f"grid lam={lam}: {n} = {np.prod(n):,} cells, "
              f"dup x{dup:.2f}, occupancy {occ:.2f}, max cell "
              f"{cc.max()} tris, build {time.perf_counter() - t0:.1f}s",
              flush=True)
        grids[f"lam{lam:g}_{n[0]}x{n[1]}x{n[2]}"] = (n, cs, cc, ts, dup)

    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ipm = np.asarray(mats["inverse_proj"], np.float64)
    ivm = np.asarray(mats["inverse_view"], np.float64)
    rng = np.random.default_rng(SEED)
    nrays = GROUP * N_GROUPS
    base = rng.integers(0, WIDTH * HEIGHT - nrays)
    pix = np.arange(base, base + nrays)
    org0, dirs0 = primary_rays(ipm, ivm, WIDTH, HEIGHT,
                               pix % WIDTH, pix // WIDTH)

    out = {"smin": smin, "smax": smax}
    print("PRIMARY wavefront:", flush=True)
    run_wavefront("primary", org0, dirs0, grids, bvh_pack, v0, e1, e2, out)

    # Bounce wavefront: hits + random hemisphere dirs, production sort key.
    _, _, t_prim = quad_sim(qnodes, qmeta, v0, e1, e2, bvh,
                            org0, dirs0, CHUNK)
    hit = t_prim < 9e3
    hp = org0[hit] + dirs0[hit] * t_prim[hit][:, None] * 0.999
    k = min((len(hp) // GROUP) * GROUP, nrays)
    hp = hp[rng.permutation(len(hp))[:k]]
    z = rng.standard_normal((k, 3)).astype(np.float64)
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    o_sort = np.argsort(sort_key(hp, z, smin, smax), kind="stable")
    hp, z = hp[o_sort], z[o_sort]
    print(f"BOUNCE wavefront ({k} rays, production sort):", flush=True)
    run_wavefront("bounce", hp, z, grids, bvh_pack, v0, e1, e2, out)

    out.pop("smin")
    out.pop("smax")
    print(json.dumps({"grid_proxy": out}), flush=True)


if __name__ == "__main__":
    main()
