"""Round-3 closest-hit kernel experiments, measured on the real bounce-1
wavefront (300k-tri atrium, 1080p, sorted), hit-checked against production.

Variants (combinable flags):
  --descent   register-descent: the nearest hit child stays in the while-loop
              carry instead of round-tripping through the SMEM stack. The
              production kernel pushes near LAST then pops it FIRST next
              iteration — that SMEM write->read sits on the critical path of
              EVERY internal iteration (the ~394-cyc serial chain,
              tools/v3_kernel_lab.py). With a carry register the chain is
              read -> slab -> reduce -> extract -> qmeta -> next read; far
              pushes leave the critical path.
  --divfree   division-free Moller-Trumbore: per-triangle accept tests run in
              det-scaled space (u',v',t' multiplied by sign(det); compares
              cross-multiplied), best-t carried as (num, den) inside the leaf
              step, ONE divide per leaf step instead of one reciprocal per
              triangle. Ends ULP-close to the production math (mismatches
              only when two triangles tie within rounding).
Run: tools/tpu_run.sh "tools/r3_kernel_lab.py [--descent] [--divfree]" —
or --all to sweep all four combinations in one process.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from raytracer_tpu.ops.pallas_subpacket import (  # noqa: E402
    CAP, DRAIN_AT, LANES, LQ, ROWS, TRI_STRIDE,
    _FULL, _SMEM1, _SP_SPEC, _pack_code7, _pop_leaves, _pop_rows,
    _read_leaf_rows, _read_quad_rows, _rowmask_f, _slab_rows,
)
from raytracer_tpu.ops.pallas_traverse import _inv_dir  # noqa: E402

BIG = float(np.float32(3.0e38))
WIDTH, HEIGHT = 1920, 1080
REPS = 3


def _leaf_step_divfree(leaf_size, ptris_ref, t_ref, tri_ref, u_ref, v_ref,
                       lq_ref, ox, oy, oz, dx, dy, dz, t_min, sps, lqns):
    """Division-free leaf drain: scaled-space accepts, one divide at the end.
    Untouched lanes keep (num, den) = (old_t, 1) so the final num*(1/den)
    reproduces them bit-exactly."""
    blks, valids, new_lqns = _pop_leaves(lq_ref, lqns)
    rows8 = _read_leaf_rows(ptris_ref, blks)
    rowmask = _rowmask_f(valids) > 0.0
    num = t_ref[0]
    den = jnp.ones_like(num)
    btri = tri_ref[0]
    bu = u_ref[0]
    bv = v_ref[0]
    for k in range(leaf_size):
        c = lambda i, k=k: rows8[:, k * TRI_STRIDE + i: k * TRI_STRIDE + i + 1]
        v0x, v0y, v0z = c(0), c(1), c(2)
        e1x, e1y, e1z = c(3), c(4), c(5)
        e2x, e2y, e2z = c(6), c(7), c(8)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        a = det * s
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        up = (tx * px + ty * py + tz * pz) * s
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vp = (dx * qx + dy * qy + dz * qz) * s
        tp = (e2x * qx + e2y * qy + e2z * qz) * s
        valid = (
            (a > 1e-10)
            & (up >= 0.0) & (vp >= 0.0) & (up + vp <= a)
            & (tp > t_min * a) & (tp * den < num * a)
            & rowmask
        )
        trik = c(9).astype(jnp.int32)
        num = jnp.where(valid, tp, num)
        den = jnp.where(valid, a, den)
        btri = jnp.where(valid, jnp.broadcast_to(trik, num.shape), btri)
        bu = jnp.where(valid, up, bu)
        bv = jnp.where(valid, vp, bv)
    inv = 1.0 / den
    t_ref[0] = num * inv
    tri_ref[0] = btri
    # bu/bv are det-scaled for lanes updated THIS step and already-real for
    # untouched lanes (den=1 there) — one scale restores both.
    u_ref[0] = bu * inv
    v_ref[0] = bv * inv
    return sps, tuple(new_lqns)


def _leaf_step_leafpar(leaf_size, ptris_ref, t_ref, tri_ref, u_ref, v_ref,
                       lq_ref, ox, oy, oz, dx, dy, dz, t_min, sps, lqns):
    """ILP leaf drain: the production loop serializes the 8 triangles
    through the running best-t (tri k+1's accept depends on k's update —
    measured ~140 cyc/tri against ~58 ops of math). Here all 8 test against
    the step-ENTRY best-t independently, then a 3-level min-tree picks the
    winner (strict < keeps earliest-index tie-breaking — the same winner the
    serial chain produces: minimal t, first k among equals)."""
    from raytracer_tpu.ops.pallas_subpacket import _moller_rows

    blks, valids, new_lqns = _pop_leaves(lq_ref, lqns)
    rows8 = _read_leaf_rows(ptris_ref, blks)
    rowmask = _rowmask_f(valids) > 0.0
    bt0 = t_ref[0]
    cands = []
    for k in range(leaf_size):
        t, u, v, valid, c = _moller_rows(
            rows8, k, ox, oy, oz, dx, dy, dz, t_min, bt0
        )
        valid = valid & rowmask
        tk = jnp.where(valid, t, BIG)
        cands.append((tk, c(9), u, v))
    # Min-tree (earlier candidate wins ties via strict <).
    while len(cands) > 1:
        nxt = []
        for i in range(0, len(cands), 2):
            a, b = cands[i], cands[i + 1]
            tb = b[0] < a[0]
            nxt.append(tuple(jnp.where(tb, bb, aa)
                             for aa, bb in zip(a, b)))
        cands = nxt
    tw, triw, uw, vw = cands[0]
    win = tw < bt0
    t_ref[0] = jnp.where(win, tw, bt0)
    tri_ref[0] = jnp.where(win, triw.astype(jnp.int32),
                           tri_ref[0])
    u_ref[0] = jnp.where(win, uw, u_ref[0])
    v_ref[0] = jnp.where(win, vw, v_ref[0])
    return sps, tuple(new_lqns)


def _leaf_step_base(leaf_size, ptris_ref, t_ref, tri_ref, u_ref, v_ref,
                    lq_ref, ox, oy, oz, dx, dy, dz, t_min, sps, lqns):
    from raytracer_tpu.ops.pallas_subpacket import _moller_rows

    blks, valids, new_lqns = _pop_leaves(lq_ref, lqns)
    rows8 = _read_leaf_rows(ptris_ref, blks)
    rowmask = _rowmask_f(valids) > 0.0
    bt = t_ref[0]
    btri = tri_ref[0]
    bu = u_ref[0]
    bv = v_ref[0]
    for k in range(leaf_size):
        t, u, v, valid, c = _moller_rows(
            rows8, k, ox, oy, oz, dx, dy, dz, t_min, bt
        )
        valid = valid & rowmask
        trik = c(9).astype(jnp.int32)
        bt = jnp.where(valid, t, bt)
        btri = jnp.where(valid, jnp.broadcast_to(trik, bt.shape), btri)
        bu = jnp.where(valid, u, bu)
        bv = jnp.where(valid, v, bv)
    t_ref[0] = bt
    tri_ref[0] = btri
    u_ref[0] = bu
    v_ref[0] = bv
    return sps, tuple(new_lqns)


def make_closest_kernel(leaf_size, descent, divfree, leafpar=False):
    leaf_fn = (_leaf_step_leafpar if leafpar else
               _leaf_step_divfree if divfree else _leaf_step_base)

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmax_ref, root_ref, pmeta_ref, pnodes_ref, ptris_ref,
               t_ref, tri_ref, u_ref, v_ref, stack_ref, lq_ref):
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
        t_min = 1e-3

        t_ref[0] = tmax_ref[0]
        tri_ref[0] = jnp.full((ROWS, LANES), -1, jnp.int32)
        u_ref[0] = jnp.zeros((ROWS, LANES), jnp.float32)
        v_ref[0] = jnp.zeros((ROWS, LANES), jnp.float32)

        root = root_ref[0]
        for r in range(ROWS):
            stack_ref[r * CAP] = root
            lq_ref[r * LQ] = ~root
        if descent:
            cur0 = jnp.where(root >= 0, root, -1)
            sp0 = jnp.int32(0)
        else:
            cur0 = jnp.int32(-1)
            sp0 = (root >= 0).astype(jnp.int32)
        ln0 = (root < 0).astype(jnp.int32)

        def leaf_step(curs, sps, lqns):
            nsps, nlqns = leaf_fn(
                leaf_size, ptris_ref, t_ref, tri_ref, u_ref, v_ref, lq_ref,
                ox, oy, oz, dx, dy, dz, t_min, sps, lqns,
            )
            return curs, nsps, nlqns

        def internal_step(curs, sps, lqns):
            if descent:
                nodes = []
                valids = []
                new_sps = []
                for r in range(ROWS):
                    has_cur = curs[r] >= 0
                    sp = sps[r]
                    pop = (~has_cur) & (sp > 0)
                    meta = stack_ref[r * CAP + jnp.maximum(sp - 1, 0)]
                    nodes.append(jnp.where(has_cur, curs[r],
                                           jnp.where(pop, meta, 0)))
                    valids.append(has_cur | pop)
                    new_sps.append(sp - pop.astype(jnp.int32))
            else:
                nodes, valids, new_sps = _pop_rows(stack_ref, sps)
            rows8 = _read_quad_rows(pnodes_ref, nodes)
            t_cap = t_ref[0] * _rowmask_f(valids)
            col = lambda i: rows8[:, i: i + 1]
            tns = []
            for c in range(4):
                h, tn = _slab_rows(
                    ox, oy, oz, ix, iy, iz,
                    (col(6 * c), col(6 * c + 1), col(6 * c + 2)),
                    (col(6 * c + 3), col(6 * c + 4), col(6 * c + 5)),
                    t_min, t_cap,
                )
                tns.append(jnp.min(jnp.where(h, tn, BIG), axis=1,
                                   keepdims=True))
            any_h = [tn < BIG for tn in tns]
            b0 = (tns[1] < tns[0]).astype(jnp.int32)
            b1 = (tns[3] < tns[2]).astype(jnp.int32)
            use_hi = jnp.minimum(tns[2], tns[3]) < jnp.minimum(tns[0], tns[1])
            near = jnp.where(use_hi, 2 + b1, b0)
            code = (
                any_h[0].astype(jnp.int32)
                + 2 * any_h[1].astype(jnp.int32)
                + 4 * any_h[2].astype(jnp.int32)
                + 8 * any_h[3].astype(jnp.int32)
                + 16 * near
            )
            code_lo, code_hi = _pack_code7(code)

            out_curs = []
            out_sps = []
            out_lqns = []
            for r in range(ROWS):
                cr = ((code_lo if r < 4 else code_hi) >> (7 * (r % 4))) & 127
                n = nodes[r]
                sp = new_sps[r]
                ln = lqns[r]
                p_near = jnp.int32(0)
                meta_near = jnp.int32(0)
                for c in range(4):
                    hit_c = (cr >> c) & 1
                    is_near = ((cr >> 4) & 7) == c
                    p = hit_c * (1 - is_near.astype(jnp.int32))
                    meta = pmeta_ref[4 * n + c]
                    is_leaf = (meta < 0).astype(jnp.int32)
                    stack_ref[r * CAP + jnp.minimum(sp, CAP - 1)] = meta
                    lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~meta
                    sp = sp + p * (1 - is_leaf)
                    ln = ln + p * is_leaf
                    p_near = p_near + hit_c * is_near.astype(jnp.int32)
                    meta_near = jnp.where(is_near, meta, meta_near)
                is_leaf_n = (meta_near < 0).astype(jnp.int32)
                if descent:
                    # Near leaf -> queue; near internal -> carry register.
                    lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~meta_near
                    ln = ln + p_near * is_leaf_n
                    out_curs.append(jnp.where(
                        (p_near > 0) & (is_leaf_n == 0), meta_near, -1
                    ))
                else:
                    stack_ref[r * CAP + jnp.minimum(sp, CAP - 1)] = meta_near
                    lq_ref[r * LQ + jnp.minimum(ln, LQ - 1)] = ~meta_near
                    sp = sp + p_near * (1 - is_leaf_n)
                    ln = ln + p_near * is_leaf_n
                    out_curs.append(curs[r])
                out_sps.append(sp)
                out_lqns.append(ln)
            return tuple(out_curs), tuple(out_sps), tuple(out_lqns)

        def body(carry):
            curs = carry[:ROWS]
            sps = carry[ROWS:2 * ROWS]
            lqns = carry[2 * ROWS:]
            do_leaf = jnp.zeros((), bool)
            for r in range(ROWS):
                do_leaf |= lqns[r] >= DRAIN_AT
                do_leaf |= (curs[r] < 0) & (sps[r] == 0) & (lqns[r] > 0)
            curs, sps, lqns = jax.lax.cond(
                do_leaf, leaf_step, internal_step, curs, sps, lqns
            )
            return curs + sps + lqns

        def cond(carry):
            alive = jnp.zeros((), bool)
            for r in range(ROWS):
                alive |= carry[r] >= 0
            for v in carry[ROWS:]:
                alive |= v > 0
            return alive

        jax.lax.while_loop(
            cond, body,
            tuple([cur0] * ROWS) + tuple([sp0] * ROWS) + tuple([ln0] * ROWS),
        )

    return kernel


def run_closest_variant(ox, oy, oz, dx, dy, dz, tmax, root, pmeta, pnodes,
                        ptris, descent, divfree, leafpar=False,
                        interpret=False):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, ROWS, LANES), jnp.float32),
    ]
    return pl.pallas_call(
        make_closest_kernel(leaf_size, descent, divfree, leafpar),
        grid=(n_tiles,),
        in_specs=[_SP_SPEC] * 7 + [_SMEM1, _SMEM1, _FULL, _FULL],
        out_specs=[_SP_SPEC] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((ROWS * CAP,), jnp.int32),
            pltpu.SMEM((ROWS * LQ,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tmax, root, pmeta, pnodes, ptris)


def measure(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out[0]))
    return out, (time.perf_counter() - t0) / REPS


def cpu_check(descent, divfree, leafpar=False):
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    from raytracer_tpu.ops.traverse import intersect_bvh
    from tests.conftest import make_traversal_scene

    rng = np.random.default_rng(11)
    t, r = 300, 512
    v0 = rng.uniform(-4, 4, (t, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    scene = make_traversal_scene(v0, e1, e2, leaf_size=8)
    o = rng.uniform(-5, 5, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = intersect_bvh(jnp.asarray(o), jnp.asarray(d), scene, 1e-3, 1e4)

    tile = ROWS * LANES
    nt = (r + tile - 1) // tile
    total = nt * tile
    comps = []
    for arr in (o, d):
        for ci in range(3):
            a = np.concatenate([arr[:, ci], np.zeros(total - r, np.float32)])
            comps.append(jnp.asarray(a.reshape(nt, ROWS, LANES)))
    tm = np.concatenate([np.full(r, 1e4, np.float32),
                         np.full(total - r, 1e-3, np.float32)])
    comps.append(jnp.asarray(tm.reshape(nt, ROWS, LANES)))
    out = run_closest_variant(
        *comps, scene.qroot, scene.qmeta, scene.qnodes, scene.ptris,
        descent, divfree, leafpar, interpret=True,
    )
    tri = np.asarray(out[1]).reshape(-1)[:r]
    tv = np.asarray(out[0]).reshape(-1)[:r]
    hits = np.asarray(ref.hit)
    mism_hit = int((hits != (tri >= 0)).sum())
    mism_tri = int((np.asarray(ref.tri)[hits] != tri[hits]).sum())
    terr = (float(np.abs(np.asarray(ref.t)[hits] - tv[hits]).max())
            if hits.any() else 0)
    print(f"cpu_check descent={descent} divfree={divfree} leafpar={leafpar}: "
          f"hit-mism {mism_hit}  tri-mism {mism_tri}  max|dt| {terr:.2e}",
          flush=True)
    return mism_hit == 0 and mism_tri == 0


def main():
    from tools.sort_lab import sl_make_state1
    from raytracer_tpu.integrator.wavefront import _sort_wavefront
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.ops.pallas_subpacket import intersect_bvh_subpacket
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from raytracer_tpu.utils.config import RenderConfig

    enable_persistent_cache()
    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    ds, bvh = bake_scene(scene, leaf_size=8)

    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    state1 = sl_make_state1(ds, ubo, cfg, n)
    state1s = jax.jit(lambda s, d: _sort_wavefront(s, d))(state1, ds)
    float(jnp.sum(state1s.origin))
    origin, direction, alive = (state1s.origin, state1s.direction,
                                state1s.alive)

    fn_p = jax.jit(lambda o, d, s, a: intersect_bvh_subpacket(
        o, d, s, 1e-3, 1e4, active_mask=a))
    rec, dt_p = measure(fn_p, origin, direction, ds, alive)
    print(f"production quad closest:   {dt_p*1e3:8.1f} ms", flush=True)

    tile = ROWS * LANES
    nt = (n + tile - 1) // tile
    total = nt * tile

    @jax.jit
    def prep(origin, direction, alive):
        tm = jnp.where(alive, 1e4, 1e-3)
        comps = []
        for arr in (origin, direction):
            for ci in range(3):
                a = arr[:, ci]
                if total != n:
                    a = jnp.concatenate([a, jnp.zeros(total - n, a.dtype)])
                comps.append(a.reshape(nt, ROWS, LANES))
        a = (jnp.concatenate([tm, jnp.full(total - n, 1e-3)])
             if total != n else tm)
        comps.append(a.reshape(nt, ROWS, LANES))
        return comps

    rays = prep(origin, direction, alive)
    float(jnp.sum(rays[0]))

    if "--all" in sys.argv:
        combos = [(False, False, False), (True, False, False),
                  (False, True, False), (True, True, False)]
    elif "--leafpar" in sys.argv:
        combos = [(False, False, False), (False, False, True)]
    else:
        combos = [("--descent" in sys.argv, "--divfree" in sys.argv, False)]
    for descent, divfree, leafpar in combos:
        fn = jax.jit(functools.partial(run_closest_variant, descent=descent,
                                       divfree=divfree, leafpar=leafpar))
        out, dt = measure(fn, *rays, ds.qroot, ds.qmeta, ds.qnodes, ds.ptris)
        tri = np.asarray(out[1]).reshape(-1)[:n]
        mism = int((tri != np.asarray(rec.tri)).sum())
        print(f"descent={int(descent)} divfree={int(divfree)} "
              f"leafpar={int(leafpar)}:  "
              f"{dt*1e3:8.1f} ms  ({dt_p/dt:.3f}x)  mism {mism}", flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        ok = True
        for de in (False, True):
            for df in (False, True):
                ok &= cpu_check(de, df)
        ok &= cpu_check(False, False, leafpar=True)
        sys.exit(0 if ok else 1)
    main()
