"""Kernel lab: instrumented/variant copies of the packet-traversal kernel.

Measures visit counts and per-visit cycle costs on the real TPU to attribute
the frame time before committing kernel changes. Variants under test:
  base      — verbatim copy of the production _closest_kernel + counters
  nored     — any() derived from the min-reductions (2 fewer reductions/visit)
  leafilp   — leaf loop without the serial best-t chain (t < bt0 then min-tree)

Run via tools/tpu_run.sh. Not part of the product; results land in
ARCHITECTURE.md + the production kernel.
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

from raytracer_tpu.ops.pallas_traverse import (  # noqa: E402
    BIG, STACK_CAP, TILE_L, TILE_S, TRI_STRIDE, TILE,
    _inv_dir, _slab, _moller_scalar_tri, _ray_tiles, _to_tiles, _tile_count,
    _RAY_SPEC, _FULL, _SMEM1,
)

WIDTH, HEIGHT = 1920, 1080
REPS = 3
FREQ_GHZ = 0.94  # v5e nominal


def _visit_internal_counted(pnodes_ref, stack_ref, sp, node_id,
                            ox, oy, oz, ix, iy, iz, t_min, t_cap, variant):
    row = pnodes_ref[pl.ds(node_id, 1), :]
    lmn = (row[0, 0], row[0, 1], row[0, 2])
    lmx = (row[0, 3], row[0, 4], row[0, 5])
    rmn = (row[0, 6], row[0, 7], row[0, 8])
    rmx = (row[0, 9], row[0, 10], row[0, 11])
    lmeta = row[0, 12].astype(jnp.int32)
    rmeta = row[0, 13].astype(jnp.int32)

    hit_l, tn_l = _slab(ox, oy, oz, ix, iy, iz, *lmn, *lmx, t_min, t_cap)
    hit_r, tn_r = _slab(ox, oy, oz, ix, iy, iz, *rmn, *rmx, t_min, t_cap)
    near_l = jnp.min(jnp.where(hit_l, tn_l, BIG))
    near_r = jnp.min(jnp.where(hit_r, tn_r, BIG))
    if variant == "base":
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
    else:  # nored / leafilp: derive hit-anything from the min reduction
        any_l = near_l < BIG
        any_r = near_r < BIG
    swap = near_r < near_l
    m_near = jnp.where(swap, rmeta, lmeta)
    m_far = jnp.where(swap, lmeta, rmeta)
    p_near = jnp.where(swap, any_r, any_l)
    p_far = jnp.where(swap, any_l, any_r)

    stack_ref[sp] = m_far
    sp = sp + p_far.astype(jnp.int32)
    stack_ref[sp] = m_near
    sp = sp + p_near.astype(jnp.int32)
    return sp


def _closest_kernel_multipop(leaf_size, npop,
                             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                             tmax_ref, root_ref, pnodes_ref, ptris_ref,
                             t_ref, tri_ref, u_ref, v_ref, nvisit_ref,
                             nleaf_ref, stack_ref):
    """Pop up to `npop` pending nodes per loop iteration; they are
    independent (same rays, different subtrees), so their scalar extracts,
    slab tests and reductions overlap and the loop overhead amortizes."""
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t_min = 1e-3

    t_ref[0] = tmax_ref[0]
    tri_ref[0] = jnp.full((TILE_S, TILE_L), -1, jnp.int32)
    u_ref[0] = jnp.zeros((TILE_S, TILE_L), jnp.float32)
    v_ref[0] = jnp.zeros((TILE_S, TILE_L), jnp.float32)

    def leaf_fn(block):
        bt = t_ref[0]
        btri = tri_ref[0]
        bu = u_ref[0]
        bv = v_ref[0]
        for k in range(leaf_size):
            tv = [ptris_ref[block, k * TRI_STRIDE + c] for c in range(9)]
            t, u, v, valid = _moller_scalar_tri(
                tv, ox, oy, oz, dx, dy, dz, t_min, bt
            )
            tri_k = ptris_ref[block, k * TRI_STRIDE + 9].astype(jnp.int32)
            bt = jnp.where(valid, t, bt)
            btri = jnp.where(valid, tri_k, btri)
            bu = jnp.where(valid, u, bu)
            bv = jnp.where(valid, v, bv)
        t_ref[0] = bt
        tri_ref[0] = btri
        u_ref[0] = bu
        v_ref[0] = bv

    stack_ref[0] = root_ref[0]

    def visit_one(sp, meta):
        def on_leaf(sp):
            leaf_fn(~meta)
            return sp

        def on_internal(sp):
            t_cap = t_ref[0]
            return _visit_internal_counted(
                pnodes_ref, stack_ref, sp, meta,
                ox, oy, oz, ix, iy, iz, t_min, t_cap, "nored",
            )

        return jax.lax.cond(meta < 0, on_leaf, on_internal, sp)

    def body(carry):
        sp, nv, nl = carry
        k = jnp.minimum(sp, npop)
        metas = [stack_ref[jnp.maximum(sp - 1 - j, 0)] for j in range(npop)]
        sp = sp - k
        nv = nv + k
        for j in range(npop):
            live = j < k
            nl = nl + jnp.where(live & (metas[j] < 0), 1, 0)
            sp = jax.lax.cond(
                live, lambda s: visit_one(s, metas[j]), lambda s: s, sp
            )
        return sp, nv, nl

    _, nv, nl = jax.lax.while_loop(
        lambda c: c[0] > 0, body, (1, jnp.int32(0), jnp.int32(0))
    )
    nvisit_ref[0] = jnp.full((8, TILE_L), nv, jnp.int32)
    nleaf_ref[0] = jnp.full((8, TILE_L), nl, jnp.int32)


def _closest_kernel_lab(leaf_size, variant,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tmax_ref, root_ref, pnodes_ref, ptris_ref,
                        t_ref, tri_ref, u_ref, v_ref, nvisit_ref, nleaf_ref,
                        stack_ref):
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t_min = 1e-3

    t_ref[0] = tmax_ref[0]
    tri_ref[0] = jnp.full((TILE_S, TILE_L), -1, jnp.int32)
    u_ref[0] = jnp.zeros((TILE_S, TILE_L), jnp.float32)
    v_ref[0] = jnp.zeros((TILE_S, TILE_L), jnp.float32)

    def leaf_fn_serial(block):
        bt = t_ref[0]
        btri = tri_ref[0]
        bu = u_ref[0]
        bv = v_ref[0]
        for k in range(leaf_size):
            tv = [ptris_ref[block, k * TRI_STRIDE + c] for c in range(9)]
            t, u, v, valid = _moller_scalar_tri(
                tv, ox, oy, oz, dx, dy, dz, t_min, bt
            )
            tri_k = ptris_ref[block, k * TRI_STRIDE + 9].astype(jnp.int32)
            bt = jnp.where(valid, t, bt)
            btri = jnp.where(valid, tri_k, btri)
            bu = jnp.where(valid, u, bu)
            bv = jnp.where(valid, v, bv)
        t_ref[0] = bt
        tri_ref[0] = btri
        u_ref[0] = bu
        v_ref[0] = bv

    def leaf_fn_ilp(block):
        # All triangles tested against the ENTRY best-t (independent -> ILP),
        # then a min-tree picks the winner.
        bt0 = t_ref[0]
        ts, us, vs, tris, valids = [], [], [], [], []
        for k in range(leaf_size):
            tv = [ptris_ref[block, k * TRI_STRIDE + c] for c in range(9)]
            t, u, v, valid = _moller_scalar_tri(
                tv, ox, oy, oz, dx, dy, dz, t_min, bt0
            )
            tri_k = ptris_ref[block, k * TRI_STRIDE + 9].astype(jnp.int32)
            ts.append(jnp.where(valid, t, BIG))
            us.append(u)
            vs.append(v)
            tris.append(tri_k)
            valids.append(valid)
        # Pairwise min-tree (3 levels for 8).
        while len(ts) > 1:
            nts, nus, nvs, ntris = [], [], [], []
            for a in range(0, len(ts), 2):
                take_b = ts[a + 1] < ts[a]
                nts.append(jnp.where(take_b, ts[a + 1], ts[a]))
                nus.append(jnp.where(take_b, us[a + 1], us[a]))
                nvs.append(jnp.where(take_b, vs[a + 1], vs[a]))
                ntris.append(
                    jnp.where(take_b, jnp.full_like(tris[a], 0) + tris[a + 1],
                              tris[a])
                )
            ts, us, vs, tris = nts, nus, nvs, ntris
        win = ts[0] < t_ref[0]
        t_ref[0] = jnp.where(win, ts[0], t_ref[0])
        tri_ref[0] = jnp.where(win, tris[0], tri_ref[0])
        u_ref[0] = jnp.where(win, us[0], u_ref[0])
        v_ref[0] = jnp.where(win, vs[0], v_ref[0])

    leaf_fn = leaf_fn_ilp if variant == "leafilp" else leaf_fn_serial

    stack_ref[0] = root_ref[0]

    def body(carry):
        sp, nv, nl = carry
        sp = sp - 1
        meta = stack_ref[sp]

        def on_leaf(sp):
            leaf_fn(~meta)
            return sp

        def on_internal(sp):
            t_cap = t_ref[0]
            return _visit_internal_counted(
                pnodes_ref, stack_ref, sp, meta,
                ox, oy, oz, ix, iy, iz, t_min, t_cap, variant,
            )

        sp = jax.lax.cond(meta < 0, on_leaf, on_internal, sp)
        return sp, nv + 1, nl + (meta < 0).astype(jnp.int32)

    _, nv, nl = jax.lax.while_loop(
        lambda c: c[0] > 0, body, (1, jnp.int32(0), jnp.int32(0))
    )
    nvisit_ref[0] = jnp.full((8, TILE_L), nv, jnp.int32)
    nleaf_ref[0] = jnp.full((8, TILE_L), nl, jnp.int32)


_CNT_SPEC = pl.BlockSpec((1, 8, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def run_closest_lab(ox, oy, oz, dx, dy, dz, tmax, root, pnodes, ptris,
                    variant):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 8, TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 8, TILE_L), jnp.int32),
    ]
    if variant.startswith("pop"):
        kern = functools.partial(
            _closest_kernel_multipop, leaf_size, int(variant[3:])
        )
    else:
        kern = functools.partial(_closest_kernel_lab, leaf_size, variant)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[_RAY_SPEC] * 7 + [_SMEM1, _FULL, _FULL],
        out_specs=[_RAY_SPEC] * 4 + [_CNT_SPEC] * 2,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(ox, oy, oz, dx, dy, dz, tmax, root, pnodes, ptris)


def measure(name, fn, *args):
    out = fn(*args)
    [float(jnp.sum(o.astype(jnp.float32))) for o in out[:1]]
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out[0]))
    dt = (time.perf_counter() - t0) / REPS
    return out, dt


def make_lab_kernel(leaf_size, tile_s):
    """tile_s-parametric copy of the production closest kernel (nored)."""
    def kern(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tmax_ref, root_ref, pnodes_ref, ptris_ref,
             t_ref, tri_ref, u_ref, v_ref, nvisit_ref, nleaf_ref, stack_ref):
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
        t_min = 1e-3
        t_ref[0] = tmax_ref[0]
        tri_ref[0] = jnp.full((tile_s, TILE_L), -1, jnp.int32)
        u_ref[0] = jnp.zeros((tile_s, TILE_L), jnp.float32)
        v_ref[0] = jnp.zeros((tile_s, TILE_L), jnp.float32)

        def leaf_fn(block):
            bt = t_ref[0]
            btri = tri_ref[0]
            bu = u_ref[0]
            bv = v_ref[0]
            for k in range(leaf_size):
                tv = [ptris_ref[block, k * TRI_STRIDE + c] for c in range(9)]
                t, u, v, valid = _moller_scalar_tri(
                    tv, ox, oy, oz, dx, dy, dz, t_min, bt
                )
                tri_k = ptris_ref[block, k * TRI_STRIDE + 9].astype(jnp.int32)
                bt = jnp.where(valid, t, bt)
                btri = jnp.where(valid, tri_k, btri)
                bu = jnp.where(valid, u, bu)
                bv = jnp.where(valid, v, bv)
            t_ref[0] = bt
            tri_ref[0] = btri
            u_ref[0] = bu
            v_ref[0] = bv

        stack_ref[0] = root_ref[0]

        def body(carry):
            sp, nv, nl = carry
            sp = sp - 1
            meta = stack_ref[sp]

            def on_leaf(sp):
                leaf_fn(~meta)
                return sp

            def on_internal(sp):
                t_cap = t_ref[0]
                return _visit_internal_counted(
                    pnodes_ref, stack_ref, sp, meta,
                    ox, oy, oz, ix, iy, iz, t_min, t_cap, "nored",
                )

            sp = jax.lax.cond(meta < 0, on_leaf, on_internal, sp)
            return sp, nv + 1, nl + (meta < 0).astype(jnp.int32)

        _, nv, nl = jax.lax.while_loop(
            lambda c: c[0] > 0, body, (1, jnp.int32(0), jnp.int32(0))
        )
        nvisit_ref[0] = jnp.full((8, TILE_L), nv, jnp.int32)
        nleaf_ref[0] = jnp.full((8, TILE_L), nl, jnp.int32)
    return kern


def run_closest_ts(ox, oy, oz, dx, dy, dz, tmax, root, pnodes, ptris,
                   tile_s):
    n_tiles = ox.shape[0]
    leaf_size = ptris.shape[1] // TRI_STRIDE
    spec = pl.BlockSpec((1, tile_s, TILE_L), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, tile_s, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, tile_s, TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, tile_s, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, tile_s, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 8, TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 8, TILE_L), jnp.int32),
    ]
    return pl.pallas_call(
        make_lab_kernel(leaf_size, tile_s),
        grid=(n_tiles,),
        in_specs=[spec] * 7 + [_SMEM1, _FULL, _FULL],
        out_specs=[spec] * 4 + [_CNT_SPEC] * 2,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(ox, oy, oz, dx, dy, dz, tmax, root, pnodes, ptris)


def main():
    from raytracer_tpu.integrator import wavefront as wf
    from raytracer_tpu.ops import rng
    from raytracer_tpu.ops.camera import Camera
    from raytracer_tpu.scene.benchmark import create_benchmark_atrium
    from raytracer_tpu.scene.device_scene import bake_scene
    from raytracer_tpu.utils.config import RenderConfig

    scene = create_benchmark_atrium(300_000)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=3,
                       accel="pallas")
    ds, _ = bake_scene(scene, leaf_size=cfg.bvh_leaf_size)
    cam = Camera.create(position=(-16.0, 6.5, -7.5), aspect=WIDTH / HEIGHT,
                        target=(8.0, 3.0, 4.0))
    mats = cam.matrices()
    ubo = {"inverse_view": jnp.asarray(mats["inverse_view"]),
           "inverse_proj": jnp.asarray(mats["inverse_proj"])}
    n = cfg.num_pixels

    # Primary rays + a bounced (sorted) wavefront, via the production path.
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def make_states(ds, ubo, cfg):
        seed0 = rng.seed_pixels(pixel_idx, jnp.uint32(1))
        r1, seed_rgen = rng.rnd(seed0)
        r2, seed_rgen = rng.rnd(seed_rgen)
        jitter = 0.5 + (jnp.stack([r1, r2], axis=-1) - 0.5) * 0.4
        origin, direction = wf._camera_rays(
            ubo["inverse_view"], ubo["inverse_proj"], cfg.width, cfg.height,
            jitter, pixel_idx)
        st = wf.WavefrontState(
            origin=origin, direction=direction,
            color=jnp.zeros((n, 3), jnp.float32),
            throughput=jnp.ones((n, 3), jnp.float32),
            seed_rgen=seed_rgen, seed=seed_rgen,
            alive=jnp.ones((n,), bool),
            first_bounce=jnp.ones((n,), bool),
            is_specular=jnp.zeros((n,), bool),
            prev_brdf_pdf=jnp.ones((n,), jnp.float32),
            prev_hit_pos=jnp.zeros((n, 3), jnp.float32),
            p_sample_light=jnp.zeros((n,), jnp.float32),
            did_direct=jnp.zeros((n,), bool),
            channel=jnp.full((n,), -1, jnp.int32),
            pixel=jnp.arange(n, dtype=jnp.int32),
        )
        hit = wf._trace(ds, st.origin, st.direction, cfg, st.alive)
        st1, ph, _ = wf._shade(ds, st, hit, cfg)
        st1 = st1._replace(alive=st1.alive & ph)
        st1 = wf._sort_wavefront(st1, ds)
        return st, st1

    state0, state1 = make_states(ds, ubo, cfg)
    float(jnp.sum(state1.origin))

    n_tiles = _tile_count(n)

    def prep(state):
        tm = jnp.where(state.alive, 1e4, 1e-3)
        args = _ray_tiles(state.origin, state.direction, n_tiles)
        return args + [_to_tiles(tm, n_tiles, fill=1e-3)]

    rays0 = jax.jit(prep)(state0)
    rays1 = jax.jit(prep)(state1)
    [float(jnp.sum(r)) for r in rays0[:1] + rays1[:1]]

    for label, rays in (("primary", rays0), ("bounce1", rays1)):
        ref = None
        for variant in ("base", "nored", "pop2", "pop4"):
            fn = jax.jit(functools.partial(run_closest_lab, variant=variant))
            out, dt = measure(variant, fn, *rays, ds.root_meta, ds.pnodes,
                              ds.ptris)
            t, tri, u, v, nvisit, nleaf = out
            visits = int(jnp.sum(nvisit[:, 0, 0]))
            leaves = int(jnp.sum(nleaf[:, 0, 0]))
            cyc = dt * FREQ_GHZ * 1e9 / max(visits, 1)
            if ref is None:
                ref = np.asarray(tri)
                match = True
            else:
                match = bool((np.asarray(tri) == ref).all())
            print(f"{label:8s} {variant:8s} {dt*1e3:8.1f} ms  "
                  f"visits/packet {visits//n_tiles:6d} "
                  f"(leaf {100*leaves/max(visits,1):.0f}%)  "
                  f"cyc/visit {cyc:6.0f}  match={match}", flush=True)


if __name__ == "__main__":
    main()
