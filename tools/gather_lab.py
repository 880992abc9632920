"""Gather/scatter economics on the real TPU — round-3 measurements.

Round-2 established XLA gathers are row-throughput-bound (~25 ns/row,
width-free). The frame's remaining permutation/gather costs:
  - occlusion block: 1 packed [N,8] gather + 1 bool scatter (~115 ms/bounce)
  - wavefront sort: 2 wide row gathers (~112 ms/sort)
  - fetch_surface: tri_shade [N<-T,24] + mat_packed [N<-M,16] gathers
Candidates measured here:
  1. one-hot matmul instead of gather for SMALL tables (mat_packed M~200,
     light tables): onehot [N,M]bf16 @ table [M,16] — MXU + HBM streaming
     instead of the row-bound gather path.
  2. block-granular permutation: sort blocks of G consecutive lanes by a
     block key; gather [N/G, G*W] reshaped rows — row count (and cost)
     drops G-fold, coherence within a block inherited from wavefront order.
  3. scatter vs gather-by-inverse-perm cost.
  4. index dtype / sortedness effects.
Run via tools/tpu_run.sh tools/gather_lab.py.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N = 2_073_600  # 1080p lanes
REPS = 5


def force(x):
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


def bench(name, fn, *args):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:54s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}  N={N}", flush=True)

    # --- 1. gather baselines at several table sizes ---
    for T, W in [(300_000, 24), (300_000, 8), (256, 16), (64, 16)]:
        table = jax.random.normal(key, (T, W), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        bench(f"gather [{T},{W}] rows={N}", f, table, idx)

    # --- 2. one-hot matmul for small tables ---
    for M in [64, 256]:
        table = jax.random.normal(key, (M, 16), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, M, jnp.int32)

        def onehot_f32(t, i, M=M):
            oh = (i[:, None] == jnp.arange(M)[None, :]).astype(jnp.float32)
            return oh @ t

        def onehot_bf16(t, i, M=M):
            oh = (i[:, None] == jnp.arange(M)[None, :]).astype(jnp.bfloat16)
            return (oh @ t.astype(jnp.bfloat16)).astype(jnp.float32)

        bench(f"onehot-f32 matmul M={M} W=16", jax.jit(onehot_f32), table, idx)
        bench(f"onehot-bf16 matmul M={M} W=16", jax.jit(onehot_bf16), table,
              idx)

    # --- 3. permutation: full vs block-granular ---
    keys = jax.random.randint(key, (N,), 0, 1 << 30, jnp.int32)
    payload8 = jax.random.normal(key, (N, 8), jnp.float32)
    payload17 = jax.random.normal(key, (N, 17), jnp.float32)

    def full_perm(k, p):
        perm = jnp.argsort(k)
        return p[perm]

    bench("argsort(N) + gather [N,8]", jax.jit(full_perm), keys, payload8)
    bench("argsort(N) + gather [N,17]", jax.jit(full_perm), keys, payload17)

    def sort_only(k):
        return jnp.argsort(k)

    bench("argsort(N) alone", jax.jit(sort_only), keys)

    for G in [8, 16, 32]:
        def block_perm(k, p, G=G):
            bk = k.reshape(-1, G)[:, 0]  # block key = first lane's key
            perm = jnp.argsort(bk)
            return p.reshape(-1, G * p.shape[1])[perm]

        bench(f"block G={G}: argsort(N/{G}) + gather [N/{G},{G * 8}]",
              jax.jit(block_perm), keys, payload8)

    # --- 4. scatter (inverse permutation apply) ---
    perm = jnp.argsort(keys)
    occ = jax.random.randint(key, (N,), 0, 2, jnp.int32)

    def scatter_back(perm, occ):
        return jnp.zeros((N,), jnp.int32).at[perm].set(occ)

    def gather_back(perm, occ):
        inv = jnp.argsort(perm)
        return occ[inv]

    bench("scatter occ .at[perm].set", jax.jit(scatter_back), perm, occ)
    bench("inv-argsort + gather occ", jax.jit(gather_back), perm, occ)

    def block_scatter(perm, occ, G=16):
        bperm = perm  # already block-level ids when built that way
        return occ  # placeholder cost ~0

    # --- 5. sorted vs random index gather (locality effect) ---
    table = jax.random.normal(key, (300_000, 24), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, 300_000, jnp.int32)
    idx_sorted = jnp.sort(idx)
    f = jax.jit(lambda t, i: t[i])
    bench("gather [300k,24] random idx", f, table, idx)
    bench("gather [300k,24] sorted idx", f, table, idx_sorted)

    # --- 6. fused key-compute+argsort+gather+kernel-ish chain  ---
    # How much does XLA save if gather output feeds sum (fusion)?
    def chain(k, p):
        perm = jnp.argsort(k)
        return jnp.sum(p[perm], axis=1)

    bench("argsort + gather [N,8] + reduce (fused?)", jax.jit(chain), keys,
          payload8)


if __name__ == "__main__":
    main()
