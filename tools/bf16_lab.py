"""Does the v5e VPU retire packed bf16 elementwise ops at 2x f32 rate?

Decides whether a bf16 2-triangles-per-vreg Moller-Trumbore leaf path can
halve the leaf VPU floor (ARCHITECTURE.md "remaining path" candidate). Times
a chain of fused multiply-adds over the same ELEMENT count:
  f32:  2 x [8,128] vregs, K fma steps each
  bf16: 1 x [16,128] vreg (packed),  K fma steps
If bf16 lands at ~half the f32 wall time, the ALU is packed-native and the
leaf-path rewrite is justified; ~equal wall time kills the idea.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

K = 512
TILES = 4096


def _kernel_f32(x_ref, y_ref, o_ref):
    x = x_ref[0]
    y = y_ref[0]
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)
    for _ in range(K):
        x = x * a + b
        y = y * a + b
    o_ref[0] = x + y


def _kernel_bf16(x_ref, o_ref):
    x = x_ref[0]
    a = jnp.bfloat16(1.0078125)
    b = jnp.bfloat16(0.001)
    for _ in range(K):
        x = x * a + b
    o_ref[0] = x


def _kernel_f32_mul(x_ref, y_ref, o_ref):
    x = x_ref[0]
    y = y_ref[0]
    a = jnp.float32(1.0000001)
    for _ in range(K):
        x = x * a
        y = y * a
    o_ref[0] = x + y


def _kernel_bf16_mul(x_ref, o_ref):
    x = x_ref[0]
    a = jnp.bfloat16(1.0078125)
    for _ in range(K):
        x = x * a
    o_ref[0] = x


def run(name, kernel, shapes, dtype):
    spec = [
        pl.BlockSpec((1,) + s, lambda i: (i,) + (0,) * len(s),
                     memory_space=pltpu.VMEM)
        for s in shapes
    ]
    out_spec = pl.BlockSpec((1,) + shapes[0], lambda i: (i,) + (0,) * len(shapes[0]),
                            memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=spec,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((TILES,) + shapes[0], dtype),
    )
    args = [jnp.ones((TILES,) + s, dtype) for s in shapes]
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(*args)
        float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 5
    elems = TILES * 16 * 128 * K
    print(f"{name:28s} {dt*1e3:8.2f} ms  {elems/dt/1e12:.2f} Top/s",
          flush=True)
    return dt



def _kernel_f32_ilp(x_ref, y_ref, o_ref):
    # 8 independent chains (4 per input vreg pair) so the VPU pipeline fills.
    xs = [x_ref[0] * jnp.float32(1.0 + i * 1e-6) for i in range(4)]
    ys = [y_ref[0] * jnp.float32(1.0 + i * 1e-6) for i in range(4)]
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)
    for _ in range(K // 4):
        xs = [v * a + b for v in xs]
        ys = [v * a + b for v in ys]
    o_ref[0] = sum(xs[1:], xs[0]) + sum(ys[1:], ys[0])


def _kernel_bf16_ilp(x_ref, o_ref):
    xs = [x_ref[0] * jnp.bfloat16(1.0 + i * 0.01) for i in range(8)]
    a = jnp.bfloat16(1.0078125)
    b = jnp.bfloat16(0.001)
    for _ in range(K // 4):
        xs = [v * a + b for v in xs]
    o_ref[0] = sum(xs[1:], xs[0])


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    f32 = run("f32 fma 2x[8,128]", _kernel_f32,
              [(8, 128), (8, 128)], jnp.float32)
    bf = run("bf16 fma [16,128]", _kernel_bf16, [(16, 128)], jnp.bfloat16)
    print(f"fma ratio f32/bf16: {f32/bf:.2f}", flush=True)
    f32m = run("f32 mul 2x[8,128]", _kernel_f32_mul,
               [(8, 128), (8, 128)], jnp.float32)
    bfm = run("bf16 mul [16,128]", _kernel_bf16_mul, [(16, 128)],
              jnp.bfloat16)
    print(f"mul ratio f32/bf16: {f32m/bfm:.2f}", flush=True)
    # ILP variants: per-element op count is K/4*8 chains / (2 or 1 vregs).
    f32i = run("f32 fma ILP8 2x[8,128]", _kernel_f32_ilp,
               [(8, 128), (8, 128)], jnp.float32)
    bfi = run("bf16 fma ILP8 [16,128]", _kernel_bf16_ilp, [(16, 128)],
              jnp.bfloat16)
    print(f"ILP fma ratio f32/bf16: {f32i/bfi:.2f}", flush=True)


if __name__ == "__main__":
    main()
