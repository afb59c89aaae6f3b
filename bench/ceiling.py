"""Dev tool: establish this chip's practical MXU ceilings (bf16 vs int8).

The remote PJRT tunnel does not honor block_until_ready, so every probe is a
dependent lax.scan chain whose scalar result is fetched (same harness as
bench_int8.py). Measures:
  1. pure bf16 square-matmul chain rate,
  2. pure int8xint8->int32 square-matmul chain rate (operands pre-quantized;
     the rate a fused in-kernel-quant serving path could approach),
  3. model-shaped int8 chain (1024->4096->1024 MLP shapes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(name, body, c0, iters, flops_per_iter):
    # reduce to a scalar on-device: fetching the full carry through the
    # remote tunnel costs seconds and swamps the kernel time
    g = jax.jit(
        lambda c: jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=iters)[0]
        .astype(jnp.float32).mean()
    )
    s0 = float(np.asarray(g(c0)))  # warm + sync
    t0 = time.perf_counter()
    s1 = float(np.asarray(g(c0)))
    s2 = float(np.asarray(g(c0)))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(float(s1)) and np.isfinite(float(s2)), name
    print(f"{name:48s} {dt * 1e3:8.3f} ms  {flops_per_iter / dt / 1e12:6.1f} TFLOP/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    n = 4096

    wb = jnp.asarray(rng.normal(size=(n, n)) * (1.0 / np.sqrt(n)), jnp.bfloat16)
    cb = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)
    chain(
        f"bf16 {n}x{n}x{n} chain",
        lambda c: jnp.dot(c, wb).astype(jnp.bfloat16),
        cb, iters=40, flops_per_iter=2 * n**3,
    )

    w8 = jnp.asarray(rng.integers(-127, 128, size=(n, n)), jnp.int8)
    c8 = jnp.asarray(rng.integers(-127, 128, size=(n, n)), jnp.int8)

    def step8(c):
        y = jax.lax.dot_general(
            c, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jax.lax.shift_right_arithmetic(y, 13).astype(jnp.int8)

    chain(f"int8 {n}x{n}x{n} chain (+shift/cast)", step8, c8, 40, 2 * n**3)

    # int8 with fp32 dequant epilogue (per-channel scale) — serving shape
    sc = jnp.asarray(rng.random(n).astype(np.float32) * 0.01)

    def step8d(c):
        y = jax.lax.dot_general(
            c, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        f = y.astype(jnp.float32) * sc
        return jnp.clip(f, -127, 127).astype(jnp.int8)

    chain(f"int8 {n}x{n}x{n} chain (+f32 dequant)", step8d, c8, 40, 2 * n**3)

    # model-shaped MLP chain: (T*B, 1024) -> 4096 -> 1024, bf16 vs int8
    tb, c1, m1 = 16384, 1024, 4096
    fl = 2 * tb * c1 * m1 * 2
    w1b = jnp.asarray(rng.normal(size=(c1, m1)) * 0.02, jnp.bfloat16)
    w2b = jnp.asarray(rng.normal(size=(m1, c1)) * 0.02, jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(tb, c1)), jnp.bfloat16)
    chain(
        "bf16 MLP chain 16384x1024x4096x1024",
        lambda c: jnp.dot(jnp.dot(c, w1b), w2b).astype(jnp.bfloat16) + x0 * 1e-3,
        x0, 30, fl,
    )
    w18 = jnp.asarray(rng.integers(-127, 128, size=(c1, m1)), jnp.int8)
    w28 = jnp.asarray(rng.integers(-127, 128, size=(m1, c1)), jnp.int8)
    x08 = jnp.asarray(rng.integers(-127, 128, size=(tb, c1)), jnp.int8)

    def mlp8(c):
        y = jax.lax.dot_general(c, w18, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        y = jax.lax.shift_right_arithmetic(y, 12).astype(jnp.int8)
        z = jax.lax.dot_general(y, w28, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return jax.lax.shift_right_arithmetic(z, 12).astype(jnp.int8)

    chain("int8 MLP chain 16384x1024x4096x1024", mlp8, x08, 30, fl)


if __name__ == "__main__":
    main()
