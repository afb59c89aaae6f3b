"""Round-3 int8 e2e-regression bisect: the fused Pallas int8 routing that
microbenched at 301 TF/s (bench_int8_sweep.py) collapsed the e2e int8 bench
from ~50 to 3 clips/s. Time each candidate at the exact trunk shapes inside
a scan chain (slope over iters, scalar fetch) to find the culprit.

  xla_mm   — XLA-composed quantized_matmul (the round-2 shipped path)
  pallas_mm— ops/int8_mm.int8_dense (bm=2048) on the same shapes
  mlp_bf16 — ops/fused_mlp bf16
  mlp_int8 — ops/fused_mlp int8
  qkv      — int8_dense at the (65536,1024)x(1024,3072) qkv shape
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, C, H = 65536, 1024, 4096


def slope(name, make_chain, flops, iter_counts=(4, 16)):
    ts = []
    for it in iter_counts:
        g = jax.jit(make_chain(it))
        t0 = time.perf_counter(); float(np.asarray(g())); _ = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(g())); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(g())); t2 = time.perf_counter() - t0
        ts.append(min(t1, t2))
    per = (ts[1] - ts[0]) / (iter_counts[1] - iter_counts[0])
    rate = flops / per / 1e12
    print(f"{name:12s} {per * 1e3:8.3f} ms/iter  {rate:7.1f} TF/s", flush=True)
    return per


def main():
    from animal2vec_tpu.ops.int8_mm import int8_dense, quantize_weight
    from animal2vec_tpu.ops.fused_mlp import fused_mlp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.normal(size=(C, H)) / 32).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(H, C)) / 64).astype(np.float32))
    wq1, ws1 = quantize_weight(w1)
    wq2, ws2 = quantize_weight(w2)
    wqkv = jnp.asarray((rng.normal(size=(C, 3 * C)) / 32).astype(np.float32))
    wq3, ws3 = quantize_weight(wqkv)
    b1 = jnp.zeros((H,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)

    parts = set(os.environ.get("PARTS", "xla_mm,pallas_mm,mlp_bf16,mlp_int8,qkv").split(","))

    if "xla_mm" in parts:
        def xla_qmm(x, w):
            w32 = w.astype(jnp.float32)
            ws = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0
            wq = jnp.round(w32 / jnp.maximum(ws, 1e-12)).astype(jnp.int8)
            x32 = x.astype(jnp.float32)
            xs = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
            xq = jnp.round(x32 / jnp.maximum(xs, 1e-12)).astype(jnp.int8)
            y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * xs * ws).astype(x.dtype)

        def mk(it):
            def body(c, _):
                h = xla_qmm(c, w1)
                y = xla_qmm(h, w2)
                return c + y * 1e-6, None
            return lambda: jax.lax.scan(body, x0, None, length=it)[0].astype(jnp.float32).mean()
        slope("xla_mm", mk, 2 * 2 * N * C * H)

    if "pallas_mm" in parts:
        def mk(it):
            def body(c, _):
                h = int8_dense(c, wq1, ws1, block_n=256, block_m=2048)
                y = int8_dense(h, wq2, ws2, block_n=256, block_m=2048)
                return c + y * 1e-6, None
            return lambda: jax.lax.scan(body, x0, None, length=it)[0].astype(jnp.float32).mean()
        slope("pallas_mm", mk, 2 * 2 * N * C * H)

    if "mlp_bf16" in parts:
        w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
        def mk(it):
            def body(c, _):
                y = fused_mlp(c, w1b, w2b, b1, b2, block_n=512, block_m=1024)
                return c + y * 1e-6, None
            return lambda: jax.lax.scan(body, x0, None, length=it)[0].astype(jnp.float32).mean()
        slope("mlp_bf16", mk, 2 * 2 * N * C * H)

    if "mlp_int8" in parts:
        def mk(it):
            def body(c, _):
                y = fused_mlp(c, wq1, wq2, b1, b2, ws1, ws2, block_n=512, block_m=1024)
                return c + y * 1e-6, None
            return lambda: jax.lax.scan(body, x0, None, length=it)[0].astype(jnp.float32).mean()
        slope("mlp_int8", mk, 2 * 2 * N * C * H)

    if "qkv" in parts:
        def mk(it):
            def body(c, _):
                y = int8_dense(c, wq3, ws3, block_n=256, block_m=2048)
                return c + y[:, :C] * 1e-6, None
            return lambda: jax.lax.scan(body, x0, None, length=it)[0].astype(jnp.float32).mean()
        slope("qkv", mk, 2 * N * C * 3 * C)


if __name__ == "__main__":
    main()
