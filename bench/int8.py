"""Dev tool: can int8 dot_general reach ~2x the bf16 MXU rate on this chip?

Measures the quantize->int8-matmul->dequant chain at the model's projection
shapes, vs the bf16 baseline, plus accuracy of per-channel symmetric weight
quant + per-row dynamic activation quant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, f, x, iters=10, flops=None):
    g = jax.jit(
        lambda a0: jax.lax.scan(lambda c, _: (f(c), None), a0, None, length=iters)[0]
        .astype(jnp.float32).mean()
    )
    seeds = [x, x + jnp.asarray(1e-3, x.dtype), x + jnp.asarray(2e-3, x.dtype)]
    np.asarray(g(seeds[0]))
    t0 = time.perf_counter()
    p1 = np.asarray(g(seeds[1]))
    p2 = np.asarray(g(seeds[2]))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(p1) and np.isfinite(p2), name
    extra = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:40s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def quant_w(w):  # per-output-channel symmetric
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    n, c, m = 65536, 1024, 4096
    xf = rng.normal(size=(n, c)).astype(np.float32) * 0.5
    w1f = rng.normal(size=(c, m)).astype(np.float32) * 0.02
    w2f = rng.normal(size=(m, c)).astype(np.float32) * 0.02
    x = jnp.asarray(xf).astype(jnp.bfloat16)
    w1 = jnp.asarray(w1f).astype(jnp.bfloat16)
    w2 = jnp.asarray(w2f).astype(jnp.bfloat16)
    fl = 2 * n * c * m * 2

    def mm_bf16(xc):
        return (xc @ w1) @ w2

    timed("bf16 chain", mm_bf16, x, flops=fl)

    w1q, w1s = quant_w(jnp.asarray(w1f))
    w2q, w2s = quant_w(jnp.asarray(w2f))

    def q_act(xc):  # per-row dynamic
        s = jnp.max(jnp.abs(xc), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        q = jnp.clip(jnp.round(xc / s), -127, 127).astype(jnp.int8)
        return q, s

    def int8_mm(xq, xs, wq, ws):
        y = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return y.astype(jnp.float32) * xs * ws[None, :]

    def mm_int8(xc):
        xq, xs = q_act(xc.astype(jnp.float32))
        y = int8_mm(xq, xs, w1q, w1s).astype(jnp.bfloat16)
        yq, ys = q_act(y.astype(jnp.float32))
        z = int8_mm(yq, ys, w2q, w2s)
        return z.astype(jnp.bfloat16)

    timed("int8 chain (dyn act quant)", mm_int8, x, flops=fl)

    # weight-only variant: int8 weights dequantized on the fly, bf16 MXU
    def mm_w8(xc):
        y = xc @ (w1q.astype(jnp.bfloat16) * w1s.astype(jnp.bfloat16)[None, :])
        return y @ (w2q.astype(jnp.bfloat16) * w2s.astype(jnp.bfloat16)[None, :])

    timed("int8-weight bf16-act chain", mm_w8, x, flops=fl)

    # accuracy
    ref = np.asarray(mm_bf16(x), np.float32)
    got = np.asarray(mm_int8(x), np.float32)
    denom = np.sqrt((ref ** 2).mean())
    print(f"int8 rel RMS err: {np.sqrt(((ref - got) ** 2).mean()) / denom:.4f}")
    print("done")


if __name__ == "__main__":
    main()
