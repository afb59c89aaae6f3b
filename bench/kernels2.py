"""Dev tool: establish the practical MXU ceiling on this chip and compare
attention implementations: stock pallas flash (no bias), our kernel, and a
pre-transposed-K variant."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def main():
    rng = np.random.default_rng(0)

    # ---- clean matmul ceiling: x(64k,1024) @ W1(1024,4096) @ W2(4096,1024)
    n, c, m = 65536, 1024, 4096
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(c, m)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    fl = 2 * n * c * m * 2

    def mm2(xc):
        return (xc @ w1) @ w2

    timed("matmul chain 1024->4096->1024", mm2, x, flops=fl)

    # ---- stock pallas flash attention, no bias
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    b, h, t, d = 32, 16, 2048, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    afl = 4 * b * h * t * t * d

    bs = BlockSizes(
        block_q=1024, block_k_major=1024, block_k=1024, block_b=1,
        block_q_major_dkv=1024, block_k_major_dkv=1024, block_k_dkv=1024,
        block_q_dkv=1024, block_k_major_dq=1024, block_k_dq=1024, block_q_dq=1024,
    )

    def stock(qc):
        o = flash_attention(qc, qc, qc, causal=False, sm_scale=d**-0.5, block_sizes=bs)
        return qc + (o.astype(jnp.float32).mean() * 0.0).astype(qc.dtype)

    timed("stock pallas flash (no bias)", stock, q, flops=afl)

    # ---- our kernel full (from bench_kernels)
    from bench.kernels import attn_v2
    from animal2vec_tpu.ops.alibi import alibi_slopes

    qkv = jnp.stack([q, q, q])
    slopes = jnp.asarray(alibi_slopes(h), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    sp = slopes[None, :, None] * pos.astype(jnp.float32)[:, None, :]

    def ours(q3):
        o = attn_v2(q3, sp, 1024, 1024, "full")
        return q3 + (o.astype(jnp.float32).mean() * 0.0).astype(q3.dtype)

    timed("ours full (bq1024,bk1024)", ours, qkv, flops=afl)

    print("done")


if __name__ == "__main__":
    main()
