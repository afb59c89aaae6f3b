"""Dev tool: fused Pallas int8_dense vs bf16 XLA vs XLA-composed int8,
at the model's MLP shapes (N=B*T=65536, 1024->4096->1024). Scan-chain
harness with scalar fetch (remote tunnel ignores block_until_ready)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from animal2vec_tpu.ops.int8_mm import int8_dense, quantize_weight
from animal2vec_tpu.models.modules import quantized_matmul


def chain(name, body, c0, iters, flops_per_iter):
    g = jax.jit(
        lambda c: jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=iters)[0]
        .astype(jnp.float32).mean()
    )
    float(np.asarray(g(c0)))
    t0 = time.perf_counter()
    s1 = float(np.asarray(g(c0)))
    s2 = float(np.asarray(g(c0)))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(s1) and np.isfinite(s2), name
    print(f"{name:48s} {dt * 1e3:8.3f} ms  {flops_per_iter / dt / 1e12:6.1f} TFLOP/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    n, c, m = 65536, 1024, 4096
    fl = 2 * n * c * m * 2  # two matmuls per chain step
    w1 = rng.normal(size=(c, m)).astype(np.float32) * 0.02
    w2 = rng.normal(size=(m, c)).astype(np.float32) * 0.02
    x0 = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
    w1b, w2b = jnp.asarray(w1, jnp.bfloat16), jnp.asarray(w2, jnp.bfloat16)
    w1f, w2f = jnp.asarray(w1), jnp.asarray(w2)

    chain("bf16 XLA MLP", lambda x: (x @ w1b @ w2b + x * 1e-3), x0, 20, fl)
    chain(
        "int8 XLA-composed MLP (quantized_matmul)",
        lambda x: quantized_matmul(quantized_matmul(x, w1f), w2f) + x * 1e-3,
        x0, 20, fl,
    )
    q1, s1_ = quantize_weight(w1f)
    q2, s2_ = quantize_weight(w2f)
    for bn, bm in [(256, 512), (256, 1024), (512, 512), (512, 1024), (1024, 512)]:
        chain(
            f"int8 pallas MLP bn={bn} bm={bm}",
            lambda x, bn=bn, bm=bm: int8_dense(
                int8_dense(x, q1, s1_, block_n=bn, block_m=bm),
                q2, s2_, block_n=bn, block_m=bm,
            ) + x * 1e-3,
            x0, 20, fl,
        )

    # accuracy vs fp32
    exact = np.asarray(x0.astype(jnp.float32) @ w1f)
    got = np.asarray(int8_dense(x0, q1, s1_)[:256].astype(jnp.float32))
    rel = np.linalg.norm(got - exact[:256]) / np.linalg.norm(exact[:256])
    print(f"rel RMS err vs fp32 (first 256 rows): {rel:.4f}")


if __name__ == "__main__":
    main()
