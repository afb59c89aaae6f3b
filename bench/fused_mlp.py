"""Dev tool: slope-fit the fused MLP kernel vs the unfused chains.

Context (bench_int8_slope.py): bf16 matmuls 179 TF/s but bf16+GELU 137;
int8 pre-quant 379 but int8+GELU 138 — the unfused GELU round-trips the
(T, 4M) intermediate through HBM. ops/fused_mlp.py keeps it in VMEM.
Run: python bench_fused_mlp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from animal2vec_tpu.ops.fused_mlp import fused_mlp
from animal2vec_tpu.ops.int8_mm import quantize_weight


from bench.timing import slope_time as _slope_time  # noqa: E402


def slope_time(*a, **k):
    # preserve the pre-consolidation measurement protocol: these two
    # probes' PERF.md numbers were fitted over (8, 32, 96)-iter chains
    k.setdefault("iter_grid", (8, 32, 96))
    b, _ = _slope_time(*a, **k)
    return b
def main():
    rng = np.random.default_rng(0)
    tb, c, m = 65536, 1024, 4096
    fl = 2 * tb * c * m * 2
    w1 = jnp.asarray(rng.normal(size=(c, m)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(m, c)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(m,)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)
    w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
    w1q, w1s = quantize_weight(w1)
    w2q, w2s = quantize_weight(w2)
    x0 = jnp.asarray(rng.normal(size=(tb, c)), jnp.bfloat16)
    print(f"devices: {jax.devices()}", flush=True)

    # references
    slope_time(
        "XLA bf16 + GELU (unfused)",
        lambda x: jnp.dot(
            jax.nn.gelu(jnp.dot(x, w1b) + b1, approximate=False), w2b
        ).astype(jnp.bfloat16) + 0 * b2.astype(jnp.bfloat16),
        x0, fl,
    )

    for bn in (256, 512):
        for bm in (512, 1024, 2048):
            try:
                slope_time(
                    f"fused bf16 bn={bn} bm={bm}",
                    lambda x, bn=bn, bm=bm: fused_mlp(
                        x, w1b, w2b, b1, b2, block_n=bn, block_m=bm
                    ),
                    x0, fl,
                )
            except Exception as e:
                print(f"fused bf16 bn={bn} bm={bm} FAILED: {str(e)[:100]}")

    for bn in (256, 512):
        for bm in (512, 1024, 2048):
            try:
                slope_time(
                    f"fused int8 bn={bn} bm={bm}",
                    lambda x, bn=bn, bm=bm: fused_mlp(
                        x, w1q, w2q, b1, b2, w1s, w2s, block_n=bn, block_m=bm
                    ),
                    x0, fl,
                )
            except Exception as e:
                print(f"fused int8 bn={bn} bm={bm} FAILED: {str(e)[:100]}")


if __name__ == "__main__":
    main()
