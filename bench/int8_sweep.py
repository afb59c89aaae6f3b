"""Dev tool: block-size sweep for ops/int8_mm.int8_dense (slope-fit).

bench_int8_slope.py showed bn=512/bm=1024 lifts the fused int8 kernel from
235 to 303 TFLOP/s at MLP shapes; this sweeps the neighborhood and also
times the QKV/out-proj shapes so models/modules.py can pick per-shape
blocks. Run: python bench_int8_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from animal2vec_tpu.ops.int8_mm import int8_dense, quantize_weight


from bench.timing import slope_time as _slope_time  # noqa: E402


def slope_time(*a, **k):
    # preserve the pre-consolidation measurement protocol: these two
    # probes' PERF.md numbers were fitted over (8, 32, 96)-iter chains
    k.setdefault("iter_grid", (8, 32, 96))
    b, _ = _slope_time(*a, **k)
    return b
def main():
    rng = np.random.default_rng(0)
    tb = 65536
    print(f"devices: {jax.devices()}", flush=True)

    # --- MLP pair (1024 -> 4096 -> 1024) block sweep ---
    w1 = jnp.asarray(rng.normal(size=(1024, 4096)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4096, 1024)) * 0.02, jnp.float32)
    w1q, w1s = quantize_weight(w1)
    w2q, w2s = quantize_weight(w2)
    x0 = jnp.asarray(rng.normal(size=(tb, 1024)), jnp.bfloat16)
    fl = 2 * tb * 1024 * 4096 * 2
    for bn in (256, 512, 1024):
        for bm in (512, 1024, 2048):
            slope_time(
                f"mlp int8_dense bn={bn} bm={bm}",
                lambda c, bn=bn, bm=bm: int8_dense(
                    int8_dense(c, w1q, w1s, block_n=bn, block_m=bm),
                    w2q, w2s, block_n=bn, block_m=bm,
                ),
                x0, fl,
            )

    # --- QKV projection shape (1024 -> 3072) at the best blocks ---
    wq = jnp.asarray(rng.normal(size=(1024, 3072)) * 0.02, jnp.float32)
    wqq, wqs = quantize_weight(wq)
    flq = 2 * tb * 1024 * 3072
    for bn, bm in ((256, 512), (512, 1024), (1024, 1024)):
        slope_time(
            f"qkv int8_dense bn={bn} bm={bm}",
            lambda c, bn=bn, bm=bm: int8_dense(
                c, wqq, wqs, block_n=bn, block_m=bm
            )[:, :1024].astype(jnp.bfloat16),
            x0, flq,
        )

    # --- out-proj shape (1024 -> 1024) ---
    wo = jnp.asarray(rng.normal(size=(1024, 1024)) * 0.02, jnp.float32)
    woq, wos = quantize_weight(wo)
    flo = 2 * tb * 1024 * 1024
    for bn, bm in ((256, 512), (512, 1024), (1024, 1024)):
        slope_time(
            f"proj int8_dense bn={bn} bm={bm}",
            lambda c, bn=bn, bm=bm: int8_dense(c, woq, wos, block_n=bn, block_m=bm),
            x0, flo,
        )


if __name__ == "__main__":
    main()
