"""Dev tool: slope-fit the *serving-realistic* int8 matmul paths.

bench_ceiling2.py established that the round-2 fixed-count timings were
inflated by a ~26 ms/call relay overhead: the true chip rates are
~179 TFLOP/s bf16 and ~356-380 TFLOP/s pre-quantized int8 (91-96% of
nominal), not the 118/126-167 recorded in docs/PERF.md round 2.  This
harness re-measures the paths a real int8 serving step actually runs —
pre-quantized int8 weights + dynamic per-row activation quantization —
with the same slope fit (total = overhead + slope * iters), to find how
much of the 2.1x int8 advantage survives the activation-quant epilogues.

Probes (MLP shapes: 65536 x 1024 x 4096 x 1024, the a2v-large trunk):
  1. bf16 chain                      (baseline; ceiling2: 179)
  2. pre-quantized x and w           (pure MXU; ceiling2: 379)
  3. XLA-composed dyn-act-quant      (models/modules.quantized_matmul path,
                                      weights pre-quantized outside)
  4. Pallas fused int8_dense         (ops/int8_mm.py)
  5. XLA dyn-quant + GELU between    (the actual MLP nonlinearity cost)

Run: python bench_int8_slope.py
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
    b, _ = _slope_time(*a, **k)
    return b
def main():
    rng = np.random.default_rng(0)
    tb, c1, m1 = 65536, 1024, 4096
    fl = 2 * tb * c1 * m1 * 2  # two matmuls per iter

    w1 = rng.normal(size=(c1, m1)).astype(np.float32) * 0.02
    w2 = rng.normal(size=(m1, c1)).astype(np.float32) * 0.02
    x0b = jnp.asarray(rng.normal(size=(tb, c1)), jnp.bfloat16)

    w1b, w2b = jnp.asarray(w1, jnp.bfloat16), jnp.asarray(w2, jnp.bfloat16)
    print(f"devices: {jax.devices()}", flush=True)

    # 1. bf16 baseline
    slope_time(
        "bf16 MLP chain",
        lambda c: jnp.dot(jnp.dot(c, w1b), w2b).astype(jnp.bfloat16),
        x0b, fl,
    )

    # 2. pure int8 (both operands pre-quantized)
    w1q8 = jnp.asarray(rng.integers(-127, 128, size=(c1, m1)), jnp.int8)
    w2q8 = jnp.asarray(rng.integers(-127, 128, size=(m1, c1)), jnp.int8)
    x08 = jnp.asarray(rng.integers(-127, 128, size=(tb, c1)), jnp.int8)

    def pure8(c):
        y = jax.lax.dot_general(c, w1q8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = jax.lax.shift_right_arithmetic(y, 12).astype(jnp.int8)
        z = jax.lax.dot_general(y, w2q8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jax.lax.shift_right_arithmetic(z, 12).astype(jnp.int8)

    slope_time("int8 pre-quant both operands", pure8, x08, fl)

    # 3. XLA-composed dynamic act quant (weights pre-quantized)
    w1q, w1s = quantize_weight(jnp.asarray(w1))
    w2q, w2s = quantize_weight(jnp.asarray(w2))

    def dyn_mm(x, wq, ws):
        x32 = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12)
        xq = jnp.round(x32 / xs).astype(jnp.int8)
        y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs * ws[None, :]).astype(x.dtype)

    slope_time(
        "XLA dyn-act-quant int8 chain",
        lambda c: dyn_mm(dyn_mm(c, w1q, w1s), w2q, w2s),
        x0b, fl,
    )

    # 4. Pallas fused int8_dense chain
    slope_time(
        "Pallas int8_dense chain",
        lambda c: int8_dense(int8_dense(c, w1q, w1s), w2q, w2s),
        x0b, fl,
    )

    # 4b. Pallas with bigger row blocks
    slope_time(
        "Pallas int8_dense bn=512 bm=1024",
        lambda c: int8_dense(
            int8_dense(c, w1q, w1s, block_n=512, block_m=1024),
            w2q, w2s, block_n=512, block_m=1024,
        ),
        x0b, fl,
    )

    # 5. realistic MLP: dyn-quant + GELU between the two matmuls
    slope_time(
        "XLA dyn-quant + GELU MLP",
        lambda c: dyn_mm(
            jax.nn.gelu(dyn_mm(c, w1q, w1s), approximate=False), w2q, w2s
        ),
        x0b, fl,
    )

    # 5b. bf16 + GELU reference
    slope_time(
        "bf16 + GELU MLP",
        lambda c: jnp.dot(
            jax.nn.gelu(jnp.dot(c, w1b), approximate=False), w2b
        ).astype(jnp.bfloat16),
        x0b, fl,
    )


if __name__ == "__main__":
    main()
