"""Dev tool: verify-or-break round-2's "practical MXU ceiling" (118/197 bf16).

Round-2's bench_ceiling.py timed a dependent lax.scan chain with a FIXED
iteration count (40) and divided wall time by it.  Through the remote axon
relay every jitted call pays a fixed dispatch+fetch round trip; at 40 iters
of a ~0.7 ms matmul that fixed cost is the same order as the compute and
inflates per-iter time -- i.e. the "ceiling" may be a harness artifact.

This harness removes the fixed cost exactly: for each probe it times the
same chain at several iteration counts and reports the SLOPE of a least-
squares fit  total_time = overhead + slope * iters.  The slope is the true
steady-state per-iteration device time, independent of any per-call relay
overhead.  It also reports the fitted overhead (the relay RTT estimate).

Run: python bench_ceiling2.py [quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"


from bench.timing import slope_time  # noqa: E402
def main():
    rng = np.random.default_rng(0)
    grid = (8, 32) if QUICK else (8, 32, 128)

    print(f"devices: {jax.devices()}", flush=True)

    # --- 1. the round-2 headline probe, slope-timed: bf16 4096^3 chain ---
    n = 4096
    wb = jnp.asarray(rng.normal(size=(n, n)) * (1.0 / np.sqrt(n)), jnp.bfloat16)
    cb = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)
    slope_time(
        f"bf16 {n}^3 chain",
        lambda c: jnp.dot(c, wb).astype(jnp.bfloat16),
        cb, 2 * n**3, grid,
    )

    # --- 2. the round-2 MLP-shaped probe (64k x 1024 x 4096 x 1024) ---
    tb, c1, m1 = 65536, 1024, 4096
    fl = 2 * tb * c1 * m1 * 2
    w1b = jnp.asarray(rng.normal(size=(c1, m1)) * 0.02, jnp.bfloat16)
    w2b = jnp.asarray(rng.normal(size=(m1, c1)) * 0.02, jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(tb, c1)), jnp.bfloat16)
    slope_time(
        "bf16 MLP chain 65536x1024x4096x1024",
        lambda c: jnp.dot(jnp.dot(c, w1b), w2b).astype(jnp.bfloat16),
        x0, fl, grid,
    )

    # --- 3. int8 4096^3 chain, slope-timed ---
    w8 = jnp.asarray(rng.integers(-127, 128, size=(n, n)), jnp.int8)
    c8 = jnp.asarray(rng.integers(-127, 128, size=(n, n)), jnp.int8)

    def step8(c):
        y = jax.lax.dot_general(
            c, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jax.lax.shift_right_arithmetic(y, 13).astype(jnp.int8)

    slope_time(f"int8 {n}^3 chain (+shift/cast)", step8, c8, 2 * n**3, grid)

    # --- 4. int8 MLP shapes ---
    w18 = jnp.asarray(rng.integers(-127, 128, size=(c1, m1)), jnp.int8)
    w28 = jnp.asarray(rng.integers(-127, 128, size=(m1, c1)), jnp.int8)
    x08 = jnp.asarray(rng.integers(-127, 128, size=(tb, c1)), jnp.int8)

    def mlp8(c):
        y = jax.lax.dot_general(c, w18, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = jax.lax.shift_right_arithmetic(y, 12).astype(jnp.int8)
        z = jax.lax.dot_general(y, w28, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jax.lax.shift_right_arithmetic(z, 12).astype(jnp.int8)

    slope_time("int8 MLP chain 65536x1024x4096x1024", mlp8, x08, fl, grid)

    if QUICK:
        return

    # --- 5. batched matmul (8 independent heads) -- does batching help? ---
    bh, m2 = 8, 2048
    wbb = jnp.asarray(rng.normal(size=(bh, m2, m2)) * 0.02, jnp.bfloat16)
    cbb = jnp.asarray(rng.normal(size=(bh, m2, m2)), jnp.bfloat16)
    slope_time(
        f"bf16 batched {bh}x{m2}^3",
        lambda c: jnp.einsum("bij,bjk->bik", c, wbb).astype(jnp.bfloat16),
        cbb, 2 * bh * m2**3, grid,
    )

    # --- 6. larger K: 64k x 4096 x 4096 (single wide matmul) ---
    x4 = jnp.asarray(rng.normal(size=(16384, 4096)), jnp.bfloat16)
    w4 = jnp.asarray(rng.normal(size=(4096, 4096)) * 0.02, jnp.bfloat16)
    slope_time(
        "bf16 16384x4096x4096 single",
        lambda c: jnp.dot(c, w4).astype(jnp.bfloat16),
        x4, 2 * 16384 * 4096 * 4096, grid,
    )


if __name__ == "__main__":
    main()
