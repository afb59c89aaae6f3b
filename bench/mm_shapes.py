"""Dev tool: why do frontend-shaped matmuls cap at ~30 TFLOP/s?
Probes 2D vs 3D-batched matmuls and small-K/N effects at conv shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, x, iters=20, flops=None):
    def dep(c, out):
        return c + (out.astype(jnp.float32).mean() * 0.0).astype(c.dtype)

    f = jax.jit(
        lambda a0: jax.lax.scan(
            lambda c, _: (dep(c, fn(c)), None), a0, None, length=iters
        )[0].astype(jnp.float32).mean()
    )
    seeds = [x, x + jnp.asarray(1e-3, x.dtype), x + jnp.asarray(2e-3, x.dtype)]
    float(np.asarray(f(seeds[0])))
    t0 = time.perf_counter()
    p1 = float(np.asarray(f(seeds[1])))
    p2 = float(np.asarray(f(seeds[2])))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(p1) and np.isfinite(p2)
    extra = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:40s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(size=(512, 512)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(512, 2048)) * 0.05, jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(1536, 512)) * 0.05, jnp.bfloat16)
    w4 = jnp.asarray(rng.normal(size=(2048, 512)) * 0.05, jnp.bfloat16)

    x2 = jnp.asarray(rng.normal(size=(65536, 512)) * 0.1, jnp.bfloat16)
    x3 = jnp.asarray(rng.normal(size=(32, 2048, 512)) * 0.1, jnp.bfloat16)

    fl = 2 * 65536 * 512 * 512
    timed("2D (65536,512)@(512,512)", lambda x: x @ w1, x2, flops=fl)
    timed("3D (32,2048,512)@(512,512)", lambda x: x @ w1, x3, flops=fl)
    fl2 = 2 * 65536 * 512 * 2048
    timed("2D (65536,512)@(512,2048)", lambda x: x @ w2, x2, flops=fl2)
    fl3 = 2 * 65536 * 1536 * 512
    timed("2D (65536,1536)@(1536,512)",
          lambda x: jnp.concatenate([x, x, x], axis=-1) @ w3, x2, flops=fl3)
    fl4 = 2 * 65536 * 2048 * 512
    timed("2D (65536,2048)@(2048,512)",
          lambda x: jnp.concatenate([x, x, x, x], axis=-1) @ w4, x2, flops=fl4)
    # three shifted matmuls summed (the k3 s1 conv decomposition, 2D form)
    timed("3x shifted (65536,512)@(512,512)",
          lambda x: x @ w1 + jnp.roll(x, 1, 0) @ w1 + jnp.roll(x, -1, 0) @ w1,
          x2, flops=3 * fl)


if __name__ == "__main__":
    main()
