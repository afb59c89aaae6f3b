"""Dev tool: can a hand-tiled pallas matmul beat XLA's 22 TFLOP/s at the
frontend's (65536,512)@(512,512) shape?"""

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


def pallas_mm(x, w, block_m=1024):
    m, k = x.shape
    _, n = w.shape

    def kern(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x, w)


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
    x = jnp.asarray(rng.normal(size=(65536, 512)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(512, 512)) * 0.05, jnp.bfloat16)
    fl = 2 * 65536 * 512 * 512
    timed("xla  (65536,512)@(512,512)", lambda a: a @ w, x, flops=fl)
    for bm in (512, 1024, 2048, 4096):
        timed(f"pallas bm={bm}", functools.partial(pallas_mm, w=w, block_m=bm), x, flops=fl)


if __name__ == "__main__":
    main()
