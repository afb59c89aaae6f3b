"""Dev tool: is head_dim=64 intrinsically half-rate on the MXU?

Times bare pallas dots at flash-attention tile shapes with D=64 vs D=128:
  QK^T-shaped: (1024, D) @ (D, 2048)
  PV-shaped:   (1024, 2048) @ (2048, D)
If t(D=64) ~= t(D=128), the lane-128 tiling pads D and the attention kernel
is already near its hardware floor; if t(64) ~= t(128)/2, our kernel has
real headroom.
"""

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


def probe(name, m, k, n, iters=512):
    """One pallas_call with a grid of `iters` steps; each step does
    (m,k)@(k,n) from resident VMEM blocks into a VMEM accumulator."""

    def kern(a_ref, b_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _z():
            acc[...] = jnp.zeros_like(acc)

        acc[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == iters - 1)
        def _w():
            o_ref[...] = acc[...]

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(k, n)) * 0.1, jnp.bfloat16)
    f = jax.jit(
        lambda a, b: pl.pallas_call(
            kern,
            grid=(iters,),
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0)),
                pl.BlockSpec((k, n), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(a, b).mean()
    )
    float(np.asarray(f(a, b)))
    t0 = time.perf_counter()
    s1 = float(np.asarray(f(a, b)))
    s2 = float(np.asarray(f(a, b)))
    dt = (time.perf_counter() - t0) / 2
    fl = 2 * m * k * n * iters
    print(f"{name:34s} {dt * 1e3:8.3f} ms  {fl / dt / 1e12:6.1f} TFLOP/s", flush=True)
    assert np.isfinite(s1) and np.isfinite(s2)
    return dt


def main():
    probe("QKt  (1024,64)@(64,2048)", 1024, 64, 2048)
    probe("QKt  (1024,128)@(128,2048)", 1024, 128, 2048)
    probe("QKt  (1024,256)@(256,2048)", 1024, 256, 2048, iters=256)
    probe("PV   (1024,2048)@(2048,64)", 1024, 2048, 64)
    probe("PV   (1024,2048)@(2048,128)", 1024, 2048, 128)
    probe("sq   (1024,1024)@(1024,1024)", 1024, 1024, 1024)


if __name__ == "__main__":
    main()
