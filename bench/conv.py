"""Dev tool: frontend conv layers — XLA conv lowering vs stride-grouped
matmul decomposition, per layer in isolation, on the real chip.

Also probes the fp32 sinc conv vs a bf16(+fp32 accum) variant."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from animal2vec_tpu.models.modules import conv1d_same
from animal2vec_tpu.ops.conv_mm import conv1d_mm
from animal2vec_tpu.ops.conv_arith import same_pad_1d, strided_pad_1d


def timed(name, fn, x, iters=10, flops=None):
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
    print(f"{name:44s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    b = 32
    layers = [  # (t_in, c_in, c_out, k, s)
        (16000, 127, 512, 10, 5),
        (16000, 512, 512, 3, 2),
        (8000, 512, 512, 3, 2),
        (4000, 512, 512, 3, 2),
        (2000, 512, 512, 3, 1),
        (2000, 512, 512, 2, 1),
    ]
    which = os.environ.get("LAYERS")
    for i, (t, ci, co, k, s) in enumerate(layers):
        if which and str(i) not in which.split(","):
            continue
        x = jnp.asarray(rng.normal(size=(b, t, ci)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, ci, co)) * 0.05, jnp.bfloat16)
        pad = same_pad_1d(k) if s == 1 else strided_pad_1d(s)
        t_out = (t + pad[0] + pad[1] - k) // s + 1
        fl = 2 * b * t_out * k * ci * co
        timed(f"L{i} xla-conv  ({ci}->{co} k{k} s{s} T{t})",
              lambda xx, w=w, s=s, pad=pad: conv1d_same(xx, w, None, stride=s, pad=pad),
              x, flops=fl)
        timed(f"L{i} mm-decomp ({ci}->{co} k{k} s{s} T{t})",
              lambda xx, w=w, s=s, pad=pad: conv1d_mm(xx, w, None, stride=s, pad=pad),
              x, flops=fl)
        if ci == 127:
            xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
            wpad = jnp.pad(w, ((0, 0), (0, 1), (0, 0)))
            timed(f"L{i} mm-decomp cpad128",
                  lambda xx, w=wpad, s=s, pad=pad: conv1d_mm(xx, w, None, stride=s, pad=pad),
                  xpad, flops=fl)

    # sinc conv: (B, 80000, 1) -> 127ch k63 s1, fp32 vs bf16
    if not which or "s" in which:
        t, co, k = 80000, 127, 63
        x = jnp.asarray(rng.normal(size=(b, t + 62, 1)) * 0.1, jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, 1, co)) * 0.1, jnp.float32)
        fl = 2 * b * t * k * co

        def sconv(xx, dt_):
            return jax.lax.conv_general_dilated(
                xx.astype(dt_), w.astype(dt_), window_strides=(1,), padding=[(0, 0)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32,
            )

        timed("sinc fp32", lambda xx: sconv(xx, jnp.float32), x, flops=fl)
        timed("sinc bf16+f32acc", lambda xx: sconv(xx, jnp.bfloat16), x, flops=fl)


if __name__ == "__main__":
    main()
