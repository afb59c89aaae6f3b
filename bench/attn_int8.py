"""Dev tool: is int8 faster than bf16 at flash-attention tile shapes?

Attention at head_dim 64 is occupancy-bound on the MXU (the 128-lane tiling
pads QK^T's contraction and PV's output dim — see docs/PERF.md round-2
finding 2). If the int8 mode still doubles per-cycle throughput on the
*occupied* half of the array, an in-kernel-quant int8 flash kernel would cut
the dominant inference cost (~50% of runtime) toward the 250 clips/s target.
This probes exactly the two tile matmuls at the kernel's block sizes
(bq=1024, bk=2048, d=64) with pre-quantized operands (upper bound for a
fused-quant kernel) — same dependent-scan harness as bench_ceiling.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(name, body, c0, iters, flops_per_iter):
    g = jax.jit(
        lambda c: jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=iters)[0]
        .astype(jnp.float32).mean()
    )
    s0 = float(np.asarray(g(c0)))
    t0 = time.perf_counter()
    s1 = float(np.asarray(g(c0)))
    s2 = float(np.asarray(g(c0)))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(s1) and np.isfinite(s2), name
    print(f"{name:52s} {dt * 1e3:8.3f} ms  {flops_per_iter / dt / 1e12:6.1f} TFLOP/s", flush=True)
    return dt


def main():
    # nb tile-pairs batched per iteration so per-dispatch overhead amortizes
    # (single-tile chains measured dispatch, not the MXU: 0.7 TFLOP/s)
    nb, bq, bk, d = 8, 1024, 2048, 64
    iters = int(os.environ.get("ITERS", "50"))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(nb, bq, d)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(nb, bk, d)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(nb, bk, d)).astype(np.float32), jnp.bfloat16)
    fl_qk = 2 * nb * bq * bk * d
    fl_pv = 2 * nb * bq * bk * d

    def bdot(a, b_, trans_b, prefer):
        cdim = 2 if trans_b else 1
        return jax.lax.dot_general(
            a, b_, (((2,), (cdim,)), ((0,), (0,))), preferred_element_type=prefer
        )

    # bf16 reference: S = qK^T (nb,bq,bk); out = S@V (nb,bq,d); feed back
    def bf16_body(c):
        s = bdot(c, k, True, jnp.float32)
        o = bdot(s.astype(jnp.bfloat16), v, False, jnp.float32)
        # renormalize so the feedback chain stays finite (tiny VPU cost)
        o = o * jax.lax.rsqrt(jnp.mean(o * o) + 1e-6)
        return o.astype(jnp.bfloat16)

    chain("bf16 qk+pv tile chain (8x1024x2048x64)", bf16_body, q, iters, fl_qk + fl_pv)

    # int8: pre-quantized q/k/v; S int32 -> int8 shift; out int32
    qi = (np.asarray(q, np.float32) * 10).astype(np.int8)  # noqa: E501 (values irrelevant to timing)
    ki = (np.asarray(k, np.float32) * 10).astype(np.int8)
    vi = (np.asarray(v, np.float32) * 10).astype(np.int8)
    qi, ki, vi = jnp.asarray(qi), jnp.asarray(ki), jnp.asarray(vi)

    def int8_body(c):
        s = bdot(c, ki, True, jnp.int32)
        p = (s >> 8).astype(jnp.int8)
        o = bdot(p, vi, False, jnp.int32)
        return (o >> 8).astype(jnp.int8)

    chain("int8 qk+pv tile chain (pre-quant, upper bound)", int8_body, qi, iters,
          fl_qk + fl_pv)

    # mixed realism: bf16 q/k with in-loop quantization (what a fused kernel
    # would actually pay: quantize + matmul + dequant)
    def int8_fusedquant_body(c):
        scale = jnp.max(jnp.abs(c), axis=2, keepdims=True) / 127.0 + 1e-9
        cq = jnp.clip(jnp.round(c.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
        s = bdot(cq, ki, True, jnp.int32)
        sf = s.astype(jnp.float32) * scale
        p = jnp.clip(jnp.round(sf / 256.0), -127, 127).astype(jnp.int8)
        o = bdot(p, vi, False, jnp.int32)
        return (o >> 8).astype(jnp.bfloat16)

    chain("int8 qk+pv with in-loop act quant", int8_fusedquant_body, q, iters,
          fl_qk + fl_pv)

    # and the D=128 comparison: does bf16 at d=128 cost the same wall time
    # (confirming the occupancy argument)?
    q2 = jnp.concatenate([q, q], axis=2)
    k2 = jnp.concatenate([k, k], axis=2)
    v2 = jnp.concatenate([v, v], axis=2)

    def bf16_d128_body(c):
        s = bdot(c, k2, True, jnp.float32)
        o = bdot(s.astype(jnp.bfloat16), v2, False, jnp.float32)
        o = o * jax.lax.rsqrt(jnp.mean(o * o) + 1e-6)
        return o.astype(jnp.bfloat16)

    chain("bf16 qk+pv tile chain at d=128 (2x flops)", bf16_d128_body, q2, iters,
          2 * (fl_qk + fl_pv))

    ki2 = jnp.concatenate([ki, ki], axis=2)
    vi2 = jnp.concatenate([vi, vi], axis=2)

    def int8_d128_body(c):
        s = bdot(c, ki2, True, jnp.int32)
        p = (s >> 8).astype(jnp.int8)
        o = bdot(p, vi2, False, jnp.int32)
        return (o >> 8).astype(jnp.int8)

    qi2 = jnp.concatenate([qi, qi], axis=2)
    chain("int8 qk+pv tile chain at d=128 (2x flops)", int8_d128_body, qi2, iters,
          2 * (fl_qk + fl_pv))


if __name__ == "__main__":
    main()
