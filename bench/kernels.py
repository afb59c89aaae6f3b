"""Dev tool: ALiBi flash-attention kernel variant sweep on the real TPU.

Tests correctness (vs the XLA reference) and speed of candidate kernels:
  * block size grid (block_q x block_k),
  * slope-folded positions (bias = -|pq - pk| with per-head pre-scaled
    positions; key-padding folded in as a +BIG sentinel position),
  * direct-bf16 exp output.
Winners get folded back into ops/pallas_attention.py.
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

NEG_INF = -1e9


def _kernel_v2(
    q_ref,       # (1, 1, bq, d)
    k_ref,       # (1, 1, bk, d)
    v_ref,       # (1, 1, bk, d)
    posq_ref,    # (1, 1, bq) f32: slope-scaled positions (+BIG at padded keys)
    posk_ref,    # (1, 1, bk) f32
    o_ref,       # (1, 1, bq, d)
    m_scr, l_scr, acc_scr,
    *, sm_scale: float, n_k: int, variant: str = "full",
):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
    k = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])
    s = jax.lax.dot_general(
        q * jnp.asarray(sm_scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    v_blk = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
    if variant != "mm_only":
        pq = posq_ref[0, 0][:, None]  # (bq, 1) f32, slope-scaled
        pk = posk_ref[0, 0][None, :]  # (1, bk)
        s = s - jnp.abs(pq - pk)
    if variant in ("mm_only", "no_softmax"):
        acc_scr[...] = acc_scr[...] + jax.lax.dot_general(
            s.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(ki == n_k - 1)
        def _finish0():
            o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)

        return

    m_prev = m_scr[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    if variant == "exp_bf16":
        p = jnp.exp((s - m_new).astype(jnp.bfloat16))
        l_new = alpha * l_scr[...] + jnp.sum(
            p.astype(jnp.float32), axis=1, keepdims=True
        )
    else:
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = m_new
    l_scr[...] = l_new

    @pl.when(ki == n_k - 1)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)


def attn_v2(qkv, scaled_pos, block_q, block_k, variant="full"):
    """qkv: (3, B, H, T, D) bf16; scaled_pos: (B, H, T) f32 slope*pos with
    +1e9 at padded keys."""
    _, b, h, t, d = qkv.shape
    n_q, n_k = t // block_q, t // block_k
    # (B*H, 1, T) so the pos block (1, 1, block) satisfies the tiling rule
    sp = scaled_pos.reshape(b * h, 1, t)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, sm_scale=d**-0.5, n_k=n_k, variant=variant),
        grid=(b, h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, 1, block_q, d), lambda bi, hi, qi, ki: (0, bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_k, d), lambda bi, hi, qi, ki: (1, bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, 1, block_k, d), lambda bi, hi, qi, ki: (2, bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi * h + hi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi * h + hi, 0, ki)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(qkv, qkv, qkv, sp, sp)
    return out


def timed(name, f, x, iters=10, flops=None):
    g = jax.jit(
        lambda a0: jax.lax.scan(lambda c, _: (f(c), None), a0, None, length=iters)[0]
        .astype(jnp.float32).mean()
    )
    seeds = [x, x + jnp.asarray(1e-3, x.dtype), x + jnp.asarray(2e-3, x.dtype)]
    np.asarray(g(seeds[0]))
    t0 = time.perf_counter()
    p1 = np.asarray(g(seeds[1]))
    p2 = np.asarray(g(seeds[2]))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(p1) and np.isfinite(p2), name
    extra = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:36s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    from animal2vec_tpu.ops.alibi import alibi_slopes
    from animal2vec_tpu.ops.pallas_attention import (
        _pallas_forward_packed,
        _reference_attention,
    )

    b, h, t, d = 32, 16, 2048, 64
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(3, b, h, t, d)).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    slopes = jnp.asarray(alibi_slopes(h), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    # padding mask imitating trunk pad 2000 -> 2048
    pad = jnp.broadcast_to(jnp.arange(t) >= 2000, (b, t))
    flops = 4 * b * h * t * t * d

    # scaled positions with masked keys pushed to +BIG
    sp = slopes[None, :, None] * pos.astype(jnp.float32)[:, None, :]
    sp = jnp.where(pad[:, None, :], 1e9, sp)

    # correctness vs XLA reference on a small slice
    bs, ts = 2, 512
    qkv_s = qkv[:, :bs, :, :ts]
    pos_s = pos[:bs, :ts]
    pad_s = jnp.broadcast_to(jnp.arange(ts) >= 500, (bs, ts))
    sp_s = slopes[None, :, None] * pos_s.astype(jnp.float32)[:, None, :]
    sp_s = jnp.where(pad_s[:, None, :], 1e9, sp_s)
    ref = _reference_attention(
        jnp.swapaxes(qkv_s[0], 1, 2), jnp.swapaxes(qkv_s[1], 1, 2),
        jnp.swapaxes(qkv_s[2], 1, 2), slopes, pos_s, pad_s,
    )  # (B, T, H, D)
    got = attn_v2(qkv_s, sp_s, 256, 512)  # (B, H, T, D)
    got = jnp.swapaxes(got, 1, 2)
    err = np.max(np.abs(np.asarray(ref[:, :500], np.float32) - np.asarray(got[:, :500], np.float32)))
    print(f"v2 correctness max abs err (valid rows): {err:.5f}", flush=True)
    assert err < 0.02, err

    # current kernel baseline
    def cur(q3):
        o = _pallas_forward_packed(q3, slopes, pos, pad, has_sentinel=False)
        return q3 + (o.astype(jnp.float32).mean() * 0.0).astype(q3.dtype)

    timed("current (bq1024,bk2048)", cur, qkv, flops=flops)

    for variant in ["mm_only", "no_softmax", "exp_bf16", "full"]:
        for bq, bk in [(1024, 1024), (1024, 2048)]:
            def f(q3, bq=bq, bk=bk, variant=variant):
                o = attn_v2(q3, sp, bq, bk, variant)
                return q3 + (o.astype(jnp.float32).mean() * 0.0).astype(q3.dtype)

            timed(f"v2 {variant} (bq{bq},bk{bk})", f, qkv, flops=flops)

    print("done")


if __name__ == "__main__":
    main()
