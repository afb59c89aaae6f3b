"""Pallas TPU flash attention with inline ALiBi bias.

The reference materializes the full (B, H, T, T) attention-score matrix plus
a cached (B, H, T, T) ALiBi bias in HBM (nn/modalities/modules.py:368-410,
base.py:622-657). For a2v-large inference (T=2000, H=16) the bias alone is
gigabytes at batch 32. This kernel keeps everything in VMEM tiles:

* bias is computed inline as ``-slope_h * |pos_q - pos_k|`` from a per-row
  **position vector** — which also subsumes the reference's ``masked_alibi``
  gather (base.py:681-698): the student keep-set just passes its kept
  positions, and extra (CLS) tokens use negative sentinel positions that
  yield zero bias (base.py:316-324 pads bias with zeros),
* online-softmax accumulation in fp32 scratch (standard flash recipe),
* optional per-key padding via an int8 mask block, with -1e9 masking
  (finite, so fully-padded query rows stay NaN-free like the reference's
  fp32 softmax over -inf rows would not).

The backward pass is the mathematically-identical XLA einsum attention
(custom_vjp); a Pallas backward kernel is a planned optimization — training
sequences are short (pretrain keep-set ~128 tokens) so the forward kernel is
where the HBM win is.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def attention_padded_len(t: int, block_q: int = 1024, block_k: int = 2048) -> int:
    """The sequence length the kernel will pad to. Callers can pad once at
    trunk level (with masked keys) so the per-layer kernel pad is a no-op."""
    bq = min(block_q, _ceil_to(t, 128))
    bk = min(block_k, _ceil_to(t, 128))
    return _ceil_to(t, max(bq, bk))


def _kernel(
    slope_ref,  # SMEM (H, 1): scaled slopes, indexed by the head program id
    q_ref,      # VMEM (1, 1, bq, d)
    k_ref,      # VMEM (1, 1, bk, d)
    v_ref,      # VMEM (1, 1, bk, d)
    pos_q_ref,  # VMEM (1, 1, bq) int32
    pos_k_ref,  # VMEM (1, 1, bk) int32
    mask_ref,   # VMEM (1, 1, bk) int32 (1 = masked/pad)
    o_ref,      # VMEM (1, 1, bq, d)
    m_scr,      # VMEM (bq, 1) f32
    l_scr,      # VMEM (bq, 1) f32
    acc_scr,    # VMEM (bq, d) f32
    *,
    sm_scale: float,
    n_k: int,
    block_q: int,
    block_k: int,
    has_sentinel: bool,
    has_mask: bool,
):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # keep q/k in their storage dtype (bf16) so the MXU runs native bf16
    # matmuls with fp32 accumulation; only softmax runs in fp32.
    # reshape-based reads tolerate both (1,1,bq,d) and packed (1,1,1,bq,d)
    # block shapes.
    q = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
    k = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])
    s = jax.lax.dot_general(
        q * jnp.asarray(sm_scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk) fp32

    slope = slope_ref[pl.program_id(1), 0]
    pos_q = pos_q_ref[0, 0][:, None].astype(jnp.float32)  # (bq, 1)
    pos_k = pos_k_ref[0, 0][None, :].astype(jnp.float32)  # (1, bk)
    bias = -slope * jnp.abs(pos_q - pos_k)
    if has_sentinel:
        # extra tokens carry sentinel position < 0 -> zero bias either side
        sentinel = jnp.logical_or(pos_q < 0, pos_k < 0)
        bias = jnp.where(sentinel, 0.0, bias)
    s = s + bias
    if has_mask:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, NEG_INF, s)

    m_prev = m_scr[...]  # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk)
    l_new = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
    v_blk = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
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


def _pallas_forward(
    q: jnp.ndarray,      # (B, T, H, D) — or (B, H, T, D) with bhtd_layout
    k: jnp.ndarray,
    v: jnp.ndarray,
    slopes: jnp.ndarray,  # (H,) scaled slopes (>=0)
    positions: jnp.ndarray,  # (B, T) int32; -1 = extra token
    padding_mask: Optional[jnp.ndarray],  # (B, T) bool, True = pad
    block_q: int = 1024,
    block_k: int = 2048,
    has_sentinel: bool = True,
    bhtd_layout: bool = False,
) -> jnp.ndarray:
    if bhtd_layout:
        b, h, t, d = q.shape
    else:
        b, t, h, d = q.shape
    dtype = q.dtype
    # block sizes stay multiples of 128 (lane rule for the position/mask
    # vectors); t is padded up to a block multiple with masked keys
    block_q = min(block_q, _ceil_to(t, 128))
    block_k = min(block_k, _ceil_to(t, 128))
    t_pad = _ceil_to(t, max(block_q, block_k))

    def pad_seq(x, value=0, axis=1):
        if t_pad == t:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, t_pad - t)
        return jnp.pad(x, cfg, constant_values=value)

    if bhtd_layout:
        qp, kp, vp = (pad_seq(x, axis=2) for x in (q, k, v))
    else:
        qp = jnp.swapaxes(pad_seq(q), 1, 2)  # (B, H, T, D)
        kp = jnp.swapaxes(pad_seq(k), 1, 2)
        vp = jnp.swapaxes(pad_seq(v), 1, 2)
    # (B, 1, T) layout so the VMEM block (1, 1, block) satisfies the
    # TPU tiling rule (second-to-last dim == full array dim)
    pos = pad_seq(positions.astype(jnp.int32))[:, None, :]
    mask = (
        jnp.zeros((b, t), jnp.int32)
        if padding_mask is None
        else padding_mask.astype(jnp.int32)
    )
    mask = pad_seq(mask, value=1)[:, None, :]

    n_q = t_pad // block_q
    n_k = t_pad // block_k
    slope_arr = slopes.astype(jnp.float32).reshape(h, 1)

    grid = (b, h, n_q, n_k)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    # key padding only matters when a padding mask exists or we padded t
    mask_needed = padding_mask is not None or t_pad != t
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            sm_scale=d**-0.5,
            n_k=n_k,
            block_q=block_q,
            block_k=block_k,
            has_sentinel=has_sentinel,
            has_mask=mask_needed,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, 1), lambda bi, hi, qi, ki: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(slope_arr, qp, kp, vp, pos, pos, mask)
    if bhtd_layout:
        return out[:, :, :t]  # (B, H, T, D)
    return jnp.swapaxes(out, 1, 2)[:, :t]


def _reference_attention(q, k, v, slopes, positions, padding_mask):
    """XLA einsum attention with the identical bias math; used as the
    numerical reference and for the backward pass."""
    d = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32) * (d**-0.5), k.astype(jnp.float32)
    )
    pos = positions.astype(jnp.float32)
    dist = jnp.abs(pos[:, :, None] - pos[:, None, :])  # (B, T, T)
    sentinel = (pos[:, :, None] < 0) | (pos[:, None, :] < 0)
    bias = jnp.where(sentinel, 0.0, -dist)[:, None] * slopes.astype(jnp.float32)[None, :, None, None]
    logits = logits + bias
    if padding_mask is not None:
        logits = jnp.where(padding_mask[:, None, None, :], NEG_INF, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def alibi_flash_attention(
    q, k, v, slopes, positions, padding_mask,
    use_pallas: bool = True, has_sentinel: bool = True,
):
    """Flash attention with inline ALiBi from positions.

    q/k/v: (B, T, H, D); slopes: (H,) scaled per-head slopes;
    positions: (B, T) int32 (-1 sentinel = zero-bias extra token);
    padding_mask: optional (B, T) bool.
    """
    if use_pallas:
        return _pallas_forward(
            q, k, v, slopes, positions, padding_mask, has_sentinel=has_sentinel
        )
    return _reference_attention(q, k, v, slopes, positions, padding_mask)


def _fwd(q, k, v, slopes, positions, padding_mask, use_pallas, has_sentinel):
    out = alibi_flash_attention(
        q, k, v, slopes, positions, padding_mask, use_pallas, has_sentinel
    )
    return out, (q, k, v, slopes, positions, padding_mask)


def _bwd(use_pallas, has_sentinel, res, g):
    q, k, v, slopes, positions, padding_mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, s_: _reference_attention(
            q_, k_, v_, s_, positions, padding_mask
        ),
        q, k, v, slopes,
    )
    dq, dk, dv, ds = vjp(g)
    return dq, dk, dv, ds, None, None


alibi_flash_attention.defvjp(_fwd, _bwd)


def _pallas_forward_packed(
    qkv: jnp.ndarray,  # (3, B, H, T, D)
    slopes: jnp.ndarray,
    positions: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray],
    block_q: int = 1024,
    block_k: int = 2048,
    has_sentinel: bool = True,
) -> jnp.ndarray:
    """Packed-qkv kernel entry: the q/k/v blocks are sliced out of the single
    (3, B, H, T, D) projection output by BlockSpec index maps — no unpack
    copy, one pad instead of three."""
    _, b, h, t, d = qkv.shape
    dtype = qkv.dtype
    block_q = min(block_q, _ceil_to(t, 128))
    block_k = min(block_k, _ceil_to(t, 128))
    t_pad = _ceil_to(t, max(block_q, block_k))
    if t_pad != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        positions_p = jnp.pad(positions.astype(jnp.int32), ((0, 0), (0, t_pad - t)))
    else:
        positions_p = positions.astype(jnp.int32)
    pos = positions_p[:, None, :]
    mask = (
        jnp.zeros((b, t), jnp.int32)
        if padding_mask is None
        else padding_mask.astype(jnp.int32)
    )
    if t_pad != t:
        mask = jnp.pad(mask, ((0, 0), (0, t_pad - t)), constant_values=1)
    mask = mask[:, None, :]

    n_q = t_pad // block_q
    n_k = t_pad // block_k
    mask_needed = padding_mask is not None or t_pad != t
    slope_arr = slopes.astype(jnp.float32).reshape(h, 1)
    interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            sm_scale=d**-0.5, n_k=n_k, block_q=block_q, block_k=block_k,
            has_sentinel=has_sentinel, has_mask=mask_needed,
        ),
        grid=(b, h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((h, 1), lambda bi, hi, qi, ki: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, block_q, d), lambda bi, hi, qi, ki: (0, bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_k, d), lambda bi, hi, qi, ki: (1, bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, 1, block_k, d), lambda bi, hi, qi, ki: (2, bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(slope_arr, qkv, qkv, qkv, pos, pos, mask)
    return out[:, :, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def alibi_flash_attention_packed(qkv, slopes, positions, padding_mask,
                                 has_sentinel: bool = True):
    """custom_vjp wrapper over the packed (3,B,H,T,D) kernel; backward is
    the XLA reference attention on unpacked slices."""
    return _pallas_forward_packed(
        qkv, slopes, positions, padding_mask, has_sentinel=has_sentinel
    )


def _fwd_packed(qkv, slopes, positions, padding_mask, has_sentinel):
    out = alibi_flash_attention_packed(
        qkv, slopes, positions, padding_mask, has_sentinel
    )
    return out, (qkv, slopes, positions, padding_mask)


def _bwd_packed(has_sentinel, res, g):
    qkv, slopes, positions, padding_mask = res

    def ref(qkv_, s_):
        q_, k_, v_ = qkv_[0], qkv_[1], qkv_[2]
        out = _reference_attention(
            jnp.swapaxes(q_, 1, 2), jnp.swapaxes(k_, 1, 2), jnp.swapaxes(v_, 1, 2),
            s_, positions, padding_mask,
        )
        return jnp.swapaxes(out, 1, 2)

    _, vjp = jax.vjp(ref, qkv, slopes)
    dqkv, ds = vjp(g)
    return dqkv, ds, None, None


alibi_flash_attention_packed.defvjp(_fwd_packed, _bwd_packed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def alibi_flash_attention_bhtd(q, k, v, slopes, positions, padding_mask,
                               has_sentinel: bool = True):
    """(B, H, T, D)-layout variant: lets callers einsum qkv projections
    directly into the kernel's native layout, skipping the per-layer
    slice/transpose copies of the BTHD interface."""
    return _pallas_forward(
        q, k, v, slopes, positions, padding_mask,
        has_sentinel=has_sentinel, bhtd_layout=True,
    )


def _fwd_bhtd(q, k, v, slopes, positions, padding_mask, has_sentinel):
    out = alibi_flash_attention_bhtd(
        q, k, v, slopes, positions, padding_mask, has_sentinel
    )
    return out, (q, k, v, slopes, positions, padding_mask)


def _bwd_bhtd(has_sentinel, res, g):
    q, k, v, slopes, positions, padding_mask = res

    def ref(q_, k_, v_, s_):
        out = _reference_attention(
            jnp.swapaxes(q_, 1, 2), jnp.swapaxes(k_, 1, 2), jnp.swapaxes(v_, 1, 2),
            s_, positions, padding_mask,
        )
        return jnp.swapaxes(out, 1, 2)

    _, vjp = jax.vjp(ref, q, k, v, slopes)
    dq, dk, dv, ds = vjp(g)
    return dq, dk, dv, ds, None, None


alibi_flash_attention_bhtd.defvjp(_fwd_bhtd, _bwd_bhtd)
