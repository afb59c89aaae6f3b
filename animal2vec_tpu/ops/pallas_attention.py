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

Training support:

* **Pallas backward kernels** (dq+dslopes pass and dk/dv pass, standard
  flash recipe): the forward saves (out, logsumexp); the backward recomputes
  score tiles in VMEM, so finetune training at T=2048 never materializes the
  (B, H, T, T) matrix the reference's autograd does.
* **In-kernel attention dropout** via a counter-based hash of
  (seed, batch*head, global_row, global_col) — pure uint32 VPU ops, so the
  identical mask regenerates in both backward passes (and in interpret mode
  on CPU, unlike pltpu.prng_*). Probabilities are dropped *after*
  normalization semantics (mask scales exp-weights; the softmax denominator
  uses undropped weights), exactly matching `softmax -> nn.Dropout -> @ v`
  (nn/modalities/modules.py:404-406).
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


def _bcast_positions(positions, b: int):
    """Positions with leading dim 1 mark the batch-uniform (contiguous
    serving) layout; general entries broadcast them to (B, T)."""
    if positions is not None and positions.shape[0] == 1 and b > 1:
        return jnp.broadcast_to(positions, (b,) + positions.shape[1:])
    return positions


def _fwd_blocks(t: int, block_q: int, block_k: int):
    """Forward tile sizes + padded length with the grid-covering invariant:
    the smaller tile divides the larger one, so both divide
    t_pad = ceil(t, max(bq, bk)) and the (n_q, n_k) grid covers every query
    row and key. Without the invariant, e.g. t=1600 with the 1024/2048
    defaults clamps bk to 1664 while bq stays 1024, t_pad = 1664, and
    n_q = 1664 // 1024 = 1 — query rows 1024..1663 are never written
    (silent uninitialized output)."""
    bq = min(block_q, _ceil_to(t, 128))
    bk = min(block_k, _ceil_to(t, 128))
    if bk > bq:
        bk = bk // bq * bq
    elif bq > bk:
        bq = bq // bk * bk
    return bq, bk, _ceil_to(t, max(bq, bk))


def attention_padded_len(t: int, block_q: int = 1024, block_k: int = 2048) -> int:
    """The sequence length the kernel will pad to. Callers can pad once at
    trunk level (with masked keys) so the per-layer kernel pad is a no-op."""
    return _fwd_blocks(t, block_q, block_k)[2]


def _dropout_keep(seed, bh_id, rows, cols, rate: float):
    """Deterministic per-element keep mask: murmur-style finalizer over
    (seed, batch*head, global_row, global_col). Pure uint32 VPU ops — the
    same mask regenerates in forward and both backward passes regardless of
    block layout, and it runs in interpret mode (pltpu.prng_* does not).
    rows: (bq, 1) int32 global q indices; cols: (1, bk) int32."""
    z = (
        rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + cols.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    )
    z = z ^ (seed.astype(jnp.uint32) + bh_id.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    z = z ^ (z >> 15)
    z = z * jnp.uint32(0x2C1B3C6D)
    z = z ^ (z >> 12)
    z = z * jnp.uint32(0x297A2D39)
    z = z ^ (z >> 15)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return (z >= thresh).astype(jnp.float32)  # (bq, bk)


def _tile_bias(slope, pos_q_ref, pos_k_ref, has_sentinel: bool):
    slope_pos_q = pos_q_ref[0, 0][:, None].astype(jnp.float32)  # (bq, 1)
    slope_pos_k = pos_k_ref[0, 0][None, :].astype(jnp.float32)  # (1, bk)
    dist = jnp.abs(slope_pos_q - slope_pos_k)
    if has_sentinel:
        # extra tokens carry sentinel position < 0 -> zero bias either side
        sentinel = jnp.logical_or(slope_pos_q < 0, slope_pos_k < 0)
        dist = jnp.where(sentinel, 0.0, dist)
    return -slope * dist, dist


def _kernel(
    slope_ref,  # SMEM (H, 1): scaled slopes, indexed by the head program id
    seed_ref,   # SMEM (1,) int32 dropout seed
    q_ref,      # VMEM (1, 1, bq, d)
    k_ref,      # VMEM (1, 1, bk, d)
    v_ref,      # VMEM (1, 1, bk, d)
    pos_q_ref,  # VMEM (1, 1, bq) int32
    pos_k_ref,  # VMEM (1, 1, bk) int32
    mask_ref,   # VMEM (1, 1, bk) int32 (1 = masked/pad)
    o_ref,      # VMEM (1, 1, bq, d)
    *rest,      # [lse_ref (1, 1, bq) f32 when save_lse] + m/l/acc scratch
    sm_scale: float,
    n_heads: int,
    n_k: int,
    block_q: int,
    block_k: int,
    has_sentinel: bool,
    has_mask: bool,
    dropout_rate: float,
    save_lse: bool = True,
):
    if save_lse:
        # lse = m + log(l), the residual the Pallas backward recomputes score
        # tiles from; inference (custom_vjp primal) skips the output entirely
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
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
    bias, _ = _tile_bias(slope, pos_q_ref, pos_k_ref, has_sentinel)
    s = s + bias
    if has_mask:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, NEG_INF, s)

    m_prev = m_scr[...]  # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk)
    # softmax denominator always uses the undropped weights (reference
    # applies nn.Dropout after the full softmax, modules.py:404-406)
    l_new = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
    pv = p
    if dropout_rate > 0.0:
        rows = pl.program_id(2) * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        bh = pl.program_id(0) * n_heads + pl.program_id(1)
        keep = _dropout_keep(seed_ref[0], bh, rows, cols, dropout_rate)
        pv = p * (keep / (1.0 - dropout_rate))
    v_blk = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        pv.astype(v_blk.dtype), v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = m_new
    l_scr[...] = l_new

    @pl.when(ki == n_k - 1)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)
        if save_lse:
            lse_ref[0, 0] = (m_scr[...] + jnp.log(l))[:, 0]


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
    dropout_rate: float = 0.0,
    seed: Optional[jnp.ndarray] = None,
    positions_k: Optional[jnp.ndarray] = None,
    save_lse: bool = True,
):
    """Returns (out, lse) with out in the input layout and lse (B, H, T_pad)
    fp32 (consumed by the Pallas backward), or (out, None) with
    ``save_lse=False`` (inference: no residual write). ``positions_k``
    (B, T) lets the key positions differ from the query positions (ring
    attention passes a rotating global key-block offset); defaults to
    ``positions``."""
    if bhtd_layout:
        b, h, t, d = q.shape
    else:
        b, t, h, d = q.shape
    dtype = q.dtype
    positions = _bcast_positions(positions, b)
    positions_k = _bcast_positions(positions_k, b)
    # block sizes stay multiples of 128 (lane rule for the position/mask
    # vectors); t is padded up to a block multiple with masked keys
    block_q, block_k, t_pad = _fwd_blocks(t, block_q, block_k)

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
    pos_k = (
        pos
        if positions_k is None
        else pad_seq(positions_k.astype(jnp.int32))[:, None, :]
    )
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
    seed_arr = (
        jnp.zeros((1,), jnp.int32) if seed is None else seed.reshape(1).astype(jnp.int32)
    )
    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, t_pad, d), dtype)]
    if save_lse:
        # (B*H, 1, T) layout: block (1, 1, bq) satisfies the TPU tiling
        # rule (second-to-last block dim == full array dim)
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q), lambda bi, hi, qi, ki, n_h=h: (bi * n_h + hi, 0, qi)
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((b * h, 1, t_pad), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(
            _kernel,
            sm_scale=d**-0.5,
            n_heads=h,
            n_k=n_k,
            block_q=block_q,
            block_k=block_k,
            has_sentinel=has_sentinel,
            has_mask=mask_needed,
            dropout_rate=dropout_rate,
            save_lse=save_lse,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, 1), lambda bi, hi, qi, ki: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(slope_arr, seed_arr, qp, kp, vp, pos, pos_k, mask)
    out = outs[0]
    lse = outs[1].reshape(b, h, t_pad) if save_lse else None
    if bhtd_layout:
        return out[:, :, :t], lse  # (B, H, T, D)
    return jnp.swapaxes(out, 1, 2)[:, :t], lse


def _bwd_dq_kernel(
    slope_ref, seed_ref,
    q_ref, k_ref, v_ref, do_ref,      # (1,1,bq,d)/(1,1,bk,d)/(1,1,bk,d)/(1,1,bq,d)
    lse_ref, delta_ref,               # (1,1,bq) f32
    pos_q_ref, pos_k_ref, mask_ref,   # (1,1,bq)/(1,1,bk)/(1,1,bk) int32
    dq_ref,                           # (1,1,bq,d)
    dsl_ref,                          # (1,1,1,8,128) f32 per-(b,h) slope grad
    dq_scr, dsl_scr,                  # VMEM (bq,d) f32, (1,1) f32
    *, sm_scale, n_heads, n_k, block_q, block_k,
    has_sentinel, has_mask, dropout_rate,
):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)
        dsl_scr[...] = jnp.zeros_like(dsl_scr)

    q = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
    k = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])
    v = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
    do = do_ref[...].reshape(do_ref.shape[-2], do_ref.shape[-1])
    s = jax.lax.dot_general(
        q * jnp.asarray(sm_scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    slope = slope_ref[pl.program_id(1), 0]
    bias, dist = _tile_bias(slope, pos_q_ref, pos_k_ref, has_sentinel)
    s = s + bias
    if has_mask:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, NEG_INF, s)
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # normalized probs (bq, bk)

    dp = jax.lax.dot_general(  # dO @ V^T -> (bq, bk)
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        rows = pl.program_id(2) * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )
        cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        bh = pl.program_id(0) * n_heads + pl.program_id(1)
        keep = _dropout_keep(seed_ref[0], bh, rows, cols, dropout_rate)
        dp = dp * (keep / (1.0 - dropout_rate))
    ds = p * (dp - delta_ref[0, 0][:, None])  # (bq, bk) f32
    dq_scr[...] += sm_scale * jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dsl_scr[...] += -jnp.sum(ds * dist).reshape(1, 1)

    @pl.when(ki == n_k - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)
        dsl_ref[0, 0, 0] = jnp.broadcast_to(dsl_scr[0, 0], (8, 128))


def _bwd_dkv_kernel(
    slope_ref, seed_ref,
    q_ref, k_ref, v_ref, do_ref,      # q/do indexed by qi; k/v by ki
    lse_ref, delta_ref,               # (1,1,bq) f32, indexed by qi
    pos_q_ref, pos_k_ref, mask_ref,
    dk_ref, dv_ref,                   # (1,1,bk,d)
    dk_scr, dv_scr,                   # VMEM (bk,d) f32
    *, sm_scale, n_heads, n_q, block_q, block_k,
    has_sentinel, has_mask, dropout_rate,
):
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
    k = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])
    v = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
    do = do_ref[...].reshape(do_ref.shape[-2], do_ref.shape[-1])
    s = jax.lax.dot_general(
        q * jnp.asarray(sm_scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    slope = slope_ref[pl.program_id(1), 0]
    bias, _ = _tile_bias(slope, pos_q_ref, pos_k_ref, has_sentinel)
    s = s + bias
    if has_mask:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, NEG_INF, s)
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # (bq, bk)

    pd = p
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        cols = pl.program_id(2) * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        bh = pl.program_id(0) * n_heads + pl.program_id(1)
        keep = _dropout_keep(seed_ref[0], bh, rows, cols, dropout_rate)
        dfac = keep / (1.0 - dropout_rate)
        pd = p * dfac
        dp = dp * dfac
    dv_scr[...] += jax.lax.dot_general(  # P^T @ dO -> (bk, d)
        pd.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, None])
    dk_scr[...] += sm_scale * jax.lax.dot_general(  # dS^T @ Q -> (bk, d)
        ds.astype(q.dtype), q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == n_q - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _pallas_backward(
    q, k, v,                 # (B, H, T, D) — padded to t_pad
    do, out, lse,            # (B, H, T_pad, D) x2, (B, H, T_pad) f32
    slopes, positions, padding_mask,
    t: int,
    block_q: int, block_k: int,
    has_sentinel: bool, dropout_rate: float, seed,
):
    """Flash-attention backward: returns (dq, dk, dv, dslopes) with dq/dk/dv
    (B, H, T, D) trimmed to t. Inputs q/k/v/do/out/lse are already padded
    and in BHTD layout."""
    b, h, t_pad, d = q.shape
    dtype = q.dtype
    positions = _bcast_positions(positions, b)
    n_q = t_pad // block_q
    n_k = t_pad // block_k
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    # (B*H, 1, T) layouts for the per-row vectors (TPU tiling rule)
    lse_r = lse.reshape(b * h, 1, t_pad)
    delta_r = delta.reshape(b * h, 1, t_pad)

    pos = positions.astype(jnp.int32)
    if pos.shape[1] != t_pad:
        pos = jnp.pad(pos, ((0, 0), (0, t_pad - pos.shape[1])))
    pos = pos[:, None, :]
    mask = (
        jnp.zeros((b, positions.shape[1]), jnp.int32)
        if padding_mask is None
        else padding_mask.astype(jnp.int32)
    )
    if mask.shape[1] != t_pad:
        mask = jnp.pad(mask, ((0, 0), (0, t_pad - mask.shape[1])), constant_values=1)
    mask = mask[:, None, :]
    mask_needed = padding_mask is not None or t_pad != t

    slope_arr = slopes.astype(jnp.float32).reshape(h, 1)
    seed_arr = (
        jnp.zeros((1,), jnp.int32) if seed is None else seed.reshape(1).astype(jnp.int32)
    )
    interpret = jax.default_backend() != "tpu"
    common = dict(
        sm_scale=d**-0.5, n_heads=h, has_sentinel=has_sentinel,
        has_mask=mask_needed, dropout_rate=dropout_rate,
        block_q=block_q, block_k=block_k,
    )

    dq, dsl = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, n_k=n_k, **common),
        grid=(b, h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((h, 1), lambda bi, hi, qi, ki: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec(
                (1, 1, block_q), lambda bi, hi, qi, ki, n_h=h: (bi * n_h + hi, 0, qi)
            ),
            pl.BlockSpec(
                (1, 1, block_q), lambda bi, hi, qi, ki, n_h=h: (bi * n_h + hi, 0, qi)
            ),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            # one dsl block PER q block (indexed by qi): writing them all to
            # (bi, hi, 0, 0) would overwrite across qi and keep only the last
            # q block's partial sum — summed over qi outside the kernel.
            # The block's trailing dims are a full (8, 128) register tile:
            # a (..., 1, 128) block violates the TPU lowering rule that the
            # second-to-last block dim be divisible by 8 or span the array.
            pl.BlockSpec(
                (1, 1, 1, 8, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t_pad, d), dtype),
            jax.ShapeDtypeStruct((b, h, n_q, 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(slope_arr, seed_arr, q, k, v, do, lse_r, delta_r, pos, pos, mask)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, n_q=n_q, **common),
        grid=(b, h, n_k, n_q),
        in_specs=[
            pl.BlockSpec((h, 1), lambda bi, hi, ki, qi: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
            pl.BlockSpec(
                (1, 1, block_q), lambda bi, hi, ki, qi, n_h=h: (bi * n_h + hi, 0, qi)
            ),
            pl.BlockSpec(
                (1, 1, block_q), lambda bi, hi, ki, qi, n_h=h: (bi * n_h + hi, 0, qi)
            ),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, ki, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki, qi: (bi, 0, ki)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki, qi: (bi, 0, ki)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t_pad, d), dtype),
            jax.ShapeDtypeStruct((b, h, t_pad, d), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(slope_arr, seed_arr, q, k, v, do, lse_r, delta_r, pos, pos, mask)

    dslopes = dsl[:, :, :, 0, 0].sum(axis=(0, 2))  # (H,)
    return dq[:, :, :t], dk[:, :, :t], dv[:, :, :t], dslopes


def _pad_bhtd(x, t_pad):
    t = x.shape[2]
    if t_pad == t:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))


def _backward_blocks(t_pad: int):
    """Backward tile sizes: largest 128-multiple divisor of t_pad up to 512
    (the bwd kernels hold several (bq,bk) f32 temporaries in VMEM, so tiles
    stay smaller than the forward's)."""
    for blk in (512, 384, 256, 128):
        if t_pad % blk == 0:
            return blk, blk
    return t_pad, t_pad  # t_pad < 128 (t_pad is always a 128-multiple)


def _reference_attention(q, k, v, slopes, positions, padding_mask,
                         dropout_rate: float = 0.0, seed=None):
    """XLA einsum attention with the identical bias (and hash-dropout) math;
    used as the numerical reference and for the non-Pallas backward."""
    b, t, h, d = q.shape
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
    if dropout_rate > 0.0 and seed is not None:
        rows = jnp.arange(t, dtype=jnp.int32).reshape(1, 1, t, 1)
        cols = jnp.arange(t, dtype=jnp.int32).reshape(1, 1, 1, t)
        bh = (
            jnp.arange(b, dtype=jnp.int32).reshape(b, 1, 1, 1) * h
            + jnp.arange(h, dtype=jnp.int32).reshape(1, h, 1, 1)
        )
        keep = _dropout_keep(
            jnp.asarray(seed, jnp.int32).reshape(()), bh, rows, cols, dropout_rate
        )
        probs = probs * (keep / (1.0 - dropout_rate))
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)


def _run_pallas_backward(q_bthd, k_bthd, v_bthd, g_bthd, out_bthd, lse,
                         slopes, positions, padding_mask,
                         has_sentinel, dropout_rate, seed):
    """Shared bwd driver on BTHD tensors; returns (dq, dk, dv, dslopes)."""
    t = q_bthd.shape[1]
    t_pad = lse.shape[-1]
    to_bhtd = lambda x: _pad_bhtd(jnp.swapaxes(x, 1, 2), t_pad)
    bq, bk = _backward_blocks(t_pad)
    dq, dk, dv, dsl = _pallas_backward(
        to_bhtd(q_bthd), to_bhtd(k_bthd), to_bhtd(v_bthd),
        to_bhtd(g_bthd), to_bhtd(out_bthd), lse,
        slopes, positions, padding_mask,
        t=t, block_q=bq, block_k=bk,
        has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed,
    )
    back = lambda x: jnp.swapaxes(x, 1, 2)
    return back(dq), back(dk), back(dv), dsl.astype(slopes.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def alibi_flash_attention(
    q, k, v, slopes, positions, padding_mask,
    use_pallas: bool = True, has_sentinel: bool = True,
    dropout_rate: float = 0.0, seed=None,
):
    """Flash attention with inline ALiBi from positions.

    q/k/v: (B, T, H, D); slopes: (H,) scaled per-head slopes;
    positions: (B, T) int32 (-1 sentinel = zero-bias extra token);
    padding_mask: optional (B, T) bool; dropout_rate + seed enable in-kernel
    attention dropout (hash-based, reproduced exactly in the backward).
    """
    if use_pallas:
        out, _ = _pallas_forward(
            q, k, v, slopes, positions, padding_mask,
            has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed, save_lse=False,
        )
        return out
    return _reference_attention(
        q, k, v, slopes, positions, padding_mask, dropout_rate, seed
    )


def _fwd(q, k, v, slopes, positions, padding_mask, use_pallas, has_sentinel,
         dropout_rate, seed):
    if use_pallas:
        out, lse = _pallas_forward(
            q, k, v, slopes, positions, padding_mask,
            has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed,
        )
        return out, (q, k, v, slopes, positions, padding_mask, seed, out, lse)
    out = _reference_attention(
        q, k, v, slopes, positions, padding_mask, dropout_rate, seed
    )
    return out, (q, k, v, slopes, positions, padding_mask, seed, None, None)


def _bwd(use_pallas, has_sentinel, dropout_rate, res, g):
    q, k, v, slopes, positions, padding_mask, seed, out, lse = res
    if use_pallas:
        dq, dk, dv, dsl = _run_pallas_backward(
            q, k, v, g, out, lse, slopes, positions, padding_mask,
            has_sentinel, dropout_rate, seed,
        )
        return dq, dk, dv, dsl, None, None, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_, s_: _reference_attention(
            q_, k_, v_, s_, positions, padding_mask, dropout_rate, seed
        ),
        q, k, v, slopes,
    )
    dq, dk, dv, ds = vjp(g)
    return dq, dk, dv, ds, None, None, None


alibi_flash_attention.defvjp(_fwd, _bwd)


def _kernel_q8(
    slope_ref,  # SMEM (H, 1)
    q_ref,      # VMEM (1, 1, bq, d) int8 (sm_scale folded into qs)
    k_ref,      # VMEM (1, 1, bk, d) int8
    v_ref,      # VMEM (1, 1, bk, d) int8
    qs_ref,     # VMEM (1, 1, bq) f32 per-row q scales
    ks_ref,     # VMEM (1, 1, bk) f32 per-row k scales
    vs_ref,     # VMEM (1, 1, d) f32 per-channel v scales for this (b, h)
    pos_q_ref,  # VMEM (1, 1, bq) int32
    pos_k_ref,  # VMEM (1, 1, bk) int32
    mask_ref,   # VMEM (1, 1, bk) int32
    o_ref,      # VMEM (1, 1, bq, d)
    m_scr, l_scr, acc_scr,
    *,
    n_k: int,
    has_sentinel: bool,
    has_mask: bool,
):
    """int8 flash attention tile (serving only): both attention matmuls run
    int8 x int8 on the MXU — at head_dim 64 the contraction loads only half
    the systolic rows, so int8's 2x rate doubles the D=64 structural floor
    (docs/PERF.md round-3 correction). Scores dequantize to fp32 before the
    online softmax; probabilities re-quantize at the fixed exp-range scale
    1/127 (row max of exp(s - m_new) is exactly 1)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
    k = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])
    s32 = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bq, bk) int32
    qs = qs_ref[0, 0][:, None]  # (bq, 1)
    ks = ks_ref[0, 0][None, :]  # (1, bk)
    s = s32.astype(jnp.float32) * qs * ks

    slope = slope_ref[pl.program_id(1), 0]
    bias, _ = _tile_bias(slope, pos_q_ref, pos_k_ref, has_sentinel)
    s = s + bias
    if has_mask:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, NEG_INF, s)

    m_prev = m_scr[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk) in [0, 1]
    l_new = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
    p8 = jnp.round(p * 127.0).astype(jnp.int8)
    v_blk = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
    pv32 = jax.lax.dot_general(
        p8, v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    vs = vs_ref[0, 0][None, :]  # (1, d)
    acc_scr[...] = acc_scr[...] * alpha + pv32.astype(jnp.float32) * (vs / 127.0)
    m_scr[...] = m_new
    l_scr[...] = l_new

    @pl.when(ki == n_k - 1)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)


def alibi_flash_attention_int8(
    q: jnp.ndarray,      # (B, T, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    slopes: jnp.ndarray,
    positions: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray] = None,
    has_sentinel: bool = True,
    block_q: int = 1024,
    block_k: int = 2048,
) -> jnp.ndarray:
    """Serving-only int8 flash attention (VERDICT r2 item 2: measured
    in-kernel instead of bounded on paper). q/k quantize per row with
    sm_scale folded into the q scales, v per channel; both MXU products run
    int8. No dropout, no backward — the training paths keep the bf16 kernel.
    """
    b, t, h, d = q.shape
    dtype = q.dtype
    positions = _bcast_positions(positions, b)
    block_q, block_k, t_pad = _fwd_blocks(t, block_q, block_k)

    def pad_seq(x, value=0, axis=1):
        if t_pad == t:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, t_pad - t)
        return jnp.pad(x, cfg, constant_values=value)

    def quant_rows(x, fold=1.0):
        """(B, H, T, D) -> int8 values + (B*H, 1, T) f32 scales."""
        x32 = x.astype(jnp.float32) * fold
        s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1) / 127.0, 1e-12)  # (B,H,T)
        x8 = jnp.round(x32 / s[..., None]).astype(jnp.int8)
        return x8, s.reshape(b * h, 1, t_pad)

    qp = jnp.swapaxes(pad_seq(q), 1, 2)  # (B, H, T_pad, D)
    kp = jnp.swapaxes(pad_seq(k), 1, 2)
    vp = jnp.swapaxes(pad_seq(v), 1, 2)
    q8, qs = quant_rows(qp, fold=d**-0.5)
    k8, ks = quant_rows(kp)
    v32 = vp.astype(jnp.float32)
    vs = jnp.maximum(jnp.max(jnp.abs(v32), axis=2) / 127.0, 1e-12)  # (B,H,D)
    v8 = jnp.round(v32 / vs[:, :, None, :]).astype(jnp.int8)
    vs = vs.reshape(b * h, 1, d)

    pos = pad_seq(positions.astype(jnp.int32))[:, None, :]
    mask = (
        jnp.zeros((b, t), jnp.int32)
        if padding_mask is None
        else padding_mask.astype(jnp.int32)
    )
    mask = pad_seq(mask, value=1)[:, None, :]
    mask_needed = padding_mask is not None or t_pad != t

    n_k = t_pad // block_k
    grid = (b, h, t_pad // block_q, n_k)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _kernel_q8,
            n_k=n_k,
            has_sentinel=has_sentinel,
            has_mask=mask_needed,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, 1), lambda bi, hi, qi, ki: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec(
                (1, 1, block_q), lambda bi, hi, qi, ki, n_h=h: (bi * n_h + hi, 0, qi)
            ),
            pl.BlockSpec(
                (1, 1, block_k), lambda bi, hi, qi, ki, n_h=h: (bi * n_h + hi, 0, ki)
            ),
            pl.BlockSpec(
                (1, 1, d), lambda bi, hi, qi, ki, n_h=h: (bi * n_h + hi, 0, 0)
            ),
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
    )(
        slopes.astype(jnp.float32).reshape(h, 1),
        q8, k8, v8, qs, ks, vs, pos, pos, mask,
    )
    return jnp.swapaxes(out, 1, 2)[:, :t]


def _kernel_serve_nk1(
    slope_ref,  # SMEM (H, 1): scaled slopes
    q_ref,      # VMEM (1, 1, 1, bq, d) packed slice
    k_ref,      # VMEM (1, 1, 1, bk, d)
    v_ref,      # VMEM (1, 1, 1, bk, d)
    pos_q_ref,  # VMEM (1, 1, bq) int32 (batch-uniform: row 0)
    pos_k_ref,  # VMEM (1, 1, bk) int32
    mask_ref,   # VMEM (1, 1, bk) int32 (1 = masked/pad)
    o_ref,      # VMEM (1, 1, bq, d)
    ndist_scr,  # VMEM (bq, bk) f32 — cached -|pos_q - pos_k| tile
    *,
    sm_scale: float,
    has_sentinel: bool,
    has_mask: bool,
):
    """Serving fast path: batch-uniform positions, one key block (T <=
    block_k — every 10-s serving window), no dropout, no lse. The negated
    ALiBi distance tile is computed ONCE per q block and reused across the
    whole (b, h) sweep from VMEM scratch (grid order (qi, b, h), all
    arbitrary), so the per-program bias cost collapses from the
    sub/abs/sentinel-select chain to a single fused multiply-add; the
    single-key-block softmax also drops the online-softmax rescale
    bookkeeping (m/l carry, alpha, acc RMW). Measured vs the general kernel
    at serving shape in docs/PERF.md (round 4, "ALiBi Toeplitz lever")."""
    bi = pl.program_id(1)
    hi = pl.program_id(2)

    @pl.when((bi == 0) & (hi == 0))
    def _dist():
        pq = pos_q_ref[0, 0][:, None].astype(jnp.float32)
        pk = pos_k_ref[0, 0][None, :].astype(jnp.float32)
        nd = -jnp.abs(pq - pk)
        if has_sentinel:
            # extra tokens carry sentinel position < 0 -> zero bias
            nd = jnp.where(jnp.logical_or(pq < 0, pk < 0), 0.0, nd)
        ndist_scr[...] = nd

    q = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
    k = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])
    s = jax.lax.dot_general(
        q * jnp.asarray(sm_scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk) fp32
    slope = slope_ref[hi, 0]
    s = s + slope * ndist_scr[...]
    if has_mask:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, NEG_INF, s)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    v_blk = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
    acc = jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _pallas_serve_nk1(qkv, slope_arr, pos, mask, t_pad, block_q, block_k,
                      has_sentinel, mask_needed, uniform_mask, interpret):
    """pallas_call wrapper for _kernel_serve_nk1. ``pos`` is (1, 1, T_pad)
    (batch-uniform); ``mask`` is (1, 1, T_pad) when uniform_mask else
    (B, 1, T_pad)."""
    _, b, h, t_stored, d = qkv.shape
    grid = (t_pad // block_q, b, h)
    outs = pl.pallas_call(
        functools.partial(
            _kernel_serve_nk1,
            sm_scale=d**-0.5, has_sentinel=has_sentinel,
            has_mask=mask_needed,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, 1), lambda qi, bi, hi: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, block_q, d), lambda qi, bi, hi: (0, bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_k, d), lambda qi, bi, hi: (1, bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, block_k, d), lambda qi, bi, hi: (2, bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_q), lambda qi, bi, hi: (0, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda qi, bi, hi: (0, 0, 0)),
            pl.BlockSpec(
                (1, 1, block_k),
                (lambda qi, bi, hi: (0, 0, 0))
                if uniform_mask
                else (lambda qi, bi, hi: (bi, 0, 0)),
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda qi, bi, hi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, block_k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # all-arbitrary: sequential grid order is what lets the distance
            # scratch persist across the inner (b, h) sweep
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(slope_arr, qkv, qkv, qkv, pos, pos, mask)
    return outs


def _pallas_forward_packed(
    qkv: jnp.ndarray,  # (3, B, H, T, D)
    slopes: jnp.ndarray,
    positions: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray],
    block_q: int = 1024,
    block_k: int = 2048,
    has_sentinel: bool = True,
    dropout_rate: float = 0.0,
    seed: Optional[jnp.ndarray] = None,
    save_lse: bool = True,
):
    """Packed-qkv kernel entry: the q/k/v blocks are sliced out of the single
    (3, B, H, T, D) projection output by BlockSpec index maps — no unpack
    copy, one pad instead of three. Returns (out, lse) — lse None with
    ``save_lse=False`` (inference).

    ``positions`` with leading dim 1 marks batch-uniform positions (the
    unmasked contiguous serving layout): with one key block, no dropout and
    no lse, the call routes to the _kernel_serve_nk1 fast path."""
    _, b, h, t, d = qkv.shape
    dtype = qkv.dtype
    uniform = positions.shape[0] == 1
    block_q, block_k, t_pad = _fwd_blocks(t, block_q, block_k)
    if t_pad != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        positions_p = jnp.pad(positions.astype(jnp.int32), ((0, 0), (0, t_pad - t)))
    else:
        positions_p = positions.astype(jnp.int32)
    pos = positions_p[:, None, :]
    uniform_mask = padding_mask is None
    mask = (
        jnp.zeros((1 if uniform_mask else b, t), jnp.int32)
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
    seed_arr = (
        jnp.zeros((1,), jnp.int32) if seed is None else seed.reshape(1).astype(jnp.int32)
    )
    interpret = jax.default_backend() != "tpu"

    import os as _os

    if (
        uniform
        and n_k == 1
        and dropout_rate == 0.0
        and not save_lse
        and _os.environ.get("A2V_SERVE_NK1", "1") != "0"
    ):
        # serving fast path: the distance tile is computed once per q block
        # and reused across the (b, h) sweep; block_q 512 keeps the fp32
        # scratch + score temps inside the scoped-VMEM budget. bq_s must
        # divide t_pad (grid = t_pad // bq_s) — step down to a divisor for
        # lengths that are not 512-multiples (e.g. t_pad=896 -> bq_s=128)
        bq_s = min(512, block_q)
        while t_pad % bq_s:
            bq_s -= 128
        out = _pallas_serve_nk1(
            qkv, slope_arr, pos, mask, t_pad, bq_s, block_k,
            has_sentinel, mask_needed, uniform_mask, interpret,
        )
        return out[:, :, :t], None

    # general kernel: positions/mask blocks are indexed per batch row
    if uniform and b > 1:
        pos = jnp.broadcast_to(pos, (b, 1, t_pad))
    if uniform_mask and b > 1:
        mask = jnp.broadcast_to(mask, (b, 1, t_pad))

    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, t_pad, d), dtype)]
    if save_lse:
        # (B*H, 1, T) layout: block (1, 1, bq) satisfies the TPU tiling
        # rule (second-to-last block dim == full array dim)
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q), lambda bi, hi, qi, ki, n_h=h: (bi * n_h + hi, 0, qi)
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((b * h, 1, t_pad), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(
            _kernel,
            sm_scale=d**-0.5, n_heads=h, n_k=n_k, block_q=block_q,
            block_k=block_k, has_sentinel=has_sentinel, has_mask=mask_needed,
            dropout_rate=dropout_rate, save_lse=save_lse,
        ),
        grid=(b, h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((h, 1), lambda bi, hi, qi, ki: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, block_q, d), lambda bi, hi, qi, ki: (0, bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_k, d), lambda bi, hi, qi, ki: (1, bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, 1, block_k, d), lambda bi, hi, qi, ki: (2, bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(slope_arr, seed_arr, qkv, qkv, qkv, pos, pos, mask)
    out = outs[0]
    lse = outs[1].reshape(b, h, t_pad) if save_lse else None
    return out[:, :, :t], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def alibi_flash_attention_packed(qkv, slopes, positions, padding_mask,
                                 has_sentinel: bool = True,
                                 dropout_rate: float = 0.0, seed=None):
    """custom_vjp wrapper over the packed (3,B,H,T,D) kernel; backward runs
    the Pallas flash backward kernels on the unpacked slices."""
    out, _ = _pallas_forward_packed(
        qkv, slopes, positions, padding_mask,
        has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed, save_lse=False,
    )
    return out


def _fwd_packed(qkv, slopes, positions, padding_mask, has_sentinel,
                dropout_rate, seed):
    out, lse = _pallas_forward_packed(
        qkv, slopes, positions, padding_mask,
        has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed,
    )
    return out, (qkv, slopes, positions, padding_mask, seed, out, lse)


def _bwd_packed(has_sentinel, dropout_rate, res, g):
    qkv, slopes, positions, padding_mask, seed, out, lse = res
    t_pad = lse.shape[-1]
    bq, bk = _backward_blocks(t_pad)
    t = qkv.shape[3]
    qh = _pad_bhtd(qkv[0], t_pad)
    kh = _pad_bhtd(qkv[1], t_pad)
    vh = _pad_bhtd(qkv[2], t_pad)
    dq, dk, dv, dsl = _pallas_backward(
        qh, kh, vh, _pad_bhtd(g, t_pad), _pad_bhtd(out, t_pad), lse,
        slopes, positions, padding_mask,
        t=t, block_q=bq, block_k=bk,
        has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed,
    )
    dqkv = jnp.stack([dq, dk, dv], axis=0).astype(qkv.dtype)
    return dqkv, dsl.astype(slopes.dtype), None, None, None


alibi_flash_attention_packed.defvjp(_fwd_packed, _bwd_packed)


def _btc_to_packed(qkv_btc: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, c3 = qkv_btc.shape
    e = c3 // (3 * heads)
    return jnp.transpose(qkv_btc.reshape(b, t, 3, heads, e), (2, 0, 3, 1, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6))
def alibi_flash_attention_btc(qkv_btc, heads: int, slopes, positions,
                              padding_mask, has_sentinel: bool = True,
                              dropout_rate: float = 0.0, seed=None):
    """Training-path entry with **lane-dense residuals**: takes the fused
    (B, T, 3C) qkv projection, returns (B, T, C).

    The packed (3, B, H, T, 64) layout the kernel consumes pads its last dim
    to 128 lanes — storing it as an autodiff residual costs 2x its logical
    size (the dominant allocation in the no-remat finetune HBM dump). This
    wrapper keeps the residuals in (B, T, 3C)/(B, T, C) form (no padding)
    and re-derives the kernel layouts inside fwd and bwd; the transposes are
    cheap relayouts XLA fuses into the adjacent projection matmuls."""
    b, t, c3 = qkv_btc.shape
    out, _ = _pallas_forward_packed(
        _btc_to_packed(qkv_btc, heads), slopes, positions, padding_mask,
        has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed, save_lse=False,
    )  # (B, H, T, E)
    return jnp.swapaxes(out, 1, 2).reshape(b, t, c3 // 3)


def _fwd_btc(qkv_btc, heads, slopes, positions, padding_mask, has_sentinel,
             dropout_rate, seed):
    b, t, c3 = qkv_btc.shape
    out, lse = _pallas_forward_packed(
        _btc_to_packed(qkv_btc, heads), slopes, positions, padding_mask,
        has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed,
    )
    out_btc = jnp.swapaxes(out, 1, 2).reshape(b, t, c3 // 3)
    return out_btc, (qkv_btc, slopes, positions, padding_mask, seed, out_btc, lse)


def _bwd_btc(heads, has_sentinel, dropout_rate, res, g):
    qkv_btc, slopes, positions, padding_mask, seed, out_btc, lse = res
    b, t, c3 = qkv_btc.shape
    e = c3 // (3 * heads)
    t_pad = lse.shape[-1]
    packed = _btc_to_packed(qkv_btc, heads)
    to_bhtd = lambda x: _pad_bhtd(
        jnp.swapaxes(x.reshape(b, t, heads, e), 1, 2), t_pad
    )
    bq, bk = _backward_blocks(t_pad)
    dq, dk, dv, dsl = _pallas_backward(
        _pad_bhtd(packed[0], t_pad), _pad_bhtd(packed[1], t_pad),
        _pad_bhtd(packed[2], t_pad),
        to_bhtd(g), to_bhtd(out_btc), lse,
        slopes, positions, padding_mask,
        t=t, block_q=bq, block_k=bk,
        has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed,
    )
    back = lambda x: jnp.swapaxes(x, 1, 2).reshape(b, t, heads * e)
    dqkv = jnp.concatenate([back(dq), back(dk), back(dv)], axis=-1).astype(qkv_btc.dtype)
    return dqkv, dsl.astype(slopes.dtype), None, None, None


alibi_flash_attention_btc.defvjp(_fwd_btc, _bwd_btc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def alibi_flash_attention_bhtd(q, k, v, slopes, positions, padding_mask,
                               has_sentinel: bool = True,
                               dropout_rate: float = 0.0, seed=None):
    """(B, H, T, D)-layout variant: lets callers einsum qkv projections
    directly into the kernel's native layout, skipping the per-layer
    slice/transpose copies of the BTHD interface."""
    out, _ = _pallas_forward(
        q, k, v, slopes, positions, padding_mask,
        has_sentinel=has_sentinel, bhtd_layout=True,
        dropout_rate=dropout_rate, seed=seed, save_lse=False,
    )
    return out


def _fwd_bhtd(q, k, v, slopes, positions, padding_mask, has_sentinel,
              dropout_rate, seed):
    out, lse = _pallas_forward(
        q, k, v, slopes, positions, padding_mask,
        has_sentinel=has_sentinel, bhtd_layout=True,
        dropout_rate=dropout_rate, seed=seed,
    )
    return out, (q, k, v, slopes, positions, padding_mask, seed, out, lse)


def _bwd_bhtd(has_sentinel, dropout_rate, res, g):
    q, k, v, slopes, positions, padding_mask, seed, out, lse = res
    t_pad = lse.shape[-1]
    bq, bk = _backward_blocks(t_pad)
    t = q.shape[2]
    dq, dk, dv, dsl = _pallas_backward(
        _pad_bhtd(q, t_pad), _pad_bhtd(k, t_pad), _pad_bhtd(v, t_pad),
        _pad_bhtd(g, t_pad), _pad_bhtd(out, t_pad), lse,
        slopes, positions, padding_mask,
        t=t, block_q=bq, block_k=bk,
        has_sentinel=has_sentinel, dropout_rate=dropout_rate, seed=seed,
    )
    return dq, dk, dv, dsl.astype(slopes.dtype), None, None, None


alibi_flash_attention_bhtd.defvjp(_fwd_bhtd, _bwd_bhtd)
