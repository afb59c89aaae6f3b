"""Fused transformer-MLP Pallas kernel: x @ W1 -> GELU -> @ W2 in VMEM.

Why this exists (measured, bench/int8_slope.py 2026-08-19, slope-fit):

* a bf16 (65536x1024x4096) + GELU + (65536x4096x1024) MLP runs at
  137 TFLOP/s while the same two matmuls without the GELU run at 179 —
  the un-fused GELU costs ~1.9 ms per MLP pair: XLA round-trips the
  (T, 4M) intermediate through HBM (~1.3 ms at 819 GB/s) and serializes
  the erf VPU pass;
* the int8 path is hit even harder: 379 TFLOP/s pre-quantized drops to
  138 with the XLA-composed GELU between the dots.

This kernel never materializes the intermediate: for each row tile the
first product, bias, exact GELU, (optional re-quantization,) and the
second product all happen in VMEM, accumulating the second matmul over
hidden-dim chunks — the same grid structure as flash attention
(row-parallel, hidden-chunk innermost/arbitrary).

Numerics:
* bf16 mode: MXU bf16 x bf16 -> fp32 accumulation, GELU in fp32 — at
  least as accurate as the XLA path (which applies GELU in bf16).
* int8 mode: per-output-channel symmetric weight scales (pre-quantized,
  loop-invariant) + per-row dynamic activation scales, rounded exactly as
  models/modules.quantized_matmul; the hidden activation re-quantizes
  per (row, chunk) after GELU.

Serving replacement for the reference Mlp (timm Mlp consumed at
/root/reference/nn/modalities/modules.py:296,312-317).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7): Mosaic has
    no erf primitive, but exp is native VPU. fp32 in/out."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # 0.5 * x * (1 + erf(x / sqrt(2))) in fp32 (reference nn.GELU default;
    # the A&S erf's 1.5e-7 deviation is far inside the 1e-3 parity budget)
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel_int8(
    x_ref,     # VMEM (bn, C1) storage dtype
    w1_ref,    # VMEM (C1, bm) int8
    w1s_ref,   # VMEM (1, bm) f32
    b1_ref,    # VMEM (1, bm) f32
    w2_ref,    # VMEM (bm, C2) int8
    w2s_ref,   # VMEM (1, C2) f32
    b2_ref,    # VMEM (1, C2) f32
    o_ref,     # VMEM (bn, C2) out dtype
    xq_scr,    # VMEM (bn, C1) int8
    xs_scr,    # VMEM (bn, 1) f32
    acc_scr,   # VMEM (bn, C2) f32
    *,
    n_m: int,
):
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _init():
        x = x_ref[...].astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0, 1e-12)
        xs_scr[...] = s
        xq_scr[...] = jnp.round(x / s).astype(jnp.int8)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    h = jax.lax.dot_general(
        xq_scr[...], w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    h = h * xs_scr[...] * w1s_ref[...] + b1_ref[...]
    h = _gelu_exact(h)
    hs = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0, 1e-12)
    hq = jnp.round(h / hs).astype(jnp.int8)
    acc = jax.lax.dot_general(
        hq, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc_scr[...] += acc * hs * w2s_ref[...]

    @pl.when(mi == n_m - 1)
    def _finish():
        o_ref[...] = (acc_scr[...] + b2_ref[...]).astype(o_ref.dtype)


def _kernel_bf16(
    x_ref,     # VMEM (bn, C1)
    w1_ref,    # VMEM (C1, bm) bf16
    b1_ref,    # VMEM (1, bm) f32
    w2_ref,    # VMEM (bm, C2) bf16
    b2_ref,    # VMEM (1, C2) f32
    o_ref,     # VMEM (bn, C2)
    acc_scr,   # VMEM (bn, C2) f32
    *,
    n_m: int,
):
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    h = jax.lax.dot_general(
        x_ref[...], w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _gelu_exact(h + b1_ref[...])
    acc_scr[...] += jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(mi == n_m - 1)
    def _finish():
        o_ref[...] = (acc_scr[...] + b2_ref[...]).astype(o_ref.dtype)


def _hash_keep(seed, rows, cols, rate: float):
    """Murmur-style finalizer keep mask over (seed, global_row, global_col) —
    the same construction as the attention kernel's in-kernel dropout
    (ops/pallas_attention._dropout_keep). Pure uint32 VPU ops, so the exact
    mask regenerates in the XLA recompute backward regardless of tiling.
    rows: (bn, 1) int32 global row indices; cols: (1, bk) int32."""
    z = (
        rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + cols.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    )
    z = z ^ seed.astype(jnp.uint32)
    z = z ^ (z >> 15)
    z = z * jnp.uint32(0x2C1B3C6D)
    z = z ^ (z >> 12)
    z = z * jnp.uint32(0x297A2D39)
    z = z ^ (z >> 15)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return (z >= thresh).astype(jnp.float32)


def _ln_rows(xf, s_ref, b_ref, eps):
    """Row-wise fp32 LayerNorm with affine (Fp32LayerNorm semantics:
    fp32 stats regardless of storage dtype)."""
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * s_ref[...] + b_ref[...]


def _kernel_bf16_block(
    *refs,
    # refs (dropout variant prepends seed_ref):
    #   [seed_ref]  SMEM (3,) int32 — [act after-GELU, act after-fc2, post-mlp]
    #   x_ref       VMEM (bn, C) — post-attention residual stream
    #   l1s_ref     VMEM (1, C) f32  LN1 scale
    #   l1b_ref     VMEM (1, C) f32  LN1 bias
    #   w1_ref      VMEM (C, bm) bf16
    #   b1_ref      VMEM (1, bm) f32
    #   w2_ref      VMEM (bm, C) bf16
    #   b2_ref      VMEM (1, C) f32
    #   l2s_ref     VMEM (1, C) f32  LN2 scale
    #   l2b_ref     VMEM (1, C) f32  LN2 bias
    #   xo_ref      VMEM (bn, C) out — LN2(r + mlp(r))
    #   t_ref       VMEM (bn, C) out — mlp(r) tap (ffn target, pre post-drop)
    #   r_scr       VMEM (bn, C) storage dtype — r = LN1(x) cast back
    #   acc_scr     VMEM (bn, C) f32
    n_m: int,
    eps: float,
    act_rate: float = 0.0,
    post_rate: float = 0.0,
):
    has_drop = act_rate > 0.0 or post_rate > 0.0
    if has_drop:
        seed_ref = refs[0]
        refs = refs[1:]
    (x_ref, l1s_ref, l1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     l2s_ref, l2b_ref, xo_ref, t_ref, r_scr, acc_scr) = refs
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _init():
        r = _ln_rows(x_ref[...].astype(jnp.float32), l1s_ref, l1b_ref, eps)
        r_scr[...] = r.astype(r_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    h = jax.lax.dot_general(
        r_scr[...], w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _gelu_exact(h + b1_ref[...])
    if act_rate > 0.0:
        # activation dropout after GELU (Mlp's nn.Dropout position) — global
        # (row, hidden-col) hash so the recompute backward sees the same mask
        bn, bm = h.shape
        rows = pl.program_id(0) * bn + jax.lax.broadcasted_iota(
            jnp.int32, (bn, 1), 0
        )
        cols = mi * bm + jax.lax.broadcasted_iota(jnp.int32, (1, bm), 1)
        keep = _hash_keep(seed_ref[0], rows, cols, act_rate)
        h = h * (keep / (1.0 - act_rate))
    acc_scr[...] += jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if has_drop:
        # only the pl.program_id-dependent index math is hoisted out of the
        # pl.when closure (interpret mode substitutes pl.program_id at the
        # kernel's top level only); the _hash_keep masks themselves are pure
        # on these indices and run inside _finish so the n_m - 1 earlier
        # grid steps don't evaluate and discard them
        bn_o, c_o = acc_scr.shape
        rows_o = pl.program_id(0) * bn_o + jax.lax.broadcasted_iota(
            jnp.int32, (bn_o, 1), 0
        )
        cols_o = jax.lax.broadcasted_iota(jnp.int32, (1, c_o), 1)

    @pl.when(mi == n_m - 1)
    def _finish():
        tf = acc_scr[...] + b2_ref[...]
        if act_rate > 0.0:
            # Mlp's SECOND dropout site — after fc2, same rate (timm Mlp
            # drop2; reference nn/modalities/modules.py:316 with
            # drop=activation_dropout via nn/data2vec2.py:227). Distinct
            # seed stream from the after-GELU site so the masks are
            # independent.
            fc2_keep = _hash_keep(seed_ref[1], rows_o, cols_o, act_rate)
            tf = tf * (fc2_keep / (1.0 - act_rate))
        t = tf.astype(t_ref.dtype)
        # the tap is the Mlp output (incl. its internal dropouts) PRE
        # post-drop (AltBlock returns t before post_drop; only the residual
        # add sees the post-dropped value)
        t_ref[...] = t
        td = t
        if post_rate > 0.0:
            post_keep = _hash_keep(seed_ref[2], rows_o, cols_o, post_rate)
            td = (
                t.astype(jnp.float32) * (post_keep / (1.0 - post_rate))
            ).astype(t.dtype)
        # z = r + t in storage dtype (matches the XLA path's bf16 add),
        # then LN2 with fp32 stats
        z = (r_scr[...] + td.astype(r_scr.dtype)).astype(jnp.float32)
        xo_ref[...] = _ln_rows(z, l2s_ref, l2b_ref, eps).astype(xo_ref.dtype)


def _kernel_int8_block(
    x_ref,     # VMEM (bn, C) storage dtype
    l1s_ref,   # VMEM (1, C) f32
    l1b_ref,   # VMEM (1, C) f32
    w1_ref,    # VMEM (C, bm) int8
    w1s_ref,   # VMEM (1, bm) f32
    b1_ref,    # VMEM (1, bm) f32
    w2_ref,    # VMEM (bm, C) int8
    w2s_ref,   # VMEM (1, C) f32
    b2_ref,    # VMEM (1, C) f32
    l2s_ref,   # VMEM (1, C) f32
    l2b_ref,   # VMEM (1, C) f32
    xo_ref,    # VMEM (bn, C)
    t_ref,     # VMEM (bn, C)
    r_scr,     # VMEM (bn, C) storage dtype — r = LN1(x)
    xq_scr,    # VMEM (bn, C) int8
    xs_scr,    # VMEM (bn, 1) f32
    acc_scr,   # VMEM (bn, C) f32
    *,
    n_m: int,
    eps: float,
):
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _init():
        r = _ln_rows(x_ref[...].astype(jnp.float32), l1s_ref, l1b_ref, eps)
        r_scr[...] = r.astype(r_scr.dtype)
        # quantize the *cast-back* r (identical to quantized_matmul's view)
        rq = r_scr[...].astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(rq), axis=1, keepdims=True) / 127.0, 1e-12)
        xs_scr[...] = s
        xq_scr[...] = jnp.round(rq / s).astype(jnp.int8)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    h = jax.lax.dot_general(
        xq_scr[...], w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    h = h * xs_scr[...] * w1s_ref[...] + b1_ref[...]
    h = _gelu_exact(h)
    hs = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0, 1e-12)
    hq = jnp.round(h / hs).astype(jnp.int8)
    acc = jax.lax.dot_general(
        hq, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc_scr[...] += acc * hs * w2s_ref[...]

    @pl.when(mi == n_m - 1)
    def _finish():
        t = (acc_scr[...] + b2_ref[...]).astype(t_ref.dtype)
        t_ref[...] = t
        z = (r_scr[...] + t.astype(r_scr.dtype)).astype(jnp.float32)
        xo_ref[...] = _ln_rows(z, l2s_ref, l2b_ref, eps).astype(xo_ref.dtype)


def fused_block_mlp(
    x: jnp.ndarray,                          # (..., C) — post-attention stream
    ln1_scale: Optional[jnp.ndarray],        # (C,) f32 or None (no affine)
    ln1_bias: Optional[jnp.ndarray],
    w1: jnp.ndarray,                         # (C, M) — int8 when w1_scale given
    w2: jnp.ndarray,                         # (M, C)
    b1: Optional[jnp.ndarray],
    b2: Optional[jnp.ndarray],
    ln2_scale: Optional[jnp.ndarray],
    ln2_bias: Optional[jnp.ndarray],
    eps: float = 1e-5,
    w1_scale: Optional[jnp.ndarray] = None,
    w2_scale: Optional[jnp.ndarray] = None,
    # block_n 256 (not the plain kernel's 512): the extra r/tap buffers put
    # the 512-row variant 680 KB over v5e's 16 MB scoped-vmem stack limit
    block_n: int = 256,
    block_m: int = 1024,
    seeds: Optional[jnp.ndarray] = None,     # (3,) int32 [act_fc1, act_fc2, post]
    act_rate: float = 0.0,
    post_rate: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole post-LN MLP sub-block in one kernel:

        r = LN1(x);  t = MLP(r);  x_out = LN2(r + t)

    (AltBlock's post-norm branch, reference nn/modalities/modules.py:318-330).
    Returns ``(x_out, t)`` — ``t`` is the ffn-target layer tap. Versus the
    LN-outside composition this keeps ``r``, ``t`` and ``z = r + t`` out of
    HBM (~0.8 GB/layer at serving shapes). LayerNorm statistics are fp32
    (Fp32LayerNorm semantics); the residual add runs in the storage dtype,
    matching the unfused path bit-for-bit in spirit (bf16 add).

    Training with dropout (bf16 only): pass ``seeds`` (three int32 hash
    seeds) plus static ``act_rate`` (Mlp activation dropout, applied at BOTH
    timm-Mlp sites: after GELU and after fc2) and ``post_rate`` (AltBlock
    post-mlp dropout on the residual branch). The masks are hash-counter
    based so the custom_vjp recompute backward regenerates them exactly
    (reference dropout sites: nn/modalities/modules.py:312-317,330 with
    drop=activation_dropout via nn/data2vec2.py:227)."""
    int8 = w1_scale is not None
    act_rate = float(act_rate)
    post_rate = float(post_rate)
    if act_rate > 0.0 or post_rate > 0.0:
        assert not int8, "in-kernel dropout is bf16-only (int8 is serving-only)"
        assert seeds is not None, "seeds required when a dropout rate is nonzero"
    *lead, c = x.shape
    m = w1.shape[1]
    assert w1.shape[0] == c and w2.shape == (m, c), (x.shape, w1.shape, w2.shape)
    assert c % 128 == 0, c
    block_m = min(block_m, m)
    while m % block_m:
        block_m //= 2
    n = 1
    for d in lead:
        n *= d
    x2 = x.reshape(n, c)
    block_n = min(block_n, _ceil_to(n, 32))

    def vec(v, size, fill):
        if v is None:
            return jnp.full((1, size), fill, jnp.float32)
        return v.astype(jnp.float32).reshape(1, size)

    l1s, l1b = vec(ln1_scale, c, 1.0), vec(ln1_bias, c, 0.0)
    l2s, l2b = vec(ln2_scale, c, 1.0), vec(ln2_bias, c, 0.0)
    b1v, b2v = vec(b1, m, 0.0), vec(b2, c, 0.0)

    if int8:
        xo, t = _pallas_int8_block(
            x2,
            l1s, l1b, w1, w1_scale.astype(jnp.float32).reshape(1, m), b1v,
            w2, w2_scale.astype(jnp.float32).reshape(1, c), b2v, l2s, l2b,
            block_n, block_m, eps,
        )
    else:
        wdt = x.dtype if x.dtype != jnp.float32 else jnp.float32
        xo, t = _fused_block_bf16(
            x2, l1s, l1b, w1.astype(wdt), b1v, w2.astype(wdt), b2v, l2s, l2b,
            seeds, block_n, block_m, eps, act_rate, post_rate,
        )
    return (
        xo.reshape(*lead, c),
        t.reshape(*lead, c),
    )


def _pallas_int8_block(x2, l1s, l1b, w1, w1s, b1v, w2, w2s, b2v, l2s, l2b,
                       block_n, block_m, eps):
    n, c = x2.shape
    m = w1.shape[1]
    n_pad, common = _grid_common(n, c, block_n, block_m, m, x2.dtype)
    common["out_specs"] = [common["out_specs"], common["out_specs"]]
    common["out_shape"] = [common["out_shape"], common["out_shape"]]
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    n_m = common["grid"][1]
    cvec = lambda: pl.BlockSpec((1, c), lambda ni, mi: (0, 0))
    mvec = lambda: pl.BlockSpec((1, block_m), lambda ni, mi: (0, mi))
    xo, t = pl.pallas_call(
        functools.partial(_kernel_int8_block, n_m=n_m, eps=eps),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda ni, mi: (ni, 0)),
            cvec(), cvec(),
            pl.BlockSpec((c, block_m), lambda ni, mi: (0, mi)),
            mvec(), mvec(),
            pl.BlockSpec((block_m, c), lambda ni, mi: (mi, 0)),
            cvec(), cvec(), cvec(), cvec(),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, c), x2.dtype),
            pltpu.VMEM((block_n, c), jnp.int8),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, c), jnp.float32),
        ],
        **common,
    )(x2, l1s, l1b, w1, w1s, b1v, w2, w2s, b2v, l2s, l2b)
    return xo[:n], t[:n]


def _pallas_bf16_block(x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b,
                       block_n, block_m, eps,
                       seeds=None, act_rate=0.0, post_rate=0.0):
    n, c = x2.shape
    m = w1.shape[1]
    n_pad, common = _grid_common(n, c, block_n, block_m, m, x2.dtype)
    common["out_specs"] = [common["out_specs"], common["out_specs"]]
    common["out_shape"] = [common["out_shape"], common["out_shape"]]
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    n_m = common["grid"][1]
    cvec = lambda: pl.BlockSpec((1, c), lambda ni, mi: (0, 0))
    mvec = lambda: pl.BlockSpec((1, block_m), lambda ni, mi: (0, mi))
    has_drop = act_rate > 0.0 or post_rate > 0.0
    in_specs = [
        pl.BlockSpec((block_n, c), lambda ni, mi: (ni, 0)),
        cvec(), cvec(),
        pl.BlockSpec((c, block_m), lambda ni, mi: (0, mi)),
        mvec(),
        pl.BlockSpec((block_m, c), lambda ni, mi: (mi, 0)),
        cvec(), cvec(), cvec(),
    ]
    args = [x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b]
    if has_drop:
        # training path: [act_fc1, act_fc2, post] int32 hash seeds ride SMEM
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, seeds.astype(jnp.int32).reshape(3))
    xo, t = pl.pallas_call(
        functools.partial(
            _kernel_bf16_block, n_m=n_m, eps=eps,
            act_rate=act_rate, post_rate=post_rate,
        ),
        in_specs=in_specs,
        scratch_shapes=[
            pltpu.VMEM((block_n, c), x2.dtype),
            pltpu.VMEM((block_n, c), jnp.float32),
        ],
        **common,
    )(*args)
    return xo[:n], t[:n]


def _ref_block_bf16(x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b, eps,
                    seeds=None, act_rate=0.0, post_rate=0.0):
    """XLA reference of the bf16 block kernel's numerics — the custom_vjp
    recompute backward and the interpret-mode oracle. The hash dropout
    regenerates the kernel's exact masks (global row/col indices match:
    padding rows sit at the end of the padded grid)."""

    def ln(z, s, b):
        zf = z.astype(jnp.float32)
        mean = jnp.mean(zf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(zf - mean), axis=1, keepdims=True)
        return (zf - mean) * jax.lax.rsqrt(var + eps) * s + b

    n = x2.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    r = ln(x2, l1s, l1b).astype(x2.dtype)
    h = jax.lax.dot_general(
        r, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = _gelu_exact(h + b1v)
    if act_rate > 0.0:
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, h.shape[1]), 1)
        h = h * (_hash_keep(seeds[0], rows, cols, act_rate) / (1.0 - act_rate))
    tf = jax.lax.dot_general(
        h.astype(w2.dtype), w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2v
    if act_rate > 0.0:
        # Mlp's second dropout site (after fc2, same rate — timm Mlp drop2)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, tf.shape[1]), 1)
        tf = tf * (_hash_keep(seeds[1], rows, cols, act_rate) / (1.0 - act_rate))
    t = tf.astype(x2.dtype)
    td = t
    if post_rate > 0.0:
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, t.shape[1]), 1)
        keep = _hash_keep(seeds[2], rows, cols, post_rate)
        td = (t.astype(jnp.float32) * (keep / (1.0 - post_rate))).astype(t.dtype)
    z = r + td
    xo = ln(z, l2s, l2b).astype(x2.dtype)
    return xo, t


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def _fused_block_bf16(x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b, seeds,
                      block_n, block_m, eps, act_rate, post_rate):
    return _pallas_bf16_block(
        x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b, block_n, block_m, eps,
        seeds=seeds, act_rate=act_rate, post_rate=post_rate,
    )


def _fused_block_bf16_fwd(x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b, seeds,
                          block_n, block_m, eps, act_rate, post_rate):
    out = _pallas_bf16_block(
        x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b, block_n, block_m, eps,
        seeds=seeds, act_rate=act_rate, post_rate=post_rate,
    )
    return out, (x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b, seeds)


def _fused_block_bf16_bwd(block_n, block_m, eps, act_rate, post_rate, res, g):
    x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b, seeds = res
    _, vjp = jax.vjp(
        lambda *a: _ref_block_bf16(
            *a, eps, seeds=seeds, act_rate=act_rate, post_rate=post_rate
        ),
        x2, l1s, l1b, w1, b1v, w2, b2v, l2s, l2b,
    )
    return vjp(g) + (None,)


_fused_block_bf16.defvjp(_fused_block_bf16_fwd, _fused_block_bf16_bwd)


def _ref_mlp_bf16(x, w1, b1v, b2v, w2):
    """XLA reference of the bf16 kernel's numerics (fp32 accumulation,
    fp32 exact GELU) — used as the custom_vjp recompute backward."""
    h = jax.lax.dot_general(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = _gelu_exact(h + b1v)
    y = jax.lax.dot_general(
        h.astype(w2.dtype), w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y + b2v).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_bf16(x2, w1, b1v, b2v, w2, block_n, block_m):
    return _pallas_bf16(x2, w1, b1v, b2v, w2, block_n, block_m)


def _fused_bf16_fwd(x2, w1, b1v, b2v, w2, block_n, block_m):
    return _pallas_bf16(x2, w1, b1v, b2v, w2, block_n, block_m), (x2, w1, b1v, b2v, w2)


def _fused_bf16_bwd(block_n, block_m, res, g):
    # recompute-based backward through the XLA reference (same numerics);
    # engaged only if a training path ever differentiates the fused MLP
    x2, w1, b1v, b2v, w2 = res
    _, vjp = jax.vjp(_ref_mlp_bf16, x2, w1, b1v, b2v, w2)
    return vjp(g)


_fused_bf16.defvjp(_fused_bf16_fwd, _fused_bf16_bwd)


def fused_mlp(
    x: jnp.ndarray,                      # (..., C1) bf16/f32
    w1: jnp.ndarray,                     # (C1, M) — int8 when w1_scale given
    w2: jnp.ndarray,                     # (M, C2)
    b1: Optional[jnp.ndarray] = None,    # (M,)
    b2: Optional[jnp.ndarray] = None,    # (C2,)
    w1_scale: Optional[jnp.ndarray] = None,  # (M,) f32  -> int8 mode
    w2_scale: Optional[jnp.ndarray] = None,  # (C2,) f32
    block_n: int = 512,
    block_m: int = 1024,
) -> jnp.ndarray:
    """Fused x @ W1 -> +b1 -> GELU(exact) -> @ W2 -> +b2.

    int8 mode when ``w1_scale``/``w2_scale`` are given (weights already
    int8, per-output-channel scales); bf16 mode otherwise. Requires
    C1 % 128 == 0, M % block_m == 0, C2 % 128 == 0.
    """
    int8 = w1_scale is not None
    *lead, c1 = x.shape
    m = w1.shape[1]
    c2 = w2.shape[1]
    assert w1.shape[0] == c1 and w2.shape[0] == m, (x.shape, w1.shape, w2.shape)
    assert c1 % 128 == 0 and c2 % 128 == 0, (c1, c2)
    block_m = min(block_m, m)
    while m % block_m:
        block_m //= 2
    n = 1
    for d in lead:
        n *= d
    x2 = x.reshape(n, c1)
    block_n = min(block_n, _ceil_to(n, 32))

    b1v = (
        jnp.zeros((1, m), jnp.float32) if b1 is None
        else b1.astype(jnp.float32).reshape(1, m)
    )
    b2v = (
        jnp.zeros((1, c2), jnp.float32) if b2 is None
        else b2.astype(jnp.float32).reshape(1, c2)
    )
    if int8:
        out = _pallas_int8(
            x2, w1, w1_scale.astype(jnp.float32).reshape(1, m), b1v,
            w2, w2_scale.astype(jnp.float32).reshape(1, c2), b2v,
            block_n, block_m,
        )
    else:
        wdt = x.dtype if x.dtype != jnp.float32 else jnp.float32
        out = _fused_bf16(
            x2, w1.astype(wdt), b1v, b2v, w2.astype(wdt), block_n, block_m
        )
    return out[:n].reshape(*lead, c2)


def _grid_common(n, c2, block_n, block_m, m, dtype):
    n_pad = _ceil_to(n, block_n)
    grid = (n_pad // block_n, m // block_m)
    return n_pad, dict(
        grid=grid,
        out_specs=pl.BlockSpec((block_n, c2), lambda ni, mi: (ni, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c2), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )


def _pallas_int8(x2, w1, w1s, b1v, w2, w2s, b2v, block_n, block_m):
    n, c1 = x2.shape
    m = w1.shape[1]
    c2 = w2.shape[1]
    n_pad, common = _grid_common(n, c2, block_n, block_m, m, x2.dtype)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_int8, n_m=common["grid"][1]),
        in_specs=[
            pl.BlockSpec((block_n, c1), lambda ni, mi: (ni, 0)),
            pl.BlockSpec((c1, block_m), lambda ni, mi: (0, mi)),
            pl.BlockSpec((1, block_m), lambda ni, mi: (0, mi)),
            pl.BlockSpec((1, block_m), lambda ni, mi: (0, mi)),
            pl.BlockSpec((block_m, c2), lambda ni, mi: (mi, 0)),
            pl.BlockSpec((1, c2), lambda ni, mi: (0, 0)),
            pl.BlockSpec((1, c2), lambda ni, mi: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, c1), jnp.int8),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, c2), jnp.float32),
        ],
        **common,
    )(x2, w1, w1s, b1v, w2, w2s, b2v)
    return out[:n]


def _pallas_bf16(x2, w1, b1v, b2v, w2, block_n, block_m):
    n, c1 = x2.shape
    m = w1.shape[1]
    c2 = w2.shape[1]
    n_pad, common = _grid_common(n, c2, block_n, block_m, m, x2.dtype)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_bf16, n_m=common["grid"][1]),
        in_specs=[
            pl.BlockSpec((block_n, c1), lambda ni, mi: (ni, 0)),
            pl.BlockSpec((c1, block_m), lambda ni, mi: (0, mi)),
            pl.BlockSpec((1, block_m), lambda ni, mi: (0, mi)),
            pl.BlockSpec((block_m, c2), lambda ni, mi: (mi, 0)),
            pl.BlockSpec((1, c2), lambda ni, mi: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, c2), jnp.float32),
        ],
        **common,
    )(x2, w1, b1v, w2, b2v)
    return out[:n]
