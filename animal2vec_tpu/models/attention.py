"""Attention kernel dispatch: XLA einsum vs Pallas TPU flash attention.

Numerics contract (parity with nn/modalities/modules.py:368-410):
  logits = (q * head_dim**-0.5) @ k^T  + bias  [+ -inf at padding]
  softmax in float32, output cast back to the compute dtype.

The flash path uses jax's Pallas TPU flash-attention kernel with an additive
bias (`ab`), which keeps the O(T^2) score matrix in VMEM tiles instead of HBM
— the reference materializes it (torch `attn = q @ k^T`). Sequences are
padded up to the kernel block size with fully-masked rows/cols.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

NEG_INF = -1e10


import flax.struct


@flax.struct.dataclass
class AlibiSpec:
    """Structured ALiBi bias: ``bias[b,h,i,j] = -slopes[h] * |pos[b,i] -
    pos[b,j]|`` (zero when either position is the -1 extra-token sentinel).

    Carrying (slopes, positions) instead of a dense (B,H,T,T) tensor is what
    lets the Pallas kernel compute the bias inline; it also expresses the
    reference's masked_alibi gather (nn/modalities/base.py:681-698) as plain
    position gathering. ``has_sentinel`` is static so the kernel can skip
    the sentinel select when no extra tokens exist."""

    slopes: jnp.ndarray     # (H,) scaled per-head slopes
    positions: jnp.ndarray  # (B, T) int32
    has_sentinel: bool = flax.struct.field(pytree_node=False, default=False)

    def scale_heads(self, scale: jnp.ndarray) -> "AlibiSpec":
        return self.replace(slopes=self.slopes * scale.reshape(-1))

    def densify(self) -> jnp.ndarray:
        """(B, H, T, T) dense bias — the XLA/CPU fallback path."""
        pos = self.positions.astype(jnp.float32)
        dist = jnp.abs(pos[:, :, None] - pos[:, None, :])
        base = -dist
        if self.has_sentinel:
            sentinel = (pos[:, :, None] < 0) | (pos[:, None, :] < 0)
            base = jnp.where(sentinel, 0.0, base)
        return base[:, None] * self.slopes.astype(jnp.float32)[None, :, None, None]


Bias = Union[jnp.ndarray, AlibiSpec, None]


def _on_tpu() -> bool:
    # A2V_FLASH_INTERPRET=1 forces the Pallas attention paths on a CPU
    # backend (the kernels then run in interpret mode) — model-level
    # drives/tests of kernel routing without a TPU.
    import os

    if os.environ.get("A2V_FLASH_INTERPRET") == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    padding_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(B, T, H, D) attention via einsum; fp32 softmax."""
    b, t, h, d = q.shape
    dtype = q.dtype
    scale = d**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if padding_mask is not None:
        # padding_mask: (B, T) True = pad
        logits = jnp.where(padding_mask[:, None, None, :], NEG_INF, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.lru_cache(maxsize=1)
def _flash_attention_fn():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    return flash_attention, BlockSizes


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention_tpu(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pallas flash attention on (B, T, H, D); pads T to a block multiple."""
    flash, BlockSizes = _flash_attention_fn()
    b, t, h, d = q.shape
    dtype = q.dtype
    block = 512 if t >= 512 else 128
    t_pad = _round_up(t, block)

    def pad_t(x):
        if t_pad == t:
            return x
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))

    qp, kp, vp = (jnp.swapaxes(pad_t(x), 1, 2) for x in (q, k, v))  # (B,H,T,D)

    ab = None
    if bias is not None or padding_mask is not None or t_pad != t:
        ab = jnp.zeros((b, h, t_pad, t_pad), jnp.float32)
        if bias is not None:
            bias_b = jnp.broadcast_to(bias.astype(jnp.float32), (b, h, t, t))
            ab = ab.at[:, :, :t, :t].set(bias_b)
        key_pad = jnp.zeros((b, t_pad), bool)
        if t_pad != t:
            key_pad = key_pad.at[:, t:].set(True)
        if padding_mask is not None:
            key_pad = key_pad.at[:, :t].set(key_pad[:, :t] | padding_mask)
        ab = jnp.where(key_pad[:, None, None, :], NEG_INF, ab)

    block_sizes = BlockSizes(
        block_q=min(block, t_pad),
        block_k_major=min(block, t_pad),
        block_k=min(block, t_pad),
        block_b=1,
        block_q_major_dkv=min(block, t_pad),
        block_k_major_dkv=min(block, t_pad),
        block_k_dkv=min(block, t_pad),
        block_q_dkv=min(block, t_pad),
        block_k_major_dq=min(block, t_pad),
        block_k_dq=min(block, t_pad),
        block_q_dq=min(block, t_pad),
    )
    out = flash(
        qp.astype(dtype),
        kp.astype(dtype),
        vp.astype(dtype),
        ab=ab,
        causal=False,
        sm_scale=d**-0.5,
        block_sizes=block_sizes,
    )
    out = jnp.swapaxes(out, 1, 2)[:, :t]
    return out.astype(dtype)


def pallas_eligible(bias, t: int, has_dropout: bool, impl: str) -> bool:
    """Whether the structured-ALiBi Pallas kernel path applies. Attention
    dropout no longer disqualifies: the kernel draws a hash-based mask
    inline and reproduces it exactly in the Pallas backward.

    The threshold is low (one 128-lane tile) on purpose: even where the
    einsum is competitive on FLOPs — the ~125-token masked-student keep-set
    — the XLA path materializes fp32 (B*, H, t, t) probabilities that the
    grad-accum scan then *saves as residuals for every layer* (~1.3 GB/step
    for the a2v-large pretrain recipe, the allocation that OOMed a 16 GB
    v5e); the kernel's custom_vjp recomputes score tiles instead."""
    del has_dropout
    return (
        isinstance(bias, AlibiSpec)
        and impl != "xla"
        and _on_tpu()
        and t >= 64
    )


def dropout_seed(rng) -> jnp.ndarray:
    """Derive the int32 seed the Pallas kernel's hash dropout consumes from
    a jax PRNG key."""
    return jax.random.bits(rng, dtype=jnp.uint32).astype(jnp.int32)


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Bias = None,
    padding_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch between XLA einsum attention and the Pallas ALiBi flash
    kernel (ops/pallas_attention.py).

    The Pallas path needs a *structured* AlibiSpec bias (computed inline on
    VMEM tiles), a TPU backend, moderate+ sequence length, and no attention
    dropout (eval/infer are dropout-free; pretrain student sequences are
    short so XLA is fine there).
    """
    t = q.shape[1]
    has_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if isinstance(bias, AlibiSpec):
        use_pallas = pallas_eligible(bias, t, has_dropout, impl)
        if use_pallas or impl == "flash":
            from animal2vec_tpu.ops.pallas_attention import alibi_flash_attention

            return alibi_flash_attention(
                q, k, v, bias.slopes, bias.positions, padding_mask,
                use_pallas, bias.has_sentinel,
                dropout_rate if has_dropout else 0.0,
                dropout_seed(dropout_rng) if has_dropout else None,
            )
        bias = bias.densify()
        if bias.shape[0] == 1 and q.shape[0] > 1:
            # batch-uniform (1, T) positions densify to a (1, H, T, T) bias;
            # downstream kernels may require an explicit batch dim
            bias = jnp.broadcast_to(bias, (q.shape[0],) + bias.shape[1:])
    use_flash = impl == "flash" or (
        impl == "auto"
        and _on_tpu()
        and t >= 1024
        and not has_dropout
    )
    if use_flash:
        return flash_attention_tpu(q, k, v, bias, padding_mask)
    return xla_attention(q, k, v, bias, padding_mask, dropout_rate, dropout_rng)
