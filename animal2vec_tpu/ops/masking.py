"""Static-shape span masking for XLA.

The reference samples span masks host-side with numpy
(fairseq ``compute_mask_indices`` called from nn/modalities/base.py:401-413)
and then equalizes the per-row mask count (``require_same_masks=True``) so the
keep-set is rectangular. That equal-count invariant is exactly what XLA's
static shapes need — but the reference's count is the data-dependent *minimum*
across rows, which would retrigger compilation. Here the count is a **static
function of the hyperparameters** (expected union coverage of the sampled
spans, see :func:`expected_span_mask_tokens`), and every row is adjusted to
exactly that count with a top-k trick that prefers span-masked tokens. The
whole sampler runs on device under jit from a PRNG key, so clone-batch mask
diversity (nn/modalities/base.py:242-261) is a simple ``fold_in``.

MaskInfo mirrors nn/modalities/base.py:76,427-455:
  mask        (B, T) int32, 1 = masked
  ids_shuffle (B, T) stable argsort of mask: keep positions first
  ids_restore (B, T) inverse permutation
  ids_keep    (B, K) the kept (unmasked) positions, K static
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class MaskInfo(NamedTuple):
    mask: jnp.ndarray
    ids_shuffle: jnp.ndarray
    ids_restore: jnp.ndarray
    ids_keep: jnp.ndarray


@lru_cache(maxsize=128)
def expected_span_mask_tokens(
    time_steps: int,
    mask_prob: float,
    mask_length: int,
    mask_dropout: float = 0.0,
    require_min: int = 1,
) -> int:
    """Static number of masked tokens M for the span sampler.

    fairseq draws n_spans = int(mask_prob * T / L + rand()) distinct span
    starts; the union of length-L spans covers each position with probability
    1 - (1-q)^L where q = n_spans / (T - L + 1). We use the expectation
    (rounded) as the static per-row count. For the MeerKAT pretrain config
    (T=2000, p=1.5, L=2) this gives ~0.938*T, matching the reference's
    "~93% masked" (configs/MeerKAT/a2v_large_pretrain_best.yaml:127-131).
    """
    n_spans = int(mask_prob * time_steps / float(mask_length) + 0.5)
    n_spans = max(require_min, min(n_spans, time_steps - mask_length + 1))
    q = n_spans / float(time_steps - mask_length + 1)
    coverage = 1.0 - (1.0 - q) ** mask_length
    m = int(round(time_steps * coverage * (1.0 - mask_dropout)))
    return int(np.clip(m, require_min, time_steps - 1))


def span_mask(
    rng: jax.Array,
    batch: int,
    time_steps: int,
    mask_prob: float,
    mask_length: int,
    mask_dropout: float = 0.0,
) -> jnp.ndarray:
    """Sample a (B, T) span mask with exactly M masked tokens per row.

    1. draw n_spans distinct starts per row (argsort of uniform noise),
    2. dilate each start to a length-L span (union),
    3. adjust each row to exactly M tokens via :func:`exactify_mask`.
    """
    m_tokens = expected_span_mask_tokens(time_steps, mask_prob, mask_length, mask_dropout)
    n_spans = int(mask_prob * time_steps / float(mask_length) + 0.5)
    n_spans = max(1, min(n_spans, time_steps - mask_length + 1))

    rng_starts, rng_adjust = jax.random.split(rng)
    noise = jax.random.uniform(rng_starts, (batch, time_steps - mask_length + 1))
    order = jnp.argsort(noise, axis=1)
    starts = order[:, :n_spans]  # distinct starts per row
    base = jnp.zeros((batch, time_steps), dtype=jnp.int32)
    batch_idx = jnp.arange(batch)[:, None]
    base = base.at[batch_idx, starts].set(1)
    # dilate: position t masked if any start in [t-L+1, t]
    mask = base
    for shift in range(1, mask_length):
        mask = jnp.maximum(mask, jnp.roll(base, shift, axis=1) * (jnp.arange(time_steps) >= shift))
    return exactify_mask(rng_adjust, mask, m_tokens)


def exactify_mask(rng: jax.Array, mask: jnp.ndarray, m_tokens: int) -> jnp.ndarray:
    """Force exactly ``m_tokens`` ones per row, preferring existing ones.

    Implements the same-count adjustment fairseq does by randomly removing
    (or, with add_masks, adding) mask ticks — but to a static target.
    """
    b, t = mask.shape
    priority = mask.astype(jnp.float32) + jax.random.uniform(rng, (b, t))
    _, top_idx = jax.lax.top_k(priority, m_tokens)
    out = jnp.zeros((b, t), dtype=jnp.int32)
    out = out.at[jnp.arange(b)[:, None], top_idx].set(1)
    return out


def make_mask_info(mask: jnp.ndarray, keep_masked_pct: float = 0.0) -> MaskInfo:
    """Derive keep/restore bookkeeping (nn/modalities/base.py:427-455).

    The mask must have an equal per-row count (guaranteed by span_mask) so
    that K = T - M is static.
    """
    b, t = mask.shape
    mask = mask.astype(jnp.int32)
    ids_shuffle = jnp.argsort(mask, axis=1, stable=True)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    # static keep length from the (static) mask count
    # mask rows all share the same count by construction
    # (mirror of base.py:437-441 incl. keep_masked_pct)
    m_tokens = _static_row_sum(mask)
    len_keep = t - m_tokens
    if keep_masked_pct > 0:
        len_keep += round((t - len_keep) * keep_masked_pct)
    ids_keep = ids_shuffle[:, :len_keep]
    return MaskInfo(mask=mask, ids_shuffle=ids_shuffle, ids_restore=ids_restore, ids_keep=ids_keep)


def _static_row_sum(mask: jnp.ndarray) -> int:
    """Extract the static per-row count when trace-time constant, else raise.

    span_mask guarantees the count is baked in at trace time via
    expected_span_mask_tokens; we recover it from the aval by evaluating the
    sum eagerly when concrete, otherwise callers must pass masks produced by
    span_mask under the same trace.
    """
    summed = jnp.sum(mask[0])
    try:
        return int(summed)  # concrete (eager) path
    except jax.errors.TracerIntegerConversionError:
        raise ValueError(
            "make_mask_info under jit requires a statically-known mask count; "
            "use make_mask_info_static(mask, m_tokens) instead"
        )


def make_mask_info_static(
    mask: jnp.ndarray, m_tokens: int, keep_masked_pct: float = 0.0
) -> MaskInfo:
    """jit-safe variant of make_mask_info with an explicit static count."""
    b, t = mask.shape
    mask = mask.astype(jnp.int32)
    ids_shuffle = jnp.argsort(mask, axis=1, stable=True)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    len_keep = t - m_tokens
    if keep_masked_pct > 0:
        len_keep += round((t - len_keep) * keep_masked_pct)
    ids_keep = ids_shuffle[:, :len_keep]
    return MaskInfo(mask=mask, ids_shuffle=ids_shuffle, ids_restore=ids_restore, ids_keep=ids_keep)


def apply_mask(
    x: jnp.ndarray,
    mask_info: MaskInfo,
    rng: Optional[jax.Array] = None,
    zero_mask: bool = True,
    noise_std: float = 0.01,
) -> jnp.ndarray:
    """Zero or noise-fill the masked positions (nn/modalities/base.py:457-470)."""
    mask = mask_info.mask[..., None].astype(x.dtype)
    if zero_mask:
        return x * (1 - mask)
    assert rng is not None, "noise mask needs an rng"
    noise = noise_std * jax.random.normal(rng, x.shape, dtype=x.dtype)
    return x * (1 - mask) + noise * mask


def channel_mask(
    rng: jax.Array,
    batch: int,
    channels: int,
    mask_channel_prob: float,
    mask_channel_length: int,
) -> jnp.ndarray:
    """(B, C) channel-span mask (SpecAugment-style,
    nn/modalities/base.py:471-484)."""
    return span_mask(rng, batch, channels, mask_channel_prob, mask_channel_length)


def gather_keep(x: jnp.ndarray, mask_info: MaskInfo) -> jnp.ndarray:
    """Gather the kept (unmasked) tokens: (B,T,D) -> (B,K,D)
    (nn/modalities/base.py:537-542)."""
    return jnp.take_along_axis(x, mask_info.ids_keep[..., None], axis=1)


def scatter_with_mask_tokens(
    x_keep: jnp.ndarray,
    mask_info: MaskInfo,
    rng: jax.Array,
    noise_std: float,
    num_extra: int = 0,
) -> jnp.ndarray:
    """Decoder input: re-insert noise mask-tokens at masked positions and
    restore original order (nn/modalities/base.py:162-192)."""
    b, k, d = x_keep.shape
    t = mask_info.ids_restore.shape[1]
    x_keep = x_keep[:, num_extra:]
    num_masked = t - (k - num_extra)
    mask_tokens = noise_std * jax.random.normal(rng, (b, num_masked, d), dtype=x_keep.dtype)
    x_full = jnp.concatenate([x_keep, mask_tokens], axis=1)
    return jnp.take_along_axis(x_full, mask_info.ids_restore[..., None], axis=1)


def random_masking(rng: jax.Array, batch: int, time_steps: int, mask_ratio: float) -> MaskInfo:
    """MAE-style ratio masking for mask_length == 1
    (nn/modalities/base.py:501-534)."""
    len_keep = int(time_steps * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (batch, time_steps))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((batch, time_steps), dtype=jnp.int32)
    mask = mask.at[jnp.arange(batch)[:, None], ids_keep].set(0)
    # re-derive shuffle from the mask so keeps come first in original order
    ids_shuffle2 = jnp.argsort(mask, axis=1, stable=True)
    ids_restore2 = jnp.argsort(ids_shuffle2, axis=1)
    return MaskInfo(
        mask=mask,
        ids_shuffle=ids_shuffle2,
        ids_restore=ids_restore2,
        ids_keep=ids_shuffle2[:, :len_keep],
    )


def masked_alibi(alibi_bias: jnp.ndarray, mask_info: MaskInfo) -> jnp.ndarray:
    """Slice the (B,H,T,T) bias down to the kept rows/cols per batch element
    (nn/modalities/base.py:681-698)."""
    idx = mask_info.ids_keep  # (B, K)
    bias = jnp.take_along_axis(alibi_bias, idx[:, None, :, None], axis=2)
    bias = jnp.take_along_axis(bias, idx[:, None, None, :], axis=3)
    return bias


def block_mask_2d(
    rng: jax.Array,
    batch: int,
    num_patches: int,
    mask_prob: float,
    mask_length: int,
    mask_prob_adjust: float = 0.0,
    inverse_mask: bool = False,
) -> jnp.ndarray:
    """2-D block masking for the image modality with a static count
    (semantics of fairseq compute_block_mask_2d as consumed at
    nn/modalities/images.py:218-233): sample block seeds on the grid, dilate
    to LxL blocks, then exactify to round(P * p) tokens.
    """
    n = int(np.sqrt(num_patches))
    assert n * n == num_patches
    target = int(num_patches * mask_prob)
    p_sample = mask_prob + mask_prob_adjust
    n_seeds = max(1, int(p_sample * num_patches / (mask_length**2)))
    rng_seed, rng_adj = jax.random.split(rng)
    noise = jax.random.uniform(rng_seed, (batch, num_patches))
    order = jnp.argsort(noise, axis=1)
    seeds = order[:, :n_seeds]
    grid = jnp.zeros((batch, num_patches), dtype=jnp.int32)
    grid = grid.at[jnp.arange(batch)[:, None], seeds].set(1)
    grid = grid.reshape(batch, n, n)
    # dilate LxL (down-right, like compute_block_mask_2d)
    out = jnp.zeros_like(grid)
    for di in range(mask_length):
        for dj in range(mask_length):
            shifted = jnp.roll(jnp.roll(grid, di, axis=1), dj, axis=2)
            valid = (jnp.arange(n)[:, None] >= di) & (jnp.arange(n)[None, :] >= dj)
            out = jnp.maximum(out, shifted * valid.astype(grid.dtype))
    mask = out.reshape(batch, num_patches)
    if inverse_mask:
        mask = 1 - mask
        target = num_patches - target
    return exactify_mask(rng_adj, mask, max(1, min(target, num_patches - 1)))
