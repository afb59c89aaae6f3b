"""Ring (sequence-parallel) flash attention over a mesh axis.

The reference handles long audio purely by *chunking* into independent 10-s
windows (nn/utils.py:1444-1475) — context never crosses a chunk boundary.
This op scales *exact* ALiBi attention past a single chip instead: inside
``shard_map`` each device holds a T/n slice of q/k/v, the k/v slices rotate
around the ring via ``lax.ppermute`` (riding ICI neighbor links), and each
step's flash partials merge in log-space from the kernel's saved logsumexp:

    out = sum_i w_i * out_i,   w_i = exp(lse_i - lse),  lse = logsumexp_i lse_i

Every per-block partial comes from the same Pallas kernel as single-chip
attention (ops/pallas_attention._pallas_forward), so per-device memory stays
O(T_local^2-free): no device ever materializes a (T, T) score matrix or the
full K/V sequence. With n devices the per-device compute is the same T^2/n
work chunked attention does n times — but with *global* receptive field.

ALiBi makes this natural: the bias depends only on |pos_q - pos_k|, and the
kernel already takes explicit per-row position vectors, so rotating the key
*positions* alongside the key blocks is the entire bias bookkeeping.

Inference/forward only by design: training sequences are pre-chunked 10-s
clips (a2v design), so the backward ring (extra dq/dkv accumulation passes)
is not needed for parity and is left out.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from animal2vec_tpu.ops.pallas_attention import _pallas_forward


def _merge_partials(out_a, lse_a, out_b, lse_b):
    """Log-space merge of two flash partials.

    out_*: (B, T, H, D) softmax-normalized block outputs;
    lse_*: (B, H, T) logsumexp of each block's scores.
    """
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    den = wa + wb
    # (B, H, T) -> (B, T, H, 1) weights against BTHD outputs
    to_w = lambda w: jnp.swapaxes(w / den, 1, 2)[..., None]
    out = out_a * to_w(wa).astype(out_a.dtype) + out_b * to_w(wb).astype(out_b.dtype)
    return out, m + jnp.log(den)


def ring_flash_attention(
    q: jnp.ndarray,  # (B, T_local, H, D) — this device's query slice
    k: jnp.ndarray,  # (B, T_local, H, D) — this device's key slice
    v: jnp.ndarray,
    slopes: jnp.ndarray,       # (H,) scaled ALiBi slopes
    positions: jnp.ndarray,    # (B, T_local) int32 GLOBAL positions of this slice
    padding_mask: Optional[jnp.ndarray],  # (B, T_local) bool, True = pad (keys)
    axis_name: str,
):
    """Exact sequence-parallel attention; call inside shard_map with q/k/v
    sharded over ``axis_name`` along T. Returns (B, T_local, H, D)."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    mask = (
        jnp.zeros(positions.shape, jnp.int32)
        if padding_mask is None
        else padding_mask.astype(jnp.int32)
    )

    def block(q, kb, vb, pos_k, mask_k):
        out, lse = _pallas_forward(
            q, kb, vb, slopes, positions,
            padding_mask=mask_k.astype(bool),
            positions_k=pos_k,
        )
        # lse is (B, H, T_pad); trim to the local length
        return out, lse[..., : q.shape[1]]

    out, lse = block(q, k, v, positions, mask)

    def step(_, carry):
        out, lse, kb, vb, pos_k, mask_k = carry
        kb, vb, pos_k, mask_k = (
            jax.lax.ppermute(x, axis_name, perm) for x in (kb, vb, pos_k, mask_k)
        )
        out_i, lse_i = block(q, kb, vb, pos_k, mask_k)
        out, lse = _merge_partials(out, lse, out_i, lse_i)
        return out, lse, kb, vb, pos_k, mask_k

    out, lse, *_ = jax.lax.fori_loop(
        0, n - 1, step, (out, lse, k, v, positions, mask)
    )
    return out


def ring_attention_sharded(
    q, k, v, slopes, positions, padding_mask, mesh, axis_name: str = "data"
):
    """Convenience wrapper: shard (B, T, H, D) tensors over ``axis_name``
    along T and run the ring. ``T`` must divide by the axis size and each
    shard must satisfy the kernel's 128-multiple padding internally."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    if padding_mask is None:  # concrete array keeps the shard_map specs static
        padding_mask = jnp.zeros(positions.shape, bool)
    fn = shard_map(
        partial(ring_flash_attention, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            P(None, axis_name, None, None),
            P(None, axis_name, None, None),
            P(None, axis_name, None, None),
            P(),
            P(None, axis_name),
            P(None, axis_name),
        ),
        out_specs=P(None, axis_name, None, None),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    return fn(q, k, v, slopes, positions, padding_mask)
