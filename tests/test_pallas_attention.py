"""Pallas ALiBi flash-attention kernel tests (interpret mode on CPU) against
the XLA reference math, including gathered positions (masked student path),
extra-token sentinels, and padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animal2vec_tpu.models.attention import AlibiSpec, xla_attention
from animal2vec_tpu.ops import alibi_slopes
from animal2vec_tpu.ops.pallas_attention import (
    _pallas_forward,
    _reference_attention,
    alibi_flash_attention,
)


def make_qkv(b, t, h, d, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32)) for _ in range(3)
    )


class TestReferenceMathMatchesDense:
    def test_spec_densify_equals_reference_impl(self):
        b, t, h, d = 2, 64, 4, 8
        q, k, v = make_qkv(b, t, h, d)
        slopes = jnp.asarray(alibi_slopes(h)) * 0.7
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        spec = AlibiSpec(slopes, pos)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        dense = xla_attention(q, k, v, spec.densify())
        np.testing.assert_allclose(np.asarray(ref), np.asarray(dense), rtol=1e-4, atol=1e-5)


class TestPallasKernel:
    def test_full_sequence(self):
        b, t, h, d = 2, 256, 4, 8
        q, k, v = make_qkv(b, t, h, d)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        ours = _pallas_forward(q, k, v, slopes, pos, None, block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_unaligned_length_padding(self):
        b, t, h, d = 1, 200, 2, 8  # pads to 256 internally
        q, k, v = make_qkv(b, t, h, d, seed=1)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        ours = _pallas_forward(q, k, v, slopes, pos, None, block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_gathered_positions(self):
        # the student keep-set: non-contiguous positions per batch row
        b, t, h, d = 2, 128, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=2)
        slopes = jnp.asarray(alibi_slopes(h))
        rng = np.random.default_rng(0)
        pos = np.stack([
            np.sort(rng.choice(2000, size=t, replace=False)) for _ in range(b)
        ]).astype(np.int32)
        pos = jnp.asarray(pos)
        ours = _pallas_forward(q, k, v, slopes, pos, None, block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_sentinel_extra_tokens(self):
        b, t, h, d = 1, 128, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=3)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = np.arange(t, dtype=np.int32)[None].repeat(b, 0)
        pos[:, 0] = -1  # CLS-style token: zero bias everywhere
        pos = jnp.asarray(pos)
        ours = _pallas_forward(q, k, v, slopes, pos, None, block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_padding_mask(self):
        b, t, h, d = 2, 128, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=4)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        pad = np.zeros((b, t), bool)
        pad[0, 100:] = True
        pad = jnp.asarray(pad)
        ours = _pallas_forward(q, k, v, slopes, pos, pad, block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, pad)
        np.testing.assert_allclose(
            np.asarray(ours[:, :100]), np.asarray(ref[:, :100]), rtol=2e-3, atol=2e-4
        )

    def test_packed_kernel_matches_reference(self):
        from animal2vec_tpu.ops.pallas_attention import _pallas_forward_packed

        b, t, h, d = 2, 256, 4, 8
        q, k, v = make_qkv(b, t, h, d, seed=6)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        packed = jnp.stack(
            [jnp.swapaxes(x, 1, 2) for x in (q, k, v)], axis=0
        )  # (3, B, H, T, D)
        ours = _pallas_forward_packed(packed, slopes, pos, None, block_q=128, block_k=128)
        ref = jnp.swapaxes(_reference_attention(q, k, v, slopes, pos, None), 1, 2)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_packed_custom_vjp_gradients(self):
        from animal2vec_tpu.ops.pallas_attention import alibi_flash_attention_packed

        b, t, h, d = 1, 128, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=7)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        packed = jnp.stack([jnp.swapaxes(x, 1, 2) for x in (q, k, v)], axis=0)

        def loss_packed(pk):
            return (alibi_flash_attention_packed(pk, slopes, pos, None, False) ** 2).sum()

        def loss_ref(pk):
            out = _reference_attention(
                jnp.swapaxes(pk[0], 1, 2), jnp.swapaxes(pk[1], 1, 2),
                jnp.swapaxes(pk[2], 1, 2), slopes, pos, None,
            )
            return (jnp.swapaxes(out, 1, 2) ** 2).sum()

        g1 = jax.grad(loss_packed)(packed)
        g2 = jax.grad(loss_ref)(packed)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-3, atol=2e-4)

    def test_custom_vjp_gradients(self):
        b, t, h, d = 1, 64, 2, 4
        q, k, v = make_qkv(b, t, h, d, seed=5)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

        def loss_pallas(q, k, v):
            return (
                alibi_flash_attention(q, k, v, slopes, pos, None, False) ** 2
            ).sum()

        def loss_ref(q, k, v):
            return (_reference_attention(q, k, v, slopes, pos, None) ** 2).sum()

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)
