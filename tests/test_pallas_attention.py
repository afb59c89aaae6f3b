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
        ours, _ = _pallas_forward(q, k, v, slopes, pos, None, block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_unaligned_length_padding(self):
        b, t, h, d = 1, 200, 2, 8  # pads to 256 internally
        q, k, v = make_qkv(b, t, h, d, seed=1)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        ours, _ = _pallas_forward(q, k, v, slopes, pos, None, block_q=128, block_k=128)
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
        ours, _ = _pallas_forward(q, k, v, slopes, pos, None, block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_sentinel_extra_tokens(self):
        b, t, h, d = 1, 128, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=3)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = np.arange(t, dtype=np.int32)[None].repeat(b, 0)
        pos[:, 0] = -1  # CLS-style token: zero bias everywhere
        pos = jnp.asarray(pos)
        ours, _ = _pallas_forward(q, k, v, slopes, pos, None, block_q=128, block_k=128)
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
        ours, _ = _pallas_forward(q, k, v, slopes, pos, pad, block_q=128, block_k=128)
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
        ours, _ = _pallas_forward_packed(packed, slopes, pos, None, block_q=128, block_k=128)
        ref = jnp.swapaxes(_reference_attention(q, k, v, slopes, pos, None), 1, 2)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_serve_nk1_fast_path_matches_reference(self):
        # (1, T) positions mark the batch-uniform serving layout: the packed
        # entry (no lse, no dropout, one key block) routes through
        # _kernel_serve_nk1, which caches the distance tile in VMEM scratch
        # across the (b, h) sweep
        from animal2vec_tpu.ops.pallas_attention import _pallas_forward_packed

        b, t, h, d = 3, 256, 4, 8
        q, k, v = make_qkv(b, t, h, d, seed=11)
        slopes = jnp.asarray(alibi_slopes(h))
        pos1 = jnp.arange(t, dtype=jnp.int32)[None]  # (1, T) uniform
        posb = jnp.broadcast_to(pos1, (b, t))
        packed = jnp.stack([jnp.swapaxes(x, 1, 2) for x in (q, k, v)], axis=0)
        ours, lse = _pallas_forward_packed(
            packed, slopes, pos1, None, block_q=128, block_k=256, save_lse=False
        )
        assert lse is None
        ref = _reference_attention(q, k, v, slopes, posb, None)
        ref = jnp.swapaxes(ref, 1, 2)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_serve_nk1_with_padding_and_unaligned_length(self):
        # t=200 pads to 256: fabricated key mask + uniform positions; also a
        # real per-batch padding mask on top
        from animal2vec_tpu.ops.pallas_attention import _pallas_forward_packed

        b, t, h, d = 2, 200, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=12)
        slopes = jnp.asarray(alibi_slopes(h))
        pos1 = jnp.arange(t, dtype=jnp.int32)[None]
        posb = jnp.broadcast_to(pos1, (b, t))
        pad = jnp.zeros((b, t), bool).at[:, 150:].set(True)
        packed = jnp.stack([jnp.swapaxes(x, 1, 2) for x in (q, k, v)], axis=0)
        ours, _ = _pallas_forward_packed(
            packed, slopes, pos1, pad, block_q=128, block_k=256, save_lse=False
        )
        ref = jnp.swapaxes(_reference_attention(q, k, v, slopes, posb, pad), 1, 2)
        np.testing.assert_allclose(
            np.asarray(ours[:, :, :150]), np.asarray(ref[:, :, :150]),
            rtol=2e-3, atol=2e-4,
        )

    def test_serve_nk1_sentinel(self):
        # extra-token sentinel (-1) positions carry zero bias in the cached
        # distance tile
        from animal2vec_tpu.ops.pallas_attention import _pallas_forward_packed

        b, t, h, d = 2, 128, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=13)
        slopes = jnp.asarray(alibi_slopes(h))
        pos1 = jnp.concatenate(
            [jnp.full((1, 2), -1, jnp.int32), jnp.arange(t - 2, dtype=jnp.int32)[None]],
            axis=1,
        )
        posb = jnp.broadcast_to(pos1, (b, t))
        packed = jnp.stack([jnp.swapaxes(x, 1, 2) for x in (q, k, v)], axis=0)
        ours, _ = _pallas_forward_packed(
            packed, slopes, pos1, None, block_q=128, block_k=128,
            has_sentinel=True, save_lse=False,
        )
        ref = jnp.swapaxes(_reference_attention(q, k, v, slopes, posb, None), 1, 2)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_uniform_positions_general_path_broadcasts(self):
        # (1, T) positions through the general entries (training: save_lse)
        # must produce identical results to explicit (B, T) positions
        from animal2vec_tpu.ops.pallas_attention import _pallas_forward_packed

        b, t, h, d = 2, 256, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=14)
        slopes = jnp.asarray(alibi_slopes(h))
        pos1 = jnp.arange(t, dtype=jnp.int32)[None]
        posb = jnp.broadcast_to(pos1, (b, t))
        packed = jnp.stack([jnp.swapaxes(x, 1, 2) for x in (q, k, v)], axis=0)
        o1, l1 = _pallas_forward_packed(
            packed, slopes, pos1, None, block_q=128, block_k=128, save_lse=True
        )
        ob, lb = _pallas_forward_packed(
            packed, slopes, posb, None, block_q=128, block_k=128, save_lse=True
        )
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(ob))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(lb))

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

    def test_btc_entry_matches_reference_and_grads(self):
        """(B, T, 3C) lane-dense training entry: forward and custom_vjp
        gradients vs the XLA reference, including slope grads and dropout."""
        from animal2vec_tpu.ops.pallas_attention import alibi_flash_attention_btc

        b, t, h, d = 2, 128, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=11)
        slopes = jnp.asarray(alibi_slopes(h)) * 0.9
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        qkv_btc = jnp.concatenate(
            [x.reshape(b, t, h * d) for x in (q, k, v)], axis=-1
        )

        out = alibi_flash_attention_btc(qkv_btc, h, slopes, pos, None, False)
        ref = _reference_attention(q, k, v, slopes, pos, None).reshape(b, t, h * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)

        def loss_btc(qkv, s):
            return (alibi_flash_attention_btc(qkv, h, s, pos, None, False) ** 2).sum()

        def loss_ref(qkv, s):
            qq, kk, vv = (
                qkv[..., i * h * d:(i + 1) * h * d].reshape(b, t, h, d)
                for i in range(3)
            )
            return (_reference_attention(qq, kk, vv, s, pos, None) ** 2).sum()

        g1, gs1 = jax.grad(loss_btc, argnums=(0, 1))(qkv_btc, slopes)
        g2, gs2 = jax.grad(loss_ref, argnums=(0, 1))(qkv_btc, slopes)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2), rtol=2e-3, atol=2e-3)

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


class TestPallasBackward:
    """The Pallas flash backward kernels (dq+dslopes pass, dk/dv pass) in
    interpret mode vs XLA autograd through the reference math."""

    def _grads(self, loss, *args):
        return jax.grad(loss, argnums=tuple(range(len(args))))(*args)

    def test_backward_small_t_gathered_positions(self):
        """The masked-student regime the low pallas_eligible threshold
        enables: ~125 kept tokens with non-contiguous gathered positions.
        On a 16 GB v5e the XLA fallback here OOMed a2v-large pretraining
        (per-layer fp32 probs saved as scan residuals)."""
        b, t, h, d = 2, 125, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=13)
        slopes = jnp.asarray(alibi_slopes(h))
        rng = np.random.default_rng(5)
        pos = jnp.asarray(
            np.sort(rng.choice(2000, size=(b, t), replace=False), axis=1)
        ).astype(jnp.int32)

        def loss_pallas(q, k, v, s):
            out = alibi_flash_attention(q, k, v, s, pos, None, True, False)
            return (out.astype(jnp.float32) ** 2).sum()

        def loss_ref(q, k, v, s):
            return (
                _reference_attention(q, k, v, s, pos, None).astype(jnp.float32) ** 2
            ).sum()

        g1 = self._grads(loss_pallas, q, k, v, slopes)
        g2 = self._grads(loss_ref, q, k, v, slopes)
        for i, (a, r) in enumerate(zip(g1, g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-3,
                err_msg=f"grad arg {i}",
            )

    @pytest.mark.parametrize("t,use_pad,use_sentinel", [
        (256, False, False),
        (200, False, True),   # unaligned (pads to 256) + CLS sentinel
        (256, True, False),   # key padding
    ])
    def test_backward_matches_xla(self, t, use_pad, use_sentinel):
        b, h, d = 2, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=11)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = np.arange(t, dtype=np.int32)[None].repeat(b, 0)
        if use_sentinel:
            pos[:, 0] = -1
        pos = jnp.asarray(pos)
        pad = None
        if use_pad:
            pad_np = np.zeros((b, t), bool)
            pad_np[0, t - 40:] = True
            pad = jnp.asarray(pad_np)

        def loss_pallas(q, k, v, s):
            out = alibi_flash_attention(
                q, k, v, s, pos, pad, True, use_sentinel
            )
            return (out.astype(jnp.float32) ** 2).sum()

        def loss_ref(q, k, v, s):
            return (
                _reference_attention(q, k, v, s, pos, pad).astype(jnp.float32) ** 2
            ).sum()

        g1 = self._grads(loss_pallas, q, k, v, slopes)
        g2 = self._grads(loss_ref, q, k, v, slopes)
        # padded-out rows of dq are unconstrained; compare valid region
        valid = ~np.asarray(pad) if pad is not None else np.ones((b, t), bool)
        for i, (a, r) in enumerate(zip(g1, g2)):
            a, r = np.asarray(a), np.asarray(r)
            if a.ndim == 4:
                a, r = a[valid], r[valid]
            np.testing.assert_allclose(a, r, rtol=2e-3, atol=2e-3,
                                       err_msg=f"grad arg {i}")


class TestKernelDropout:
    """Hash-based in-kernel attention dropout: identical math in the kernel
    (interpret) and the pure-jnp reference, reproducible in the backward."""

    def _setup(self, b=2, t=256, h=2, d=8, seed=21):
        q, k, v = make_qkv(b, t, h, d, seed=seed)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        return q, k, v, slopes, pos

    def test_forward_matches_reference_with_same_seed(self):
        q, k, v, slopes, pos = self._setup()
        seed = jnp.asarray(1234, jnp.int32)
        ours = alibi_flash_attention(
            q, k, v, slopes, pos, None, True, False, 0.2, seed
        )
        ref = _reference_attention(q, k, v, slopes, pos, None, 0.2, seed)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4
        )

    def test_dropout_statistics_and_seed_sensitivity(self):
        q, k, v, slopes, pos = self._setup()
        outs = []
        for s in (1, 2):
            outs.append(np.asarray(alibi_flash_attention(
                q, k, v, slopes, pos, None, True, False, 0.5,
                jnp.asarray(s, jnp.int32),
            )))
        base = np.asarray(alibi_flash_attention(
            q, k, v, slopes, pos, None, True, False, 0.0, None
        ))
        assert not np.allclose(outs[0], outs[1])  # seed changes the mask
        assert not np.allclose(outs[0], base)
        # E[dropped output] == undropped output; crude check via global mean
        assert abs(outs[0].mean() - base.mean()) < 0.1

    def test_dropout_gradients_match_reference(self):
        q, k, v, slopes, pos = self._setup(t=200)  # unaligned on purpose
        seed = jnp.asarray(77, jnp.int32)

        def loss_pallas(q, k, v, s):
            out = alibi_flash_attention(
                q, k, v, s, pos, None, True, False, 0.3, seed
            )
            return (out.astype(jnp.float32) ** 2).sum()

        def loss_ref(q, k, v, s):
            out = _reference_attention(q, k, v, s, pos, None, 0.3, seed)
            return (out.astype(jnp.float32) ** 2).sum()

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, slopes)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, slopes)
        for i, (a, r) in enumerate(zip(g1, g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-3,
                err_msg=f"grad arg {i}",
            )


class TestInt8Kernel:
    """Serving-only int8 flash attention: both MXU products int8 (per-row
    q/k scales with sm_scale folded into q, per-channel v scales, fixed
    1/127 probability scale). Quantization bounds the error; these tests
    pin it against the fp32 reference."""

    def _setup(self, b=2, t=256, h=4, d=64, seed=31):
        from animal2vec_tpu.ops.pallas_attention import alibi_flash_attention_int8

        q, k, v = make_qkv(b, t, h, d, seed=seed)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        return alibi_flash_attention_int8, q, k, v, slopes, pos

    def _check(self, ours, ref, atol=0.08, rel_rms=0.05):
        ours = np.asarray(ours, np.float32)
        ref = np.asarray(ref, np.float32)
        assert np.max(np.abs(ours - ref)) < atol, np.max(np.abs(ours - ref))
        err = np.sqrt(np.mean((ours - ref) ** 2) / np.mean(ref**2))
        assert err < rel_rms, err

    def test_full_sequence(self):
        fn, q, k, v, slopes, pos = self._setup()
        ours = fn(q, k, v, slopes, pos, None, True, block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        assert ours.dtype == q.dtype and ours.shape == q.shape
        self._check(ours, ref)

    def test_padding_mask_and_unaligned_length(self):
        fn, q, k, v, slopes, pos = self._setup(t=200, seed=32)  # pads to 256
        mask = np.zeros((2, 200), bool)
        mask[:, 180:] = True  # padded keys must not contribute
        ours = fn(q, k, v, slopes, pos, jnp.asarray(mask), True,
                  block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, jnp.asarray(mask))
        self._check(ours[:, :180], ref[:, :180])

    def test_sentinel_and_gathered_positions(self):
        fn, q, k, v, slopes, _ = self._setup(seed=33)
        rng = np.random.default_rng(5)
        pos = np.stack([
            np.sort(rng.choice(2000, size=256, replace=False)) for _ in range(2)
        ]).astype(np.int32)
        pos[:, 0] = -1  # CLS sentinel: zero bias row/col
        pos = jnp.asarray(pos)
        ours = fn(q, k, v, slopes, pos, None, True, block_q=128, block_k=128)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        self._check(ours, ref)

    def test_bf16_inputs(self):
        fn, q, k, v, slopes, pos = self._setup(seed=34)
        ours = fn(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                  v.astype(jnp.bfloat16), slopes, pos, None, True,
                  block_q=128, block_k=128)
        assert ours.dtype == jnp.bfloat16
        ref = _reference_attention(q, k, v, slopes, pos, None)
        self._check(ours, ref, atol=0.1, rel_rms=0.06)


class TestNonDivisibleGrids:
    """Lengths where a clamped block does not divide the padded length.

    Regression for a silent-garbage class: e.g. t=1600 with the 1024/2048
    defaults used to clamp block_k to ceil128(t)=1664 while block_q stayed
    1024, t_pad=1664, and n_q = 1664 // 1024 = 1 — query rows 1024..1663
    were never written (uninitialized output). _fwd_blocks now floors the
    larger block to a multiple of the smaller so the grid always covers."""

    def test_fwd_blocks_invariant(self):
        from animal2vec_tpu.ops.pallas_attention import (
            _fwd_blocks,
            attention_padded_len,
        )

        for t in range(128, 4097, 128):
            for bq0, bk0 in ((1024, 2048), (512, 512), (256, 1024), (2048, 512)):
                bq, bk, t_pad = _fwd_blocks(t, bq0, bk0)
                assert t_pad >= t
                assert t_pad % bq == 0 and t_pad % bk == 0, (t, bq0, bk0, bq, bk, t_pad)
                assert bq % 128 == 0 and bk % 128 == 0
        assert attention_padded_len(1600) == 2048

    def test_general_path_nondivisible_default_blocks(self):
        # t=1600 through the per-tensor entry with the DEFAULT block sizes
        b, t, h, d = 1, 1600, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=21)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        ours, _ = _pallas_forward(q, k, v, slopes, pos, None)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    def test_packed_uniform_nondivisible_default_blocks(self):
        # t=1664 with (1, T) serving positions and default blocks: previously
        # eligible for the nk1 fast path with a truncated grid (rows 1536..
        # uninitialized); now the covering invariant reroutes it correctly
        from animal2vec_tpu.ops.pallas_attention import _pallas_forward_packed

        b, t, h, d = 1, 1664, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=22)
        slopes = jnp.asarray(alibi_slopes(h))
        pos1 = jnp.arange(t, dtype=jnp.int32)[None]
        posb = jnp.broadcast_to(pos1, (b, t))
        packed = jnp.stack([jnp.swapaxes(x, 1, 2) for x in (q, k, v)], axis=0)
        ours, _ = _pallas_forward_packed(packed, slopes, pos1, None, save_lse=False)
        ref = jnp.swapaxes(_reference_attention(q, k, v, slopes, posb, None), 1, 2)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4
        )
        # tail rows specifically (the previously-garbage region)
        np.testing.assert_allclose(
            np.asarray(ours[:, :, 1536:]), np.asarray(ref[:, :, 1536:]),
            rtol=2e-3, atol=2e-4,
        )

    def test_serve_nk1_bq_steps_down_to_divisor(self):
        # t=800 pads to 896 (one key block): the nk1 fast path must step
        # bq_s down from 512 to a divisor of 896 (=128) instead of
        # truncating the grid at 512
        from animal2vec_tpu.ops.pallas_attention import _pallas_forward_packed

        b, t, h, d = 2, 800, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=23)
        slopes = jnp.asarray(alibi_slopes(h))
        pos1 = jnp.arange(t, dtype=jnp.int32)[None]
        posb = jnp.broadcast_to(pos1, (b, t))
        packed = jnp.stack([jnp.swapaxes(x, 1, 2) for x in (q, k, v)], axis=0)
        ours, _ = _pallas_forward_packed(packed, slopes, pos1, None, save_lse=False)
        ref = jnp.swapaxes(_reference_attention(q, k, v, slopes, posb, None), 1, 2)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4
        )

    def test_small_block_q_nondivisible(self):
        # block_q=256 / block_k=512 at t=384: bk clamps to 384 then floors
        # to 256; t_pad=512 covers with a 2x2 grid (was n_q=1: rows 256..
        # uninitialized)
        b, t, h, d = 1, 384, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=24)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        ours, _ = _pallas_forward(q, k, v, slopes, pos, None, block_q=256, block_k=512)
        ref = _reference_attention(q, k, v, slopes, pos, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-4)

    @pytest.mark.parametrize("t", [137, 800, 1664])
    def test_padding_mask_at_nondivisible_lengths(self, t):
        # padding mask x non-divisible length: masked tail keys must not
        # leak into the covered grid's outputs on either entry
        from animal2vec_tpu.ops.pallas_attention import _pallas_forward_packed

        b, h, d = 2, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=t)
        slopes = jnp.asarray(alibi_slopes(h))
        posb = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        mask = jnp.asarray(
            np.pad(np.zeros((b, t - 17), np.int32), ((0, 0), (0, 17)),
                   constant_values=1)
        )
        ref = _reference_attention(q, k, v, slopes, posb, mask)[:, : t - 17]
        ours, _ = _pallas_forward(q, k, v, slopes, posb, mask)
        np.testing.assert_allclose(
            np.asarray(ours[:, : t - 17]), np.asarray(ref), rtol=2e-3, atol=2e-4
        )
        packed = jnp.stack([jnp.swapaxes(x, 1, 2) for x in (q, k, v)], axis=0)
        pos1 = jnp.arange(t, dtype=jnp.int32)[None]
        op, _ = _pallas_forward_packed(packed, slopes, pos1, mask, save_lse=False)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(op, 1, 2)[:, : t - 17]), np.asarray(ref),
            rtol=2e-3, atol=2e-4,
        )

    def test_backward_nondivisible_length(self):
        # gradients at an awkward length (t=1600, default training entry)
        b, t, h, d = 1, 1600, 2, 8
        q, k, v = make_qkv(b, t, h, d, seed=25)
        slopes = jnp.asarray(alibi_slopes(h))
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

        def loss_pallas(q, k, v, s):
            out = alibi_flash_attention(q, k, v, s, pos, None, True, False)
            return (out.astype(jnp.float32) ** 2).sum()

        def loss_ref(q, k, v, s):
            return (
                _reference_attention(q, k, v, s, pos, None).astype(jnp.float32) ** 2
            ).sum()

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, slopes)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, slopes)
        for i, (a, r) in enumerate(zip(g1, g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-3,
                err_msg=f"grad arg {i}",
            )
