"""Fused transformer-MLP Pallas kernel tests (interpret mode on CPU).

Covers the bf16/fp32 fused path against the XLA reference math, the int8
path against an exact numpy emulation of the kernel's quantization
schedule, the custom_vjp backward, and the Mlp module routing (gate +
param-tree compatibility with the unfused nn.Dense layout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animal2vec_tpu.ops.fused_mlp import _gelu_exact, fused_mlp
from animal2vec_tpu.ops.int8_mm import quantize_weight


def ref_mlp(x, w1, b1, w2, b2):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    return h @ w2 + b2


def make(n, c1, m, c2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, c1)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(c1, m)).astype(np.float32) / np.sqrt(c1))
    b1 = jnp.asarray(rng.normal(size=(m,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(m, c2)).astype(np.float32) / np.sqrt(m))
    b2 = jnp.asarray(rng.normal(size=(c2,)).astype(np.float32) * 0.1)
    return x, w1, b1, w2, b2


class TestFusedFp32:
    def test_matches_reference(self):
        x, w1, b1, w2, b2 = make(256, 128, 256, 128)
        out = fused_mlp(x, w1, w2, b1, b2, block_n=128, block_m=128)
        ref = ref_mlp(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_leading_dims_and_row_padding(self):
        # (3, 50) rows = 150, not a multiple of any block — exercises padding
        x, w1, b1, w2, b2 = make(150, 128, 256, 128, seed=1)
        x3 = x.reshape(3, 50, 128)
        out = fused_mlp(x3, w1, w2, b1, b2, block_n=128, block_m=128)
        assert out.shape == (3, 50, 128)
        ref = ref_mlp(x, w1, b1, w2, b2).reshape(3, 50, 128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_no_bias(self):
        x, w1, _, w2, _ = make(128, 128, 128, 128, seed=2)
        out = fused_mlp(x, w1, w2, block_n=128, block_m=128)
        ref = jax.nn.gelu(x @ w1, approximate=False) @ w2
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_block_m_shrinks_to_divide_hidden(self):
        # m=384 with requested block_m=256 -> shrinks to 128 internally
        x, w1, b1, w2, b2 = make(64, 128, 384, 128, seed=3)
        out = fused_mlp(x, w1, w2, b1, b2, block_n=64, block_m=256)
        ref = ref_mlp(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_grad_matches_reference(self):
        x, w1, b1, w2, b2 = make(64, 128, 128, 128, seed=4)

        def loss_fused(x, w1, b1, w2, b2):
            return jnp.sum(fused_mlp(x, w1, w2, b1, b2, block_n=64, block_m=128) ** 2)

        def loss_ref(x, w1, b1, w2, b2):
            return jnp.sum(ref_mlp(x, w1, b1, w2, b2) ** 2)

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def emulate_int8(x, w1q, w1s, b1, w2q, w2s, b2, block_m):
    """Numpy emulation of _kernel_int8's exact quantization schedule:
    per-row activation scales over full C1; after GELU, per-(row, block_m
    chunk) re-quantization."""
    x = np.asarray(x, np.float32)
    s = np.maximum(np.max(np.abs(x), axis=1, keepdims=True) / 127.0, 1e-12)
    xq = np.round(x / s).astype(np.int8)
    w1q = np.asarray(w1q, np.int64)
    w2q = np.asarray(w2q, np.int64)
    m = w1q.shape[1]
    acc = np.zeros((x.shape[0], w2q.shape[1]), np.float32)
    for mi in range(0, m, block_m):
        h = (xq.astype(np.int64) @ w1q[:, mi : mi + block_m]).astype(np.float32)
        h = h * s * np.asarray(w1s)[None, mi : mi + block_m] + np.asarray(b1)[None, mi : mi + block_m]
        h = np.asarray(_gelu_exact(jnp.asarray(h)))
        hs = np.maximum(np.max(np.abs(h), axis=1, keepdims=True) / 127.0, 1e-12)
        hq = np.round(h / hs).astype(np.int8)
        acc += (hq.astype(np.int64) @ w2q[mi : mi + block_m]).astype(np.float32) * hs * np.asarray(w2s)[None]
    return acc + np.asarray(b2)[None]


class TestFusedInt8:
    def test_matches_exact_emulation(self):
        x, w1, b1, w2, b2 = make(64, 128, 256, 128, seed=5)
        w1q, w1s = quantize_weight(w1)
        w2q, w2s = quantize_weight(w2)
        out = fused_mlp(x, w1q, w2q, b1, b2, w1s, w2s, block_n=64, block_m=128)
        ref = emulate_int8(x, w1q, w1s, b1, w2q, w2s, b2, block_m=128)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    def test_close_to_fp32_mlp(self):
        x, w1, b1, w2, b2 = make(128, 128, 256, 128, seed=6)
        w1q, w1s = quantize_weight(w1)
        w2q, w2s = quantize_weight(w2)
        out = np.asarray(fused_mlp(x, w1q, w2q, b1, b2, w1s, w2s, block_n=128, block_m=128))
        ref = np.asarray(ref_mlp(x, w1, b1, w2, b2))
        rel_rms = np.sqrt(np.mean((out - ref) ** 2) / np.mean(ref**2))
        assert rel_rms < 0.03, rel_rms


def make_ln(c, seed):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(1 + 0.1 * rng.normal(size=(c,)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32)),
        jnp.asarray(1 + 0.1 * rng.normal(size=(c,)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32)),
    )


def ref_block(x, l1s, l1b, w1, b1, w2, b2, l2s, l2b, eps=1e-5):
    def ln(z, s, b):
        zf = z.astype(jnp.float32)
        mean = zf.mean(axis=-1, keepdims=True)
        var = zf.var(axis=-1, keepdims=True)
        return (zf - mean) * jax.lax.rsqrt(var + eps) * s + b

    r = ln(x, l1s, l1b).astype(x.dtype)
    t = ref_mlp(r, w1, b1, w2, b2).astype(x.dtype)
    return ln(r + t, l2s, l2b).astype(x.dtype), t


class TestFusedBlock:
    """LN1 -> MLP -> +residual -> LN2 in one kernel (fused_block_mlp)."""

    def test_matches_reference_with_row_padding(self):
        from animal2vec_tpu.ops.fused_mlp import fused_block_mlp

        x, w1, b1, w2, b2 = make(150, 128, 256, 128, seed=20)
        l1s, l1b, l2s, l2b = make_ln(128, 21)
        x3 = x.reshape(3, 50, 128)
        xo, t = fused_block_mlp(
            x3, l1s, l1b, w1, w2, b1, b2, l2s, l2b, 1e-5,
            block_n=64, block_m=128,
        )
        assert xo.shape == (3, 50, 128) and t.shape == (3, 50, 128)
        ro, rt = ref_block(x, l1s, l1b, w1, b1, w2, b2, l2s, l2b)
        np.testing.assert_allclose(
            np.asarray(xo).reshape(150, 128), np.asarray(ro), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(t).reshape(150, 128), np.asarray(rt), rtol=1e-4, atol=1e-4
        )

    def test_no_affine_norms(self):
        from animal2vec_tpu.ops.fused_mlp import fused_block_mlp

        x, w1, b1, w2, b2 = make(64, 128, 128, 128, seed=22)
        ones = jnp.ones((128,), jnp.float32)
        zeros = jnp.zeros((128,), jnp.float32)
        xo, t = fused_block_mlp(
            x, None, None, w1, w2, b1, b2, None, None, 1e-5,
            block_n=64, block_m=128,
        )
        ro, rt = ref_block(x, ones, zeros, w1, b1, w2, b2, ones, zeros)
        np.testing.assert_allclose(np.asarray(xo), np.asarray(ro), rtol=1e-4, atol=1e-4)

    def test_grad_matches_reference_linear_cotangents(self):
        # fixed linear cotangents make the comparison independent of the
        # primal's fp32 summation-order noise (a squared loss amplifies it)
        from animal2vec_tpu.ops.fused_mlp import fused_block_mlp, _ref_block_bf16

        x, w1, b1, w2, b2 = make(64, 128, 128, 128, seed=23)
        l1s, l1b, l2s, l2b = make_ln(128, 24)
        rng = np.random.default_rng(25)
        go = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        gt = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))

        def loss_fused(x, w1, b1, w2, b2, l1s, l1b, l2s, l2b):
            xo, t = fused_block_mlp(
                x, l1s, l1b, w1, w2, b1, b2, l2s, l2b, 1e-5,
                block_n=64, block_m=128,
            )
            return jnp.sum(xo * go) + jnp.sum(t * gt)

        def loss_ref(x, w1, b1, w2, b2, l1s, l1b, l2s, l2b):
            xo, t = _ref_block_bf16(
                x, l1s.reshape(1, -1), l1b.reshape(1, -1), w1,
                b1.reshape(1, -1), w2, b2.reshape(1, -1),
                l2s.reshape(1, -1), l2b.reshape(1, -1), 1e-5,
            )
            return jnp.sum(xo * go) + jnp.sum(t * gt)

        args = (x, w1, b1, w2, b2, l1s, l1b, l2s, l2b)
        g_f = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
        g_r = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(
                np.asarray(a).ravel(), np.asarray(b).ravel(), rtol=1e-4, atol=1e-5
            )

    def test_dropout_matches_reference(self):
        # in-kernel hash dropout (act + post-mlp): the Pallas kernel and the
        # XLA reference regenerate the SAME masks from (seeds, row, col)
        from animal2vec_tpu.ops.fused_mlp import _ref_block_bf16, fused_block_mlp

        x, w1, b1, w2, b2 = make(150, 128, 256, 128, seed=40)
        l1s, l1b, l2s, l2b = make_ln(128, 41)
        seeds = jnp.asarray([123456789, -987654321, 31337], jnp.int32)
        xo, t = fused_block_mlp(
            x, l1s, l1b, w1, w2, b1, b2, l2s, l2b, 1e-5,
            block_n=64, block_m=128,
            seeds=seeds, act_rate=0.25, post_rate=0.1,
        )
        ro, rt = _ref_block_bf16(
            x, l1s.reshape(1, -1), l1b.reshape(1, -1), w1, b1.reshape(1, -1),
            w2, b2.reshape(1, -1), l2s.reshape(1, -1), l2b.reshape(1, -1),
            1e-5, seeds=seeds, act_rate=0.25, post_rate=0.1,
        )
        np.testing.assert_allclose(np.asarray(xo), np.asarray(ro), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(rt), rtol=1e-4, atol=1e-4)
        # different seeds -> different realization
        xo2, _ = fused_block_mlp(
            x, l1s, l1b, w1, w2, b1, b2, l2s, l2b, 1e-5,
            block_n=64, block_m=128,
            seeds=seeds + 1, act_rate=0.25, post_rate=0.1,
        )
        assert not np.allclose(np.asarray(xo2), np.asarray(xo))

    def test_fc2_site_dropout_zeroes_tap(self):
        # the Mlp applies activation dropout at BOTH timm sites (after GELU
        # and after fc2 — reference nn/modalities/modules.py:316 with
        # drop=activation_dropout). The after-fc2 site produces exact zeros
        # in the tap at ~act_rate; a kernel missing that site produces none.
        from animal2vec_tpu.ops.fused_mlp import fused_block_mlp

        x, w1, b1, w2, b2 = make(256, 128, 256, 128, seed=50)
        l1s, l1b, l2s, l2b = make_ln(128, 51)
        seeds = jnp.asarray([1, 2, 3], jnp.int32)
        _, t = fused_block_mlp(
            x, l1s, l1b, w1, w2, b1, b2, l2s, l2b, 1e-5,
            block_n=64, block_m=128,
            seeds=seeds, act_rate=0.5, post_rate=0.0,
        )
        zero_frac = float(jnp.mean(t == 0.0))
        assert abs(zero_frac - 0.5) < 0.05, zero_frac
        # and the two act-site masks are independent realizations: the
        # after-GELU site alone cannot create exact zero columns in t
        _, t0 = fused_block_mlp(
            x, l1s, l1b, w1, w2, b1, b2, l2s, l2b, 1e-5,
            block_n=64, block_m=128,
        )
        assert float(jnp.mean(t0 == 0.0)) < 0.01

    def test_hash_keep_statistics(self):
        # the murmur-style keep mask must drop ~rate of positions, decorrelated
        # across rows/cols
        from animal2vec_tpu.ops.fused_mlp import _hash_keep

        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1024), 1)
        for rate in (0.1, 0.25, 0.5):
            keep = _hash_keep(jnp.int32(777), rows, cols, rate)
            frac = float(jnp.mean(keep))
            assert abs(frac - (1.0 - rate)) < 0.01, (rate, frac)
            # per-row keep fraction spreads like a binomial, not striped
            row_frac = np.asarray(jnp.mean(keep, axis=1))
            assert row_frac.std() < 0.05, row_frac.std()

    def test_dropout_grads_match_reference(self):
        # custom_vjp recompute backward regenerates the kernel's exact masks
        from animal2vec_tpu.ops.fused_mlp import _ref_block_bf16, fused_block_mlp

        x, w1, b1, w2, b2 = make(64, 128, 128, 128, seed=42)
        l1s, l1b, l2s, l2b = make_ln(128, 43)
        seeds = jnp.asarray([55, 66, 77], jnp.int32)
        rng = np.random.default_rng(44)
        go = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        gt = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))

        def loss_fused(x, w1, b1, w2, b2, l1s, l1b, l2s, l2b):
            xo, t = fused_block_mlp(
                x, l1s, l1b, w1, w2, b1, b2, l2s, l2b, 1e-5,
                block_n=64, block_m=128,
                seeds=seeds, act_rate=0.25, post_rate=0.1,
            )
            return jnp.sum(xo * go) + jnp.sum(t * gt)

        def loss_ref(x, w1, b1, w2, b2, l1s, l1b, l2s, l2b):
            xo, t = _ref_block_bf16(
                x, l1s.reshape(1, -1), l1b.reshape(1, -1), w1,
                b1.reshape(1, -1), w2, b2.reshape(1, -1),
                l2s.reshape(1, -1), l2b.reshape(1, -1), 1e-5,
                seeds=seeds, act_rate=0.25, post_rate=0.1,
            )
            return jnp.sum(xo * go) + jnp.sum(t * gt)

        args = (x, w1, b1, w2, b2, l1s, l1b, l2s, l2b)
        v_f = loss_fused(*args)
        v_r = loss_ref(*args)
        np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-4)
        g_f = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
        g_r = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(
                np.asarray(a).ravel(), np.asarray(b).ravel(), rtol=1e-4, atol=1e-5
            )

    def test_int8_close_to_fp32(self):
        from animal2vec_tpu.ops.fused_mlp import fused_block_mlp

        x, w1, b1, w2, b2 = make(128, 128, 256, 128, seed=26)
        l1s, l1b, l2s, l2b = make_ln(128, 27)
        w1q, w1s = quantize_weight(w1)
        w2q, w2s = quantize_weight(w2)
        xo, t = fused_block_mlp(
            x, l1s, l1b, w1q, w2q, b1, b2, l2s, l2b, 1e-5, w1s, w2s,
            block_n=64, block_m=128,
        )
        ro, rt = ref_block(x, l1s, l1b, w1, b1, w2, b2, l2s, l2b)
        rel = np.sqrt(np.mean((np.asarray(xo) - np.asarray(ro)) ** 2) / np.mean(np.asarray(ro) ** 2))
        assert rel < 0.05, rel


class TestAltBlockFusedRouting:
    """AltBlock post-LN serving routes the whole MLP sub-block through
    fused_block_mlp; param tree and outputs must match the unfused path."""

    def _mk(self, **kw):
        from animal2vec_tpu.models.modules import AltBlock, BlockConfig

        cfg = BlockConfig(
            dim=128, num_heads=2, mlp_ratio=2.0, layer_norm_first=False,
            **kw,
        )
        return AltBlock(cfg=cfg)

    def test_fused_matches_unfused_same_tree(self, monkeypatch):
        rng = np.random.default_rng(30)
        x = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))

        monkeypatch.setenv("A2V_PALLAS_SERVE", "0")
        blk = self._mk()
        params = blk.init({"params": jax.random.PRNGKey(0)}, x)
        ro, rt = blk.apply(params, x)

        monkeypatch.setenv("A2V_PALLAS_SERVE", "1")
        params_f = blk.init({"params": jax.random.PRNGKey(0)}, x)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)
        xo, t = blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(xo), np.asarray(ro), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(rt), rtol=1e-4, atol=1e-4)

    def test_block_output_tap_when_not_ffn_targets(self, monkeypatch):
        rng = np.random.default_rng(31)
        x = jnp.asarray(rng.normal(size=(1, 32, 128)).astype(np.float32))
        monkeypatch.setenv("A2V_PALLAS_SERVE", "1")
        blk = self._mk(ffn_targets=False)
        params = blk.init({"params": jax.random.PRNGKey(0)}, x)
        xo, t = blk.apply(params, x)
        np.testing.assert_array_equal(np.asarray(xo), np.asarray(t))

    def test_training_dropout_routes_fused_with_seeds(self, monkeypatch):
        # finetune recipe (activation_dropout>0, drop_path 0): training now
        # routes through the kernel with in-kernel hash dropout; seeds come
        # from the "dropout" rng so realizations differ across keys
        import animal2vec_tpu.ops.fused_mlp as fm

        calls = []
        orig = fm.fused_block_mlp

        def spy(*a, **k):
            calls.append((k.get("act_rate"), k.get("post_rate"),
                          k.get("seeds") is not None))
            return orig(*a, **k)

        monkeypatch.setattr(fm, "fused_block_mlp", spy)
        rng = np.random.default_rng(32)
        x = jnp.asarray(rng.normal(size=(1, 32, 128)).astype(np.float32))
        monkeypatch.setenv("A2V_PALLAS_SERVE", "1")
        blk = self._mk(activation_dropout=0.5, post_mlp_drop=0.1)
        params = blk.init({"params": jax.random.PRNGKey(0)}, x)
        calls.clear()
        o1, _ = blk.apply(
            params, x, None, None, 0.0, False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert calls == [(0.5, 0.1, True)], calls
        o2, _ = blk.apply(
            params, x, None, None, 0.0, False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
        # deterministic call: rates off, no seeds
        calls.clear()
        blk.apply(params, x)
        assert calls == [(0.0, 0.0, False)], calls

    def test_training_dropout_opt_out_stays_unfused(self, monkeypatch):
        # A2V_FUSED_BLOCK_DROPOUT=0 keeps nonzero-dropout training on the
        # XLA path (flax nn.Dropout), still stochastic
        rng = np.random.default_rng(34)
        x = jnp.asarray(rng.normal(size=(1, 32, 128)).astype(np.float32))
        monkeypatch.setenv("A2V_PALLAS_SERVE", "1")
        monkeypatch.setenv("A2V_FUSED_BLOCK_DROPOUT", "0")
        blk = self._mk(activation_dropout=0.5)
        params = blk.init({"params": jax.random.PRNGKey(0)}, x)
        o1, _ = blk.apply(
            params, x, None, None, 0.0, False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        o2, _ = blk.apply(
            params, x, None, None, 0.0, False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_training_zero_dropout_grads_match(self, monkeypatch):
        # pretrain recipe (all MLP-branch dropouts 0.0): the non-deterministic
        # call routes through the fused block kernel under SERVE=1; its
        # custom_vjp must reproduce the pure-XLA path's gradients (fixed
        # linear cotangents sidestep fp32 summation-order noise)
        rng = np.random.default_rng(33)
        x = jnp.asarray(rng.normal(size=(2, 32, 128)).astype(np.float32))
        gx = jnp.asarray(rng.normal(size=(2, 32, 128)).astype(np.float32))
        gt = jnp.asarray(rng.normal(size=(2, 32, 128)).astype(np.float32))
        blk = self._mk()  # all dropout rates 0.0
        params = blk.init({"params": jax.random.PRNGKey(0)}, x)

        def loss(p, fused):
            monkeypatch.setenv("A2V_PALLAS_SERVE", "1" if fused else "0")
            xo, t = blk.apply(
                p, x, None, None, 0.0, False,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(xo * gx) + jnp.sum(t * gt)

        v_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
        v_r, g_r = jax.value_and_grad(lambda p: loss(p, False))(params)
        np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-4)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_r)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
            )


class TestMlpModuleRouting:
    def _mk(self, monkeypatch=None, force=None):
        from animal2vec_tpu.models.modules import Mlp

        if monkeypatch is not None and force is not None:
            monkeypatch.setenv("A2V_PALLAS_SERVE", force)
        return Mlp(hidden_dim=256, out_dim=128, dropout=0.1, dtype=jnp.float32)

    def test_fused_matches_unfused_and_same_param_tree(self, monkeypatch):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))

        monkeypatch.setenv("A2V_PALLAS_SERVE", "0")
        mlp = self._mk()
        params = mlp.init({"params": jax.random.PRNGKey(0)}, x, True)
        ref = mlp.apply(params, x, True)

        monkeypatch.setenv("A2V_PALLAS_SERVE", "1")
        params_f = mlp.init({"params": jax.random.PRNGKey(0)}, x, True)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
            params_f
        )
        out = mlp.apply(params, x, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_training_path_stays_unfused(self, monkeypatch):
        # non-deterministic call must keep the dropout-capable XLA path
        monkeypatch.setenv("A2V_PALLAS_SERVE", "1")
        mlp = self._mk()
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(1, 32, 128)).astype(np.float32))
        params = mlp.init({"params": jax.random.PRNGKey(0)}, x, True)
        out1 = mlp.apply(
            params, x, False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        out2 = mlp.apply(
            params, x, False, rngs={"dropout": jax.random.PRNGKey(2)}
        )
        # different dropout keys -> different outputs proves dropout engaged
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_training_zero_dropout_fuses_with_matching_grads(self, monkeypatch):
        # pretrain recipe (activation dropout 0.0): the non-deterministic
        # call routes through the fused kernel and its custom_vjp must
        # reproduce the XLA path's gradients
        from animal2vec_tpu.models.modules import Mlp

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(2, 32, 128)).astype(np.float32))
        mlp = Mlp(hidden_dim=256, out_dim=128, dropout=0.0, dtype=jnp.float32)
        params = mlp.init({"params": jax.random.PRNGKey(0)}, x, True)

        def loss(p, fused):
            monkeypatch.setenv("A2V_PALLAS_SERVE", "1" if fused else "0")
            out = mlp.apply(p, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out**2)

        v_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
        v_r, g_r = jax.value_and_grad(lambda p: loss(p, False))(params)
        np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)

    def test_unaligned_dims_fall_back(self, monkeypatch):
        from animal2vec_tpu.models.modules import Mlp

        monkeypatch.setenv("A2V_PALLAS_SERVE", "1")
        mlp = Mlp(hidden_dim=100, out_dim=96, dropout=0.0, dtype=jnp.float32)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(1, 16, 96)).astype(np.float32))
        params = mlp.init({"params": jax.random.PRNGKey(0)}, x, True)
        out = mlp.apply(params, x, True)  # must not hit the 128-divisible assert
        assert out.shape == (1, 16, 96)


class TestFusedEngagesUnderRemat:
    """Regression guard for the round-4 finding: under nn.remat the literal
    drop_path_rate=0.0 was traced into a tracer, so AltBlock's
    isinstance-float gate silently routed block-remat TRAINING through the
    unfused XLA MLP — no error, wrong (slower) program, and every A/B
    against it measured noise. Assert the kernel is actually reached, at
    trace time, through value_and_grad for every remat scope the configs
    ship (block = generic yaml fallback, attn = v5e pretrain recipe,
    mlp = finetune default)."""

    @pytest.mark.parametrize("scope", ["block", "attn", "mlp"])
    @pytest.mark.parametrize("act_drop", [0.0, 0.2])
    def test_training_backward_reaches_kernel(self, monkeypatch, scope, act_drop):
        import animal2vec_tpu.ops.fused_mlp as fm
        from animal2vec_tpu.models.modules import BlockConfig, BlockStack

        calls = []
        orig = fm.fused_block_mlp

        def spy(*a, **k):
            calls.append(scope)
            return orig(*a, **k)

        monkeypatch.setattr(fm, "fused_block_mlp", spy)
        monkeypatch.setenv("A2V_PALLAS_SERVE", "1")
        cfg = BlockConfig(
            dim=128, num_heads=2, mlp_ratio=2.0, layer_norm_first=False,
            activation_dropout=act_drop, remat_scope=scope,
        )
        stack = BlockStack(depth=2, cfg=cfg, remat=True)
        rng = np.random.default_rng(50)
        x = jnp.asarray(rng.normal(size=(1, 32, 128)).astype(np.float32))
        params = stack.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, None, None, False,
        )

        def loss(p):
            y, _, _ = stack.apply(
                p, x, None, None, False,
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            return jnp.sum(y**2)

        calls.clear()
        v, g = jax.value_and_grad(loss)(params)
        assert calls, (
            f"fused_block_mlp never reached under remat_scope={scope} "
            f"(training, act_drop={act_drop}) — the tracer-gate regression"
        )
        assert np.isfinite(float(v))
