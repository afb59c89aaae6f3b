"""Model-layer tests: module shapes, jit-ability, and numerical parity of the
transformer block / frontend against independently-constructed torch modules
with identical weights (the parity strategy of SURVEY.md §4b at module
granularity)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animal2vec_tpu.config import (
    AudioModalityConfig,
    DecoderConfig,
    ModelConfig,
    FinetuneModelConfig,
    ModalitiesConfig,
)
from animal2vec_tpu.models.modules import AltBlock, BlockConfig, BlockStack, Decoder1d
from animal2vec_tpu.models.frontend import ConvFeatureExtractor, SincConv
from animal2vec_tpu.models.data2vec2 import Data2VecMulti, make_targets, ema_param_label
from animal2vec_tpu.models.finetune import FinetuneModel
from animal2vec_tpu.ops import alibi_bias_1d, span_mask, expected_span_mask_tokens
from animal2vec_tpu.ops.masking import make_mask_info_static

TINY_CONV = "[(9, 7, 1)] + [(16, 4, 2)] + [(16, 3, 2)]"
LABELS = "['a', 'b', 'c', 'focal']"


def tiny_model_cfg(**kw):
    audio = AudioModalityConfig(
        prenet_depth=2,
        conv_pos_depth=2,
        conv_pos_width=10,
        conv_pos_groups=2,
        sinc_input=True,
        sinc_norm="layer_norm",
        use_pswish=True,
        use_alibi_encoder=True,
        learned_alibi_scale=True,
        learned_alibi_scale_per_head=True,
        mask_prob=0.5,
        mask_length=2,
        conv_feature_layers=TINY_CONV,
        sample_rate=8000,
        num_alibi_heads=4,
        model_depth=3,
        decoder=DecoderConfig(decoder_dim=12, decoder_groups=4, decoder_kernel=3, decoder_layers=2),
    )
    cfg = ModelConfig(
        depth=3,
        embed_dim=32,
        num_heads=4,
        average_top_k_layers=2,
        instance_norm_target_layer=True,
        supported_modality="AUDIO",
        encoder_dropout=0.0,
        attention_dropout=0.0,
        post_mlp_drop=0.0,
        remat=False,
        unique_labels=LABELS,
        conv_feature_layers=TINY_CONV,
        modalities=ModalitiesConfig(audio=audio),
        **kw,
    )
    return cfg


class TestBlockParityVsTorch:
    """Same weights into our AltBlock and a hand-built torch post-LN block:
    outputs must agree to fp32 tolerance (validates attention math, LN
    placement, residual wiring, tap choice)."""

    def _torch_block(self, torch, weights, x, bias):
        import torch.nn.functional as F

        d, h = 32, 4

        def lin(name, v):
            w = torch.tensor(weights[f"{name}_w"])  # (in, out) flax layout
            b = torch.tensor(weights[f"{name}_b"])
            return v @ w + b

        # attention
        b_, t, c = x.shape
        qkv = lin("qkv", x).reshape(b_, t, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (c // h) ** -0.5) @ k.transpose(-2, -1)
        attn = attn + torch.tensor(np.asarray(bias))
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b_, t, c)
        y = lin("proj", y)
        x = x + y
        r = F.layer_norm(x, (c,), torch.tensor(weights["norm1_s"]), torch.tensor(weights["norm1_b"]), eps=1e-5)
        y = lin("fc2", F.gelu(lin("fc1", r)))
        t_tap = y
        x = F.layer_norm(r + y, (c,), torch.tensor(weights["norm2_s"]), torch.tensor(weights["norm2_b"]), eps=1e-5)
        return x, t_tap

    def test_post_ln_block(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        b, t, d, h = 2, 24, 32, 4
        x = rng.normal(size=(b, t, d)).astype(np.float32)
        bias = np.asarray(alibi_bias_1d(t, h))[None].repeat(b, 0)

        cfg = BlockConfig(dim=d, num_heads=h, layer_norm_first=False, ffn_targets=True)
        blk = AltBlock(cfg=cfg)
        params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), None, jnp.asarray(bias))
        p = params["params"]
        weights = {
            "qkv_w": np.asarray(p["attn"]["qkv"]["kernel"]),
            "qkv_b": np.asarray(p["attn"]["qkv"]["bias"]),
            "proj_w": np.asarray(p["attn"]["proj"]["kernel"]),
            "proj_b": np.asarray(p["attn"]["proj"]["bias"]),
            "norm1_s": np.asarray(p["norm1"]["scale"]),
            "norm1_b": np.asarray(p["norm1"]["bias"]),
            "norm2_s": np.asarray(p["norm2"]["scale"]),
            "norm2_b": np.asarray(p["norm2"]["bias"]),
            "fc1_w": np.asarray(p["mlp"]["fc1"]["kernel"]),
            "fc1_b": np.asarray(p["mlp"]["fc1"]["bias"]),
            "fc2_w": np.asarray(p["mlp"]["fc2"]["kernel"]),
            "fc2_b": np.asarray(p["mlp"]["fc2"]["bias"]),
        }
        ours_x, ours_t = blk.apply(params, jnp.asarray(x), None, jnp.asarray(bias))
        ref_x, ref_t = self._torch_block(torch, weights, torch.tensor(x), bias)
        np.testing.assert_allclose(np.asarray(ours_x), ref_x.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours_t), ref_t.numpy(), rtol=2e-4, atol=2e-5)


class TestSincConvParity:
    def test_vs_torch_reflect_conv(self):
        torch = pytest.importorskip("torch")
        from animal2vec_tpu.ops.sinc import mel_init_filterbank, sinc_filters

        b, t, c, k = 2, 200, 8, 9
        x = np.random.default_rng(0).normal(size=(b, t)).astype(np.float32)
        m = SincConv(out_channels=c, kernel_size=k, sample_rate=8000)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(m.apply(params, jnp.asarray(x)))
        low = np.asarray(params["params"]["low_hz"])
        band = np.asarray(params["params"]["band_hz"])
        filt = np.asarray(sinc_filters(jnp.asarray(low), jnp.asarray(band), k, 8000))
        xt = torch.tensor(x)[:, None, :]
        xt = torch.nn.functional.pad(xt, (k // 2, k // 2), mode="reflect")
        ref = torch.nn.functional.conv1d(xt, torch.tensor(filt)[:, None, :])
        ref = ref.permute(0, 2, 1).numpy()
        assert ours.shape == ref.shape == (b, t, c)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestFrontend:
    def test_meerkat_shape(self):
        conv = [(127, 63, 1)] + [(512, 10, 5)] + [(512, 3, 2)] * 3 + [(512, 3, 1)] + [(512, 2, 1)] * 2
        m = ConvFeatureExtractor(conv_layers=conv, sinc_norm="layer_norm", use_pswish=True)
        x = jnp.zeros((1, 8000))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (1, 200, 512)  # 8 kHz -> 200 Hz

    def test_nonsinc_conv_vs_torch(self):
        torch = pytest.importorskip("torch")
        from animal2vec_tpu.models.modules import conv1d_same
        from animal2vec_tpu.ops.conv_arith import strided_pad_1d

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 100, 4)).astype(np.float32)
        kern = rng.normal(size=(10, 4, 8)).astype(np.float32) * 0.1
        ours = np.asarray(conv1d_same(jnp.asarray(x), jnp.asarray(kern), stride=5, pad=strided_pad_1d(5)))
        conv = torch.nn.Conv1d(4, 8, 10, stride=5, padding=3, bias=False)
        conv.weight.data = torch.tensor(kern).permute(2, 1, 0)
        ref = conv(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestData2VecMulti:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        cfg = tiny_model_cfg()
        model = Data2VecMulti(cfg=cfg)
        src = jnp.zeros((2, 800))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask_noise": jax.random.PRNGKey(1)},
            src,
        )
        return cfg, model, params

    def test_extract_features_shapes(self, model_and_params):
        cfg, model, params = model_and_params
        src = jnp.asarray(np.random.default_rng(0).normal(size=(2, 800)).astype(np.float32))
        out = model.apply(params, src, method=Data2VecMulti.extract_features)
        t_feat = 200  # 800 / 2 / 2
        assert out["x"].shape == (2, t_feat, 32)
        assert out["layer_results"].shape == (3, 2, t_feat, 32)

    def test_student_path_with_removal(self, model_and_params):
        cfg, model, params = model_and_params
        src = jnp.asarray(np.random.default_rng(1).normal(size=(2, 800)).astype(np.float32))
        local = model.apply(params, src, method=Data2VecMulti.local_features)
        t = local.shape[1]
        mask = span_mask(jax.random.PRNGKey(0), 2, t, 0.5, 2)
        m = expected_span_mask_tokens(t, 0.5, 2)
        info = make_mask_info_static(mask, m)
        x, taps, _, keeps = model.apply(
            params, local, "AUDIO", info, True, method=Data2VecMulti.encode
        )
        assert keeps is None  # deterministic encode: no layerdrop
        assert x.shape == (2, t - m, 32)
        outs = model.apply(
            params,
            x,
            "AUDIO",
            info,
            rngs={"mask_noise": jax.random.PRNGKey(1)},
            method=Data2VecMulti.decode_d2v,
        )
        assert len(outs) == 1 and outs[0].shape == (2, t, 32)

    def test_streaming_targets_equal_stacked(self, model_and_params):
        """encode(reduce_targets=True) + finish_targets must reproduce
        make_targets(stacked taps) exactly — the streaming path is the
        teacher's HBM-saving route (no (depth, B, T, C) stack)."""
        from animal2vec_tpu.models.data2vec2 import finish_targets

        cfg, model, params = model_and_params
        src = jnp.asarray(
            np.random.default_rng(7).normal(size=(2, 800)).astype(np.float32)
        )
        local = model.apply(params, src, method=Data2VecMulti.local_features)
        _, taps, _, _ = model.apply(
            params, local, "AUDIO", None, False, None, None, True, True,
            method=Data2VecMulti.encode,
        )
        want = make_targets(taps, cfg)
        _, acc, _, _ = model.apply(
            params, local, "AUDIO", None, False, None, None, True, True, True,
            method=Data2VecMulti.encode,
        )
        got = finish_targets(acc / cfg.average_top_k_layers, cfg)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_make_targets_instance_norm(self):
        cfg = tiny_model_cfg()
        taps = jnp.asarray(np.random.default_rng(2).normal(size=(3, 2, 10, 8)).astype(np.float32))
        y = make_targets(taps, cfg)
        assert y.shape == (2, 10, 8)
        # instance-normed per layer then averaged: roughly zero mean over time
        np.testing.assert_allclose(np.asarray(y.mean(axis=1)), 0.0, atol=1e-4)

    def test_ema_filter(self):
        assert ema_param_label(("blocks", "block", "attn"), False)
        assert ema_param_label(("audio_encoder", "context_encoder", "norm"), False)
        assert ema_param_label(("audio_encoder", "alibi_scale"), False)
        assert not ema_param_label(("audio_encoder", "local_encoder", "conv_0"), False)
        assert not ema_param_label(("audio_encoder", "decoder", "blocks_0"), False)
        assert not ema_param_label(("audio_encoder", "project_linear"), False)
        assert not ema_param_label(("shared_decoder", "x"), False)
        assert ema_param_label(("blocks", "x"), True)
        assert not ema_param_label(("audio_encoder", "context_encoder"), True)

    def test_with_labels_linear_eval(self):
        cfg = tiny_model_cfg(with_labels=True)
        model = Data2VecMulti(cfg=cfg)
        src = jnp.zeros((2, 800))
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, src, method=Data2VecMulti.extract_features
        )
        out = model.apply(params, src, method=Data2VecMulti.extract_features)
        assert out["linear_eval_projection"].shape == (2, 200, 4)


class TestFinetuneModel:
    def test_forward_and_freeze_gate(self):
        enc_cfg = tiny_model_cfg()
        # finetune removes decoders (nn/wav2vec2.py:170,183)
        enc_cfg = dataclasses.replace(
            enc_cfg,
            modalities=ModalitiesConfig(
                audio=dataclasses.replace(enc_cfg.modalities.audio, decoder=None)
            ),
        )
        ft_cfg = FinetuneModelConfig(
            unique_labels=LABELS, average_top_k_layers=2, sample_rate=8000
        )
        model = FinetuneModel(cfg=ft_cfg, encoder_cfg=enc_cfg)
        src = jnp.asarray(np.random.default_rng(0).normal(size=(2, 800)).astype(np.float32))
        params = model.init({"params": jax.random.PRNGKey(0)}, src)
        out = model.apply(params, src)
        assert out["encoder_out"].shape == (2, 200, 4)

        def loss(p, gate):
            o = model.apply(p, src, finetune_encoder=gate)
            return (o["encoder_out"].astype(jnp.float32) ** 2).sum()

        g_frozen = jax.grad(loss)(params, False)["params"]
        g_open = jax.grad(loss)(params, True)["params"]
        enc_grad_frozen = float(
            jnp.abs(g_frozen["encoder"]["blocks"]["block"]["attn"]["qkv"]["kernel"]).sum()
        )
        enc_grad_open = float(
            jnp.abs(g_open["encoder"]["blocks"]["block"]["attn"]["qkv"]["kernel"]).sum()
        )
        head_grad_frozen = float(jnp.abs(g_frozen["proj"]["kernel"]).sum())
        assert enc_grad_frozen == 0.0
        assert enc_grad_open > 0.0
        assert head_grad_frozen > 0.0

    def test_jit_forward(self):
        enc_cfg = tiny_model_cfg()
        ft_cfg = FinetuneModelConfig(unique_labels=LABELS, average_top_k_layers=2)
        model = FinetuneModel(cfg=ft_cfg, encoder_cfg=enc_cfg)
        src = jnp.zeros((1, 800))
        params = model.init({"params": jax.random.PRNGKey(0)}, src)

        @jax.jit
        def fwd(p, s):
            return model.apply(p, s)["encoder_out"]

        out = fwd(params, src)
        assert out.shape == (1, 200, 4)


class TestInt8Serving:
    """Serving-only int8 trunk matmuls (model.matmul_impl=int8): same param
    tree as bf16, bounded quantization error."""

    def test_quantized_matmul_error(self, rng):
        from animal2vec_tpu.models.modules import quantized_matmul

        x = jnp.asarray(rng.normal(size=(4, 64, 96)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(96, 128)).astype(np.float32))
        exact = np.asarray(x @ w)
        got = np.asarray(quantized_matmul(x, w))
        rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
        assert rel < 0.02, rel  # int8 per-token/per-channel: ~1% RMS

    def test_int8_model_logits_close_and_same_tree(self, rng):
        from animal2vec_tpu.models.finetune import FinetuneModel
        from animal2vec_tpu.config import FinetuneModelConfig

        enc_cfg = tiny_model_cfg()
        ft_cfg = FinetuneModelConfig(unique_labels=LABELS, average_top_k_layers=2)
        src = jnp.asarray(rng.normal(size=(2, 800)).astype(np.float32))

        m_bf = FinetuneModel(cfg=ft_cfg, encoder_cfg=enc_cfg)
        v = m_bf.init({"params": jax.random.PRNGKey(0)}, src)
        base = np.asarray(m_bf.apply(v, src)["encoder_out"], np.float32)

        import dataclasses as dc

        enc8 = dc.replace(enc_cfg, matmul_impl="int8")
        m_i8 = FinetuneModel(cfg=ft_cfg, encoder_cfg=enc8)
        v8 = m_i8.init({"params": jax.random.PRNGKey(0)}, src)
        # identical parameter trees: the same checkpoint serves both numerics
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v8)
        got = np.asarray(m_i8.apply(v, src)["encoder_out"], np.float32)
        # documented error budget: quantization noise accumulated over the
        # trunk stays well under the 0.175 decision threshold scale
        assert np.max(np.abs(got - base)) < 0.05, np.max(np.abs(got - base))
        rel = np.linalg.norm(got - base) / np.linalg.norm(base)
        assert rel < 0.02, rel

    def test_int8_attn_model_routing_and_logits(self, rng, monkeypatch):
        """model.matmul_impl=int8_attn routes through the int8 flash kernel
        (forced via A2V_FLASH_INTERPRET on CPU) with the same param tree and
        a bounded extra quantization error on top of int8 trunk matmuls."""
        from animal2vec_tpu.models.finetune import FinetuneModel
        from animal2vec_tpu.config import FinetuneModelConfig
        import dataclasses as dc

        monkeypatch.setenv("A2V_FLASH_INTERPRET", "1")
        enc_cfg = tiny_model_cfg()
        ft_cfg = FinetuneModelConfig(unique_labels=LABELS, average_top_k_layers=2)
        src = jnp.asarray(rng.normal(size=(2, 800)).astype(np.float32))

        m_bf = FinetuneModel(cfg=ft_cfg, encoder_cfg=enc_cfg)
        v = m_bf.init({"params": jax.random.PRNGKey(0)}, src)
        base = np.asarray(m_bf.apply(v, src)["encoder_out"], np.float32)

        enc8 = dc.replace(enc_cfg, matmul_impl="int8_attn")
        m_i8 = FinetuneModel(cfg=ft_cfg, encoder_cfg=enc8)
        v8 = m_i8.init({"params": jax.random.PRNGKey(0)}, src)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v8)
        got = np.asarray(m_i8.apply(v, src)["encoder_out"], np.float32)
        assert np.max(np.abs(got - base)) < 0.08, np.max(np.abs(got - base))
        rel = np.linalg.norm(got - base) / np.linalg.norm(base)
        assert rel < 0.03, rel


class TestLayerdrop:
    """Exact reference layerdrop tap semantics: the reference appends a
    layer_result only for surviving layers (nn/data2vec2.py:649-674), so the
    top-k average runs over the last k *kept* layers. Our static-shape
    equivalent weights all taps by the (depth,) keep flags."""

    def test_top_k_tap_average_matches_list_semantics(self):
        from animal2vec_tpu.models.modules import top_k_tap_average

        rng = np.random.default_rng(3)
        depth, k = 6, 3
        taps = jnp.asarray(rng.normal(size=(depth, 2, 4, 8)).astype(np.float32))
        for trial in range(8):
            keeps_np = rng.integers(0, 2, size=depth).astype(np.float32)
            got = np.asarray(top_k_tap_average(taps, jnp.asarray(keeps_np), k))
            kept = [np.asarray(taps[i]) for i in range(depth) if keeps_np[i] == 1]
            if kept:
                want = np.mean(kept[-k:], axis=0)
            else:
                want = np.zeros_like(got)  # all-dropped: defined as 0, not NaN
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_top_k_tap_average_none_keeps_fast_path(self):
        from animal2vec_tpu.models.modules import top_k_tap_average

        taps = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 1, 3, 5)).astype(np.float32)
        )
        got = np.asarray(top_k_tap_average(taps, None, 2))
        np.testing.assert_allclose(got, np.asarray(taps[-2:]).mean(axis=0), rtol=1e-6)

    def test_blockstack_emits_keep_flags(self):
        cfg = BlockConfig(dim=16, num_heads=2, mlp_ratio=2.0)
        stack = BlockStack(depth=4, cfg=cfg, layerdrop=0.5)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 6, 16)).astype(np.float32))
        params = stack.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "layerdrop": jax.random.PRNGKey(2)},
            x, None, None, False,
        )
        _, _, keeps_det = stack.apply(params, x, None, None, True)
        assert keeps_det is None  # inference never drops
        y, taps, keeps = stack.apply(
            params, x, None, None, False,
            rngs={"dropout": jax.random.PRNGKey(3), "layerdrop": jax.random.PRNGKey(4)},
        )
        keeps = np.asarray(keeps)
        assert keeps.shape == (4,)
        assert set(np.unique(keeps)).issubset({0.0, 1.0})
        # dropped layers pass x through: their tap equals the incoming carry,
        # but the weighted average excludes them regardless of the value
        assert taps.shape == (4, 2, 6, 16)


class TestRematScopes:
    """Rematerialization must be numerics-neutral: grads under
    remat_scope in {"block", "mlp", "attn"} match the no-remat stack
    exactly (same ops, identical rng replay in the recompute).

    The "attn" scope (round 4) remats the attention sub-block on top of
    the self-rematting fused MLP block — block-remat memory, but each
    sub-block recomputes once instead of the fused kernel re-running
    twice ("block" scope's remat recompute + the vjp's own recompute)."""

    def _grads(self, scope, fused, monkeypatch, dropout=True):
        monkeypatch.setenv("A2V_PALLAS_SERVE", "1" if fused else "0")
        cfg = BlockConfig(
            dim=128, num_heads=2, mlp_ratio=2.0, layer_norm_first=False,
            attention_dropout=0.3 if dropout else 0.0,
            activation_dropout=0.2 if dropout else 0.0,
            remat_scope=scope,
        )
        stack = BlockStack(depth=2, cfg=cfg, remat=scope != "none")
        rng = np.random.default_rng(40)
        x = jnp.asarray(rng.normal(size=(2, 32, 128)).astype(np.float32))
        gx = jnp.asarray(rng.normal(size=(2, 32, 128)).astype(np.float32))
        params = stack.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, None, None, False,
        )

        def loss(p):
            y, _, _ = stack.apply(
                p, x, None, None, False,
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            return jnp.sum(y * gx)

        v, g = jax.value_and_grad(loss)(params)
        return float(v), g

    @pytest.mark.parametrize("fused", [False, True])
    def test_all_scopes_match_no_remat(self, monkeypatch, fused):
        v0, g0 = self._grads("none", fused, monkeypatch)
        leaves0 = jax.tree_util.tree_leaves(g0)
        for scope in ("block", "mlp", "attn"):
            v, g = self._grads(scope, fused, monkeypatch)
            np.testing.assert_allclose(v, v0, rtol=1e-5, err_msg=scope)
            for a, b in zip(jax.tree_util.tree_leaves(g), leaves0):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                    err_msg=scope,
                )

    def test_attn_scope_zero_dropout_fused(self, monkeypatch):
        # the pretrain recipe shape: zero branch dropouts, fused block vjp
        # + attention remat composing inside one scanned block
        v0, g0 = self._grads("block", True, monkeypatch, dropout=False)
        v, g = self._grads("attn", True, monkeypatch, dropout=False)
        np.testing.assert_allclose(v, v0, rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g0)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
