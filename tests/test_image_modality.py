"""Image (ViT) modality tests: encoder shapes, 2-D sincos positions,
patchify round-trip, and the full image pretrain loss path with 2-D block
masking (modality parity with nn/modalities/images.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animal2vec_tpu.config import (
    Config,
    CriterionConfig,
    ImageModalityConfig,
    DecoderConfig,
    MixupConfig,
    ModalitiesConfig,
    ModelConfig,
    OptimizationConfig,
    resolve,
)
from animal2vec_tpu.models.data2vec2 import Data2VecMulti
from animal2vec_tpu.models.images import patchify, sincos_pos_embed_2d, unpatchify


def tiny_image_cfg(**kw):
    image = ImageModalityConfig(
        prenet_depth=2,
        input_size=32,
        patch_size=8,
        in_chans=3,
        embed_dim=32,
        use_alibi_encoder=True,
        learned_alibi_scale=True,
        mask_prob=0.6,
        mask_length=2,
        num_alibi_heads=4,
        model_depth=2,
        decoder=DecoderConfig(decoder_dim=16, decoder_groups=4, decoder_kernel=3, decoder_layers=2),
    )
    return ModelConfig(
        depth=2,
        embed_dim=32,
        num_heads=4,
        average_top_k_layers=2,
        instance_norm_target_layer=True,
        supported_modality="IMAGE",
        encoder_dropout=0.0,
        attention_dropout=0.0,
        post_mlp_drop=0.0,
        remat=False,
        clone_batch=2,
        modalities=ModalitiesConfig(image=image),
        **kw,
    )


class TestSincos:
    def test_shape_and_range(self):
        emb = sincos_pos_embed_2d(32, 4)
        assert emb.shape == (16, 32)
        assert np.abs(emb).max() <= 1.0 + 1e-6


class TestPatchify:
    def test_round_trip(self):
        imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32))
        p = patchify(imgs, 8)
        assert p.shape == (2, 16, 192)
        back = unpatchify(p, 8)
        np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), atol=1e-6)


class TestImageEncoder:
    def test_extract_features(self):
        cfg = tiny_image_cfg()
        model = Data2VecMulti(cfg=cfg)
        imgs = jnp.zeros((2, 32, 32, 3))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask_noise": jax.random.PRNGKey(1)},
            imgs, "IMAGE",
        )
        out = model.apply(params, imgs, "IMAGE", method=Data2VecMulti.extract_features)
        assert out["x"].shape == (2, 16, 32)
        assert out["layer_results"].shape == (2, 2, 16, 32)


class TestImagePretrain:
    def test_pretrain_loss_runs(self):
        from animal2vec_tpu.train.pretrain import pretrain_loss
        from animal2vec_tpu.train.state import PretrainState
        from animal2vec_tpu.train.optim import build_optimizer

        cfg = Config()
        cfg.model = tiny_image_cfg(recon_loss=1.0)
        cfg.criterion = CriterionConfig()
        cfg.optimization = OptimizationConfig(lr=1e-3, max_update=100, warmup_updates=5)
        cfg = resolve(cfg)
        model = Data2VecMulti(cfg=cfg.model)
        imgs = jnp.zeros((2, 32, 32, 3))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask_noise": jax.random.PRNGKey(1)},
            imgs, "IMAGE",
        )["params"]
        tx, _ = build_optimizer(cfg.optimization, params)
        state = PretrainState.create(params, tx, cfg.model)
        batch = {
            "source": jnp.asarray(
                np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
            )
        }
        loss, metrics = pretrain_loss(
            state.params, state.ema_params, batch, jax.random.PRNGKey(2), model, cfg
        )
        assert np.isfinite(float(loss))
        assert "loss_recon" in metrics
        assert float(metrics["target_var"]) > 0.0
