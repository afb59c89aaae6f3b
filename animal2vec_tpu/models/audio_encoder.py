"""Audio modality encoder: conv frontend, conv relative positions, prenet.

Covers nn/modalities/audio.py (AudioEncoder) and the audio-relevant parts of
nn/modalities/base.py (ModalitySpecificEncoder). The mask/clone-batch
orchestration that the reference puts inside
``ModalitySpecificEncoder.contextualized_features`` (base.py:215-344) lives in
models/data2vec2.py here, because it owns the PRNG streams and the
student/teacher asymmetry; this module owns the parameters and the
shape-preserving sub-computations.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from animal2vec_tpu.config import AudioModalityConfig, parse_pylist
from animal2vec_tpu.models.frontend import ConvFeatureExtractor
from animal2vec_tpu.models.modules import (
    BlockConfig,
    Decoder1d,
    Fp32LayerNorm,
    PrenetEncoder,
    conv1d_same,
)
from animal2vec_tpu.ops.conv_arith import feature_extractor_out_length


def grad_multiply(x: jnp.ndarray, mult: float) -> jnp.ndarray:
    """Scale gradients flowing into the frontend
    (fairseq GradMultiply consumed at nn/modalities/base.py:194-207)."""
    if mult == 1.0:
        return x
    if mult == 0.0:
        return jax.lax.stop_gradient(x)
    return x * mult + jax.lax.stop_gradient(x) * (1.0 - mult)


class PosConvBlock(nn.Module):
    """One grouped-conv relative-position block
    (nn/modalities/audio.py:96-109): conv(k, groups) -> LN(no affine, fp32)
    -> GELU."""

    kernel: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        kern = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.kernel, dim // self.groups, dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        k = self.kernel
        pad = (k // 2, k // 2 - (1 if k % 2 == 0 else 0))  # conv pad + SamePad
        y = conv1d_same(x, kern.astype(self.dtype), bias.astype(self.dtype), 1, self.groups, pad=pad)
        y = Fp32LayerNorm(use_affine=False, name="norm")(y)
        return nn.gelu(y, approximate=False)


class AudioEncoder(nn.Module):
    """Parameters + pure sub-computations of the audio branch."""

    cfg: AudioModalityConfig
    embed_dim: int
    block_cfg: BlockConfig
    remat: bool = False
    remat_frontend: bool = False
    remat_decoder: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        conv_layers = [tuple(x) for x in parse_pylist(self.cfg.conv_feature_layers)]
        self._conv_layers = conv_layers
        feature_dim = conv_layers[-1][0]
        fe_cls = ConvFeatureExtractor
        if self.remat_frontend:
            # recompute the wav-rate conv activations in the backward instead
            # of saving them (deterministic is static arg 2)
            fe_cls = nn.remat(
                ConvFeatureExtractor, static_argnums=(2,), prevent_cse=False
            )
        self.local_encoder = fe_cls(
            conv_layers=conv_layers,
            mode=self.cfg.extractor_mode,
            conv_bias=False,
            sinc_input=self.cfg.sinc_input,
            apply_window_to_root=self.cfg.apply_window_to_root,
            sample_rate=self.cfg.sample_rate,
            sinc_norm=self.cfg.sinc_norm,
            use_pswish=self.cfg.use_pswish,
            dtype=self.dtype,
        )
        self.project_norm = Fp32LayerNorm(use_affine=True)
        self.project_linear = nn.Dense(self.embed_dim, dtype=self.dtype)
        k = max(3, self.cfg.conv_pos_width // self.cfg.conv_pos_depth)
        self.pos_blocks = [
            PosConvBlock(kernel=k, groups=self.cfg.conv_pos_groups, dtype=self.dtype)
            for _ in range(self.cfg.conv_pos_depth)
        ]
        if self.cfg.conv_pos_pre_ln:
            self.pos_pre_ln = Fp32LayerNorm(use_affine=True)
        self.context_encoder = PrenetEncoder(
            depth=self.cfg.prenet_depth,
            cfg=self.block_cfg,
            prenet_dropout=self.cfg.prenet_dropout,
            layerdrop=self.cfg.prenet_layerdrop,
            start_drop_path=self.cfg.start_drop_path_rate,
            end_drop_path=self.cfg.end_drop_path_rate,
            remat=self.remat,
            dtype=self.dtype,
        )
        if self.cfg.decoder is not None:
            d = self.cfg.decoder
            dec_cls = (
                nn.remat(Decoder1d, prevent_cse=False)
                if self.remat_decoder
                else Decoder1d
            )
            self.decoder = dec_cls(
                decoder_dim=d.decoder_dim,
                decoder_kernel=d.decoder_kernel,
                decoder_groups=d.decoder_groups,
                decoder_layers=d.decoder_layers,
                out_dim=self.embed_dim,
                decoder_residual=d.decoder_residual,
                projection_layers=d.projection_layers,
                projection_ratio=d.projection_ratio,
                lane_pack_max=d.lane_pack_max,
                dtype=self.dtype,
            )
        else:
            self.decoder = None
        if self.cfg.use_alibi_encoder:
            n_scales = (
                (self.cfg.prenet_depth + self.cfg.model_depth)
                if self.cfg.learned_alibi_scale_per_layer
                else 1
            )
            n_heads = self.cfg.num_alibi_heads if self.cfg.learned_alibi_scale_per_head else 1
            self.alibi_scale = self.param(
                "alibi_scale",
                nn.initializers.constant(self.cfg.alibi_scale),
                (n_scales, 1, n_heads, 1, 1),
                jnp.float32,
            )
        if self.cfg.num_extra_tokens > 0:
            def init_extra(key):
                if self.cfg.init_extra_token_zero:
                    tok = jnp.zeros((1, self.cfg.num_extra_tokens, self.embed_dim))
                    if self.cfg.num_extra_tokens > 1:
                        tok = tok.at[:, 1:].set(
                            jax.random.normal(key, (1, self.cfg.num_extra_tokens - 1, self.embed_dim))
                        )
                    return tok
                return jax.random.normal(key, (1, self.cfg.num_extra_tokens, self.embed_dim))

            self.extra_tokens = self.param("extra_tokens", init_extra)

    # --- sub-computations -------------------------------------------------

    def local_features(self, source, deterministic: bool = True):
        """(B, T_wav) -> (B, T_feat, embed): conv stack + fp32-LN + linear
        projection, with frontend gradient scaling
        (nn/modalities/base.py:194-213, audio.py:83-88)."""
        x = self.local_encoder(source, deterministic)
        x = grad_multiply(x, self.cfg.local_grad_mult)
        x = self.project_norm(x)
        x = self.project_linear(x)
        return x

    def relative_positions(self, x):
        """5-layer grouped-conv relative positional encoding
        (nn/modalities/audio.py:90-113)."""
        if self.cfg.conv_pos_pre_ln:
            x = self.pos_pre_ln(x)
        for blk in self.pos_blocks:
            x = blk(x)
        return x

    def prenet(
        self, x, padding_mask=None, bias=None, deterministic: bool = True,
        bias_scales=None,
    ):
        return self.context_encoder(
            x, padding_mask, bias, deterministic, bias_scales=bias_scales
        )

    def decode(self, x):
        assert self.decoder is not None
        return self.decoder(x)

    def scaled_alibi(self, bias: jnp.ndarray) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Apply the learned per-head scale (clamped >= 0) to the (H,T,T)
        bias; returns (scaled bias, per-layer scales or None)
        (nn/modalities/base.py:292-314)."""
        if not self.cfg.use_alibi_encoder:
            return bias, None
        scale = jnp.clip(self.alibi_scale.astype(bias.dtype), 0.0, None)
        if scale.shape[0] == 1:
            # (1, 1, H, 1, 1) -> (H, 1, 1), broadcasts over (H, T, T)
            return bias * scale[0].reshape(-1, 1, 1), None
        return bias, scale

    def alibi_spec(self, positions: jnp.ndarray, has_sentinel: bool = False):
        """Structured ALiBi (slopes x positions) for the Pallas kernel path:
        returns (AlibiSpec, per-layer scales or None). The global learned
        scale folds into the slope vector; per-layer scales are applied
        inside BlockStack (nn/modalities/base.py:292-314 semantics without
        materializing any (T, T) bias)."""
        from animal2vec_tpu.models.attention import AlibiSpec
        from animal2vec_tpu.ops.alibi import alibi_slopes

        if not self.cfg.use_alibi_encoder:
            return None, None
        slopes = jnp.asarray(alibi_slopes(self.cfg.num_alibi_heads))
        scale = jnp.clip(self.alibi_scale.astype(jnp.float32), 0.0, None)
        if scale.shape[0] == 1:
            return (
                AlibiSpec(slopes * scale[0].reshape(-1), positions, has_sentinel),
                None,
            )
        return AlibiSpec(slopes, positions, has_sentinel), scale

    def feature_length(self, wav_len: int) -> int:
        return feature_extractor_out_length(wav_len, self._conv_layers)

    def convert_padding_mask(self, padding_mask: jnp.ndarray, t_feat: int) -> jnp.ndarray:
        """(B, T_wav) bool pad mask -> (B, T_feat) via the conv length
        arithmetic (nn/modalities/audio.py:151-197). Static-shape: builds the
        mask from per-row valid lengths."""
        lengths = jnp.sum(1 - padding_mask.astype(jnp.int32), axis=-1)
        # strided layers are the only length-changing ones (stride-1 = 'same')
        out_len = lengths
        for _, k, s in self._conv_layers:
            if s == 1:
                continue
            import math

            p = math.ceil(s / 2)
            out_len = (out_len + 2 * p - k) // s + 1
        idx = jnp.arange(t_feat)[None, :]
        return idx >= out_len[:, None]
