"""Image modality encoder (ViT-style) for multi-modal parity.

Covers nn/modalities/images.py: PatchEmbed (:266-300), fixed 2-D sincos
positions (nn/utils.py:351-398), 2-D block masking (images.py:200-239,
implemented statically in ops/masking.block_mask_2d), Decoder2d /
EncDec-transformer decoder selection (:124-144), and 2-D ALiBi (:146-152).
The reference ships it config-complete but unexercised by the MeerKAT task;
same status here, with unit tests.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from animal2vec_tpu.config import ImageModalityConfig
from animal2vec_tpu.models.modules import (
    BlockConfig,
    Decoder2d,
    EncDecTransformerDecoder,
    PrenetEncoder,
)


def sincos_pos_embed_2d(embed_dim: int, grid_size: int) -> np.ndarray:
    """Fixed 2-D sin-cos positional table (nn/utils.py:351-398)."""
    def embed_1d(pos):
        omega = np.arange(embed_dim // 4, dtype=np.float64)
        omega = 1.0 / 10000 ** (omega / (embed_dim / 4.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w first, matching the reference
    emb = np.concatenate([embed_1d(grid[0]), embed_1d(grid[1])], axis=1)
    return emb.astype(np.float32)  # (grid*grid, embed_dim)


class PatchEmbed(nn.Module):
    """Conv2d patchifier: (B, H, W, C) -> (B, P, D)
    (nn/modalities/images.py:266-300; NHWC here)."""

    patch_size: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch_size
        kern = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (p, p, c, self.embed_dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kern.astype(self.dtype),
            window_strides=(p, p),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)
        return y.reshape(b, -1, self.embed_dim)


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, P, p*p*3) (nn/modalities/images.py:171-183)."""
    b, hh, ww, c = imgs.shape
    p = patch_size
    h, w = hh // p, ww // p
    x = imgs.reshape(b, h, p, w, p, c)
    x = jnp.einsum("bhpwqc->bhwpqc", x)
    return x.reshape(b, h * w, p * p * c)


def unpatchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Inverse of patchify (nn/modalities/images.py:185-198)."""
    b, t, d = x.shape
    p = patch_size
    h = w = int(np.sqrt(t))
    c = d // (p * p)
    x = x.reshape(b, h, w, p, p, c)
    x = jnp.einsum("bhwpqc->bhpwqc", x)
    return x.reshape(b, h * p, w * p, c)


class ImageEncoder(nn.Module):
    """Image branch parameters + sub-computations (mirror of AudioEncoder's
    role; orchestration in models/data2vec2.py)."""

    cfg: ImageModalityConfig
    embed_dim: int
    block_cfg: BlockConfig
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.grid_size = c.input_size // c.patch_size
        self.num_patches = self.grid_size**2
        self.patch_embed = PatchEmbed(
            patch_size=c.patch_size, embed_dim=c.embed_dim, dtype=self.dtype
        )
        if c.embed_dim != self.embed_dim:
            self.patch_proj = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.pos_embed = jnp.asarray(
            sincos_pos_embed_2d(self.embed_dim, self.grid_size)
        )[None]
        self.context_encoder = PrenetEncoder(
            depth=c.prenet_depth,
            cfg=self.block_cfg,
            prenet_dropout=c.prenet_dropout,
            layerdrop=c.prenet_layerdrop,
            start_drop_path=c.start_drop_path_rate,
            end_drop_path=c.end_drop_path_rate,
            remat=self.remat,
            dtype=self.dtype,
        )
        if c.transformer_decoder and c.decoder is not None:
            self.decoder = EncDecTransformerDecoder(
                decoder_dim=c.decoder.decoder_dim,
                decoder_layers=c.decoder.decoder_layers,
                out_dim=self.embed_dim,
                dtype=self.dtype,
            )
        elif c.decoder is not None:
            self.decoder = Decoder2d(
                decoder_dim=c.decoder.decoder_dim,
                decoder_kernel=c.decoder.decoder_kernel,
                decoder_groups=c.decoder.decoder_groups,
                decoder_layers=c.decoder.decoder_layers,
                out_dim=self.embed_dim,
                h_size=self.grid_size,
                w_size=self.grid_size,
                dtype=self.dtype,
            )
        else:
            self.decoder = None
        if c.use_alibi_encoder:
            n_scales = (
                (c.prenet_depth + c.model_depth) if c.learned_alibi_scale_per_layer else 1
            )
            n_heads = c.num_alibi_heads if c.learned_alibi_scale_per_head else 1
            self.alibi_scale = self.param(
                "alibi_scale",
                nn.initializers.constant(c.alibi_scale),
                (n_scales, 1, n_heads, 1, 1),
                jnp.float32,
            )

    def scaled_alibi(self, bias):
        """Same contract as AudioEncoder.scaled_alibi."""
        if not self.cfg.use_alibi_encoder:
            return bias, None
        scale = jnp.clip(self.alibi_scale.astype(bias.dtype), 0.0, None)
        if scale.shape[0] == 1:
            return bias * scale[0].reshape(-1, 1, 1), None
        return bias, scale

    def local_features(self, imgs, deterministic: bool = True):
        """(B, H, W, 3) -> (B, P, embed)."""
        x = self.patch_embed(imgs)
        if self.cfg.embed_dim != self.embed_dim:
            x = self.patch_proj(x)
        if self.cfg.local_grad_mult == 0.0:
            x = jax.lax.stop_gradient(x)
        return x

    def fixed_positions(self, x):
        if not self.cfg.fixed_positions:
            return x
        return x + self.pos_embed.astype(x.dtype)

    def prenet(
        self, x, padding_mask=None, bias=None, deterministic: bool = True,
        bias_scales=None,
    ):
        return self.context_encoder(
            x, padding_mask, bias, deterministic, bias_scales=bias_scales
        )

    def decode(self, x, kv=None, deterministic: bool = True):
        assert self.decoder is not None
        if isinstance(self.decoder, EncDecTransformerDecoder):
            return self.decoder(x, kv, deterministic)
        return self.decoder(x)
