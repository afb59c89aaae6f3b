"""data2vec 2.0 multi-modal model: student/EMA-teacher masked prediction.

Covers nn/data2vec2.py (Data2VecMultiModel). Functional decomposition for the
TPU train loop:

* the module owns parameters and shape-preserving compute
  (:meth:`local_features`, :meth:`encode`, :meth:`decode_d2v`,
  :meth:`linear_eval`, :meth:`extract_features`),
* the *orchestration* — mixup, clone-batch, mask sampling, teacher apply with
  EMA params, loss assembly — lives in train/pretrain.py, because the teacher
  is just a second `apply` with a different param tree (the functional
  equivalent of fairseq's EMAModule, nn/data2vec2.py:345-410),
* mask targets are gathered with static-count index arrays (ids from
  MaskInfo), never boolean selections, so every shape is known to XLA.

Teacher parameter subset (ema_encoder_only=False, the shipped config
a2v_large_pretrain_best.yaml:97): everything except the frontend
(local_encoder + feature projection), the decoders, and recon_proj
(nn/data2vec2.py:362-384). `ema_param_label` encodes that rule.
"""

from __future__ import annotations

import ast
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from animal2vec_tpu.config import ModelConfig
from animal2vec_tpu.models.audio_encoder import AudioEncoder
from animal2vec_tpu.models.images import ImageEncoder, patchify
from animal2vec_tpu.models.modules import (
    BlockConfig,
    BlockStack,
    Decoder1d,
    Fp32LayerNorm,
    fp32_instance_norm,
    top_k_tap_average,
)
from animal2vec_tpu.ops import alibi_bias_1d, alibi_bias_2d
from animal2vec_tpu.ops.masking import (
    MaskInfo,
    apply_mask,
    gather_keep,
    masked_alibi,
    scatter_with_mask_tokens,
)


def _block_cfg(cfg: ModelConfig) -> BlockConfig:
    return BlockConfig(
        dim=cfg.embed_dim,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        encoder_dropout=cfg.encoder_dropout,
        attention_dropout=cfg.attention_dropout,
        activation_dropout=cfg.activation_dropout,
        post_mlp_drop=cfg.post_mlp_drop,
        norm_eps=cfg.norm_eps,
        norm_affine=cfg.norm_affine,
        layer_norm_first=cfg.layer_norm_first,
        ffn_targets=not cfg.end_of_block_targets,
        attn_impl=cfg.attn_impl,
        matmul_impl=cfg.matmul_impl,
        remat_scope=cfg.remat_scope,
    )


class Data2VecMulti(nn.Module):
    """Student/teacher trunk + modality encoders + decoders + optional
    frame-label head."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @property
    def modalities(self) -> List[str]:
        if self.cfg.supported_modality:
            return [self.cfg.supported_modality.upper()]
        return ["AUDIO", "IMAGE"]

    def setup(self):
        cfg = self.cfg
        bc = _block_cfg(cfg)
        mods = self.modalities
        if "AUDIO" in mods:
            self.audio_encoder = AudioEncoder(
                cfg=cfg.modalities.audio,
                embed_dim=cfg.embed_dim,
                block_cfg=bc,
                remat=cfg.remat,
                remat_frontend=cfg.remat_frontend,
                remat_decoder=cfg.remat_decoder,
                dtype=self.dtype,
            )
        if "IMAGE" in mods:
            self.image_encoder = ImageEncoder(
                cfg=cfg.modalities.image,
                embed_dim=cfg.embed_dim,
                block_cfg=bc,
                remat=cfg.remat,
                dtype=self.dtype,
            )
        self.blocks = BlockStack(
            depth=cfg.depth,
            cfg=bc,
            start_drop_path=cfg.start_drop_path_rate,
            end_drop_path=cfg.end_drop_path_rate,
            layerdrop=cfg.layerdrop,
            remat=cfg.remat,
            dtype=self.dtype,
            pipeline_stages=cfg.pipeline_stages,
            pipeline_microbatches=cfg.pipeline_microbatches,
        )
        if cfg.layer_norm_first:
            self.norm = Fp32LayerNorm(epsilon=cfg.norm_eps, use_affine=cfg.norm_affine)
        else:
            self.norm = None
        self.dropout_input = nn.Dropout(cfg.dropout_input)
        if cfg.with_labels:
            self.final_dropout = nn.Dropout(cfg.final_dropout)
            n_classes = len(ast.literal_eval(cfg.unique_labels))
            self.linear_eval_projection = nn.Dense(
                n_classes,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
            )
        if cfg.shared_decoder is not None:
            d = cfg.shared_decoder
            # remat_decoder: the decoder runs grouped convs at FULL length on
            # every clone row; recomputing it in the backward frees ~1 GB of
            # residuals for ~5 ms (pure function of its input — no rng/static
            # args, so nn.remat is a drop-in with identical param paths)
            dec_cls = (
                nn.remat(Decoder1d, prevent_cse=False)
                if cfg.remat_decoder
                else Decoder1d
            )
            self.shared_decoder = dec_cls(
                decoder_dim=d.decoder_dim,
                decoder_kernel=d.decoder_kernel,
                decoder_groups=d.decoder_groups,
                decoder_layers=d.decoder_layers,
                out_dim=cfg.embed_dim,
                decoder_residual=d.decoder_residual,
                projection_layers=d.projection_layers,
                projection_ratio=d.projection_ratio,
                lane_pack_max=d.lane_pack_max,
                dtype=self.dtype,
            )
        else:
            self.shared_decoder = None
        if cfg.recon_loss > 0:
            # project to the patchified pixel dim. The reference projects
            # embed->embed and relies on p^2*in_chans == embed
            # (nn/data2vec2.py:303-305,883-902); for the canonical 224/16
            # image config they coincide, so this generalization is
            # parity-preserving.
            img = cfg.modalities.image
            recon_dim = (
                img.patch_size**2 * img.in_chans
                if "IMAGE" in self.modalities
                else cfg.embed_dim
            )
            self.recon_proj = nn.Dense(recon_dim, dtype=self.dtype)
        else:
            self.recon_proj = None

    def __call__(self, source, mode: Optional[str] = None):
        """Initialization-coverage forward: touches every submodule so
        ``model.init`` creates the full parameter tree (frontend, prenet,
        trunk, decoders, label head). Training/inference use the explicit
        methods instead."""
        mode = (mode or self.modalities[0]).upper()
        local = self.local_features(source, mode)
        b, t, _ = local.shape
        mask = jnp.zeros((b, t), jnp.int32).at[:, :2].set(1)
        info = MaskInfo(
            mask=mask,
            ids_shuffle=jnp.argsort(mask, axis=1, stable=True),
            ids_restore=jnp.argsort(jnp.argsort(mask, axis=1, stable=True), axis=1),
            ids_keep=jnp.argsort(mask, axis=1, stable=True)[:, : t - 2],
        )
        x, taps, _, keeps = self.encode(local, mode, info, remove_masked=True)
        outs = self.decode_d2v(x, mode, info)
        if self.recon_proj is not None and outs:
            self.recon_head(outs[0])
        if self.cfg.with_labels:
            self.linear_eval(taps, mode, None, keeps=keeps)
        return outs[0] if outs else x

    # ------------------------------------------------------------------
    def _enc(self, mode: str):
        return self.audio_encoder if mode.upper() == "AUDIO" else self.image_encoder

    def local_features(self, source, mode: str = "AUDIO", deterministic: bool = True):
        """Raw modality input -> (B, T, embed) local features
        (nn/modalities/base.py:194-213)."""
        return self._enc(mode).local_features(source, deterministic=deterministic)

    def _alibi(self, mode: str, t: int):
        enc = self._enc(mode)
        if mode.upper() == "AUDIO":
            if not enc.cfg.use_alibi_encoder:
                return None, None
            bias = alibi_bias_1d(t, enc.cfg.num_alibi_heads)
        else:
            if not enc.cfg.use_alibi_encoder:
                return None, None
            bias = alibi_bias_2d(t, enc.cfg.num_alibi_heads, enc.cfg.alibi_distance)
        return enc.scaled_alibi(bias)

    def encode(
        self,
        local: jnp.ndarray,
        mode: str = "AUDIO",
        mask_info: Optional[MaskInfo] = None,
        remove_masked: bool = False,
        padding_mask: Optional[jnp.ndarray] = None,
        channel_mask: Optional[jnp.ndarray] = None,
        zero_mask: bool = True,
        deterministic: bool = True,
        reduce_targets: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """Contextualize local features and run the trunk.

        Mirrors ModalitySpecificEncoder.contextualized_features
        (nn/modalities/base.py:215-344) followed by the trunk block loop
        (nn/data2vec2.py:640-674). Returns (x, taps, padding_mask, keeps)
        where taps is (depth, B, T_or_K, C) and keeps is the (depth,)
        layerdrop survival flags (None unless training with layerdrop>0) —
        consumers average taps via modules.top_k_tap_average to match the
        reference's kept-layers-only layer_results list.

        ``reduce_targets=True`` (EMA teacher path) streams the top-k
        layer-average target computation through the trunk scan: the second
        return value becomes the fp32 (B, T, C) *sum* of the last-k
        per-layer-normalized taps (divide by k and finish_targets() to get
        the reference's make_targets result) and no (depth, B, T, C) stack
        is ever materialized.
        """
        enc = self._enc(mode)
        b, t, c = local.shape
        x = local
        if mode.upper() == "IMAGE":
            x = enc.fixed_positions(x)

        if mask_info is not None:
            x_pre = x  # keep-set values are identical pre/post zeroing
            rng = None if zero_mask else self.make_rng("mask_noise")
            x = apply_mask(
                x, mask_info, rng=rng, zero_mask=zero_mask,
                noise_std=enc.cfg.mask_noise_std,
            )
        if channel_mask is not None:
            x = x * (1 - channel_mask[:, None, :].astype(x.dtype))

        # relative positions computed on the (masked) full sequence
        x_pos = None
        if mode.upper() == "AUDIO":
            x_pos = enc.relative_positions(x)

        if mask_info is not None and remove_masked:
            x = gather_keep(x_pre, mask_info)
            if x_pos is not None:
                x = x + gather_keep(x_pos, mask_info)
            if padding_mask is not None:
                padding_mask = jnp.take_along_axis(padding_mask, mask_info.ids_keep, axis=1)
        elif x_pos is not None:
            x = x + x_pos

        num_extra = enc.cfg.num_extra_tokens
        if mode.upper() == "AUDIO":
            # structured ALiBi: positions instead of a (T,T) bias. The
            # masked-student path just carries the kept original positions
            # (equivalent to masked_alibi's bias gather, base.py:681-698).
            bsz = x.shape[0]
            if mask_info is not None and remove_masked:
                positions = mask_info.ids_keep.astype(jnp.int32)
            else:
                # (1, T): the leading 1 statically marks batch-uniform
                # contiguous positions — the packed serving kernel's
                # distance-tile fast path keys on it (pallas_attention
                # _kernel_serve_nk1); general entries broadcast to (B, T)
                positions = jnp.arange(t, dtype=jnp.int32)[None]
            if num_extra > 0:  # extra tokens -> zero-bias sentinel positions
                positions = jnp.pad(
                    positions, ((0, 0), (num_extra, 0)), constant_values=-1
                )
            bias, scales = enc.alibi_spec(positions, has_sentinel=num_extra > 0)
        else:
            bias, scales = self._alibi(mode, t)
            if bias is not None:
                bias = jnp.broadcast_to(bias[None], (b,) + bias.shape)
                if mask_info is not None and remove_masked:
                    bias = masked_alibi(bias, mask_info)
                if num_extra > 0:
                    bias = jnp.pad(
                        bias, ((0, 0), (0, 0), (num_extra, 0), (num_extra, 0))
                    )

        # extra (CLS) tokens (nn/modalities/base.py:316-324)
        if num_extra > 0:
            tok = jnp.broadcast_to(
                enc.extra_tokens.astype(x.dtype), (x.shape[0], num_extra, x.shape[-1])
            )
            x = jnp.concatenate([tok, x], axis=1)
            if padding_mask is not None:
                padding_mask = jnp.pad(padding_mask, ((0, 0), (num_extra, 0)))

        prenet_scales = trunk_scales = None
        if scales is not None:
            prenet_scales = scales[: enc.cfg.prenet_depth]
            trunk_scales = scales[enc.cfg.prenet_depth:]

        # pad the whole trunk once to the flash kernel's block length (extra
        # tokens key-masked) instead of padding q/k/v inside every layer
        from animal2vec_tpu.models.attention import AlibiSpec, pallas_eligible
        from animal2vec_tpu.ops.pallas_attention import attention_padded_len

        t_run = x.shape[1]
        attn_dropout_active = (
            not deterministic and _block_cfg(self.cfg).attention_dropout > 0
        )
        t_padded = t_run
        if isinstance(bias, AlibiSpec) and pallas_eligible(
            bias, t_run, attn_dropout_active, self.cfg.attn_impl
        ):
            t_padded = attention_padded_len(t_run)
        fabricated_mask = False
        if t_padded != t_run:
            extra = t_padded - t_run
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
            bias = bias.replace(
                positions=jnp.pad(bias.positions, ((0, 0), (0, extra)))
            )
            if padding_mask is None:
                padding_mask = jnp.zeros((x.shape[0], t_run), bool)
                fabricated_mask = True
            padding_mask = jnp.pad(
                padding_mask, ((0, 0), (0, extra)), constant_values=True
            )

        x = enc.prenet(x, padding_mask, bias, deterministic, bias_scales=prenet_scales)
        x = self.dropout_input(x, deterministic=deterministic)
        tap_reduce = tap_weights = None
        if reduce_targets:
            k = self.cfg.average_top_k_layers
            tap_weights = (
                jnp.arange(self.cfg.depth) >= self.cfg.depth - k
            ).astype(jnp.float32)

            def tap_reduce(tap):
                # normalize only the real sequence: the trunk-level kernel
                # padding (t_run -> t_padded) must not pollute the norm
                # statistics (the stacked path trims before make_targets)
                tl = normalize_target_layer(tap[:, :t_run], self.cfg)
                if t_padded != t_run:
                    tl = jnp.pad(tl, ((0, 0), (0, t_padded - t_run), (0, 0)))
                return tl

        x, taps, keeps = self.blocks(
            x, padding_mask, bias, deterministic, bias_scales=trunk_scales,
            tap_reduce=tap_reduce, tap_weights=tap_weights,
        )
        if self.norm is not None:
            x = self.norm(x)
        if t_padded != t_run:
            x = x[:, :t_run]
            taps = taps[:, :t_run] if reduce_targets else taps[:, :, :t_run]
            padding_mask = None if fabricated_mask else padding_mask[:, :t_run]
        return x, taps, padding_mask, keeps

    def decode_d2v(
        self,
        x: jnp.ndarray,
        mode: str = "AUDIO",
        mask_info: Optional[MaskInfo] = None,
        deterministic: bool = True,
    ) -> List[jnp.ndarray]:
        """Run shared and/or modality decoders on the student output
        (nn/data2vec2.py:730-748, base.py:162-192). Returns full-length
        (B, T, C) predictions, one per active decoder."""
        enc = self._enc(mode)
        outs = []
        for decoder, dcfg in (
            (self.shared_decoder, self.cfg.shared_decoder),
            (enc.decoder, enc.cfg.decoder),
        ):
            if decoder is None:
                continue
            y = x
            inp_drop = dcfg.input_dropout if dcfg is not None else 0.0
            if inp_drop > 0 and not deterministic:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - inp_drop, y.shape
                )
                y = y * keep / (1.0 - inp_drop)
            if mask_info is not None:
                y = scatter_with_mask_tokens(
                    y,
                    mask_info,
                    self.make_rng("mask_noise"),
                    noise_std=enc.cfg.mask_noise_std,
                    num_extra=enc.cfg.num_extra_tokens,
                )
            elif enc.cfg.num_extra_tokens:
                y = y[:, enc.cfg.num_extra_tokens:]
            outs.append(decoder(y))
        return outs

    def linear_eval(
        self,
        taps: jnp.ndarray,
        mode: str = "AUDIO",
        mask_info: Optional[MaskInfo] = None,
        deterministic: bool = True,
        keeps: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Frame-label logits from detached averaged layer taps
        (nn/data2vec2.py:676-712): used as a supervised linear probe during
        pretraining. Decoders (no-grad) scatter keep-set taps back to full
        length when masking removed tokens. ``keeps`` excludes
        layerdrop-dropped layers from the average (reference appends no
        layer_result for them)."""
        k = self.cfg.average_top_k_layers
        x = jax.lax.stop_gradient(top_k_tap_average(taps, keeps, k))
        x = x.astype(taps.dtype)
        if self.norm is not None:
            x = self.norm(x)
        if mask_info is not None:
            enc = self._enc(mode)
            if self.shared_decoder is not None or enc.decoder is not None:
                outs = self.decode_d2v(
                    jax.lax.stop_gradient(x), mode, mask_info, deterministic
                )
                x = jax.lax.stop_gradient(outs[-1])
        x = self.final_dropout(x, deterministic=deterministic)
        return self.linear_eval_projection(x)

    def extract_features(
        self,
        source: jnp.ndarray,
        mode: str = "AUDIO",
        padding_mask: Optional[jnp.ndarray] = None,
        mask_info: Optional[MaskInfo] = None,
        channel_mask: Optional[jnp.ndarray] = None,
        zero_mask: bool = True,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """features_only forward (nn/data2vec2.py:1112-1123 ->
        forward(features_only=True) :714-728): full-sequence encoding, no
        removal, optional masking-as-regularization."""
        local = self.local_features(source, mode, deterministic)
        if padding_mask is not None and mode.upper() == "AUDIO":
            padding_mask = self._enc(mode).convert_padding_mask(
                padding_mask, local.shape[1]
            )
        x, taps, pad, keeps = self.encode(
            local,
            mode,
            mask_info=mask_info,
            remove_masked=False,
            padding_mask=padding_mask,
            channel_mask=channel_mask,
            zero_mask=zero_mask,
            deterministic=deterministic,
        )
        out = {"x": x, "layer_results": taps, "padding_mask": pad}
        if keeps is not None:
            out["layer_keeps"] = keeps
        if self.cfg.with_labels:
            out["linear_eval_projection"] = self.linear_eval(
                taps, mode, None, deterministic, keeps=keeps
            )
        return out

    def recon_head(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reconstruction projection (nn/data2vec2.py:896-898)."""
        return self.recon_proj(x) if self.recon_proj is not None else x

    def patchify_targets(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """Recon-loss targets for the image modality
        (nn/data2vec2.py:883-894)."""
        p = self.cfg.modalities.image.patch_size
        target = patchify(imgs, p)
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        return (target - mean) / jnp.sqrt(var + 1e-6)


def normalize_target_layer(tl: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Per-layer target normalizations on a single fp32 (B, T, C) tap
    (nn/data2vec2.py:1035-1056). Every configured norm reduces within one
    layer, which is what makes streaming accumulation possible."""
    if cfg.batch_norm_target_layer:
        mean = tl.mean(axis=(0, 1), keepdims=True)
        var = tl.var(axis=(0, 1), keepdims=True)
        tl = (tl - mean) * jax.lax.rsqrt(var + 1e-5)
    if cfg.instance_norm_target_layer:
        # per batch item, per channel over time
        mean = tl.mean(axis=1, keepdims=True)
        var = tl.var(axis=1, keepdims=True)
        tl = (tl - mean) * jax.lax.rsqrt(var + 1e-5)
    if cfg.layer_norm_target_layer:
        mean = tl.mean(axis=-1, keepdims=True)
        var = tl.var(axis=-1, keepdims=True)
        tl = (tl - mean) * jax.lax.rsqrt(var + 1e-5)
    return tl


def finish_targets(y: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Post-average target normalizations (nn/data2vec2.py:1058-1064).
    y: fp32 (B, T, C) mean of the normalized top-k taps."""
    if cfg.layer_norm_targets:
        mean = y.mean(axis=-1, keepdims=True)
        var = y.var(axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    if cfg.instance_norm_targets:
        y = fp32_instance_norm(y)
    return y


def make_targets(
    taps: jnp.ndarray,
    cfg: ModelConfig,
) -> jnp.ndarray:
    """Teacher targets: average the top-k layer taps with the configured
    normalizations (nn/data2vec2.py:1023-1066). taps: (depth, B, T, C).

    The training path streams this computation through the teacher's scan
    instead (encode(reduce_targets=True) + finish_targets), never stacking
    the (depth, B, T, C) fp32 taps; this stacked form remains for tests and
    feature extraction."""
    k = cfg.average_top_k_layers
    tl = taps[-k:].astype(jnp.float32)
    tl = jax.vmap(lambda l: normalize_target_layer(l, cfg))(tl)
    return finish_targets(tl.mean(axis=0), cfg)


def ema_param_label(path: Tuple[str, ...], ema_encoder_only: bool) -> bool:
    """True if the parameter at ``path`` belongs to the EMA teacher tree
    (nn/data2vec2.py:362-384)."""
    parts = set(path)
    if ema_encoder_only:
        return path[0] == "blocks"
    if path[0] in ("shared_decoder", "recon_proj"):
        return False
    if path[0] in ("audio_encoder", "image_encoder"):
        if path[1] in ("local_encoder", "project_norm", "project_linear", "decoder", "patch_embed", "patch_proj"):
            return False
        return True
    if path[0] in ("linear_eval_projection", "final_dropout"):
        # unused by the teacher forward; excluded to save HBM (the reference
        # copies them but never evaluates them, nn/data2vec2.py:374-382)
        return False
    return True
