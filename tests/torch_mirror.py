"""Test-only torch mirror of the reference finetune-inference composition.

Reimplements, in torch and with fairseq-compatible module naming, the exact
forward path a released animal2vec checkpoint takes at inference:

    Wav2VecEncoderModOut.forward (features path)         nn/wav2vec2.py:433-472
    -> Data2VecMultiModel.forward(features_only=True)    nn/data2vec2.py:516-728
       -> ModalitySpecificEncoder.contextualized_features  nn/modalities/base.py:215-344
          -> ConvFeatureExtractionModel                 nn/utils.py:1043-1163
             -> SincConv                                 nn/sinc.py
          -> project_features / relative_positional_encoder  nn/modalities/audio.py:83-113
          -> BlockEncoder prenet                         nn/modalities/modules.py:74-108
       -> AltBlock trunk + layer taps                    nn/modalities/modules.py:272-410
    -> average last-k taps -> proj                       nn/wav2vec2.py:449-472

Because the module tree uses the same names as fairseq's state dict
(``modality_encoders.AUDIO.local_encoder.conv_layers.N...``,
``blocks.N.attn.qkv``, ``w2v_encoder.proj``), ``load_state_dict(strict=True)``
over an exported checkpoint validates the converter's name mapping against the
real fairseq naming, and the forward validates the full composition (norm
placement, padding conventions, ALiBi scaling, tap selection) — not just
per-op math. Used by tests/test_parity.py.

This file is NOT part of the framework; torch is a test dependency only.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# small fairseq-module mirrors
# ---------------------------------------------------------------------------


class TransposeLast(nn.Module):
    def forward(self, x):
        return x.transpose(-2, -1)


class SamePad(nn.Module):
    """Trim the trailing element after a k//2-padded conv when k is even."""

    def __init__(self, kernel_size):
        super().__init__()
        self.remove = 1 if kernel_size % 2 == 0 else 0

    def forward(self, x):
        if self.remove > 0:
            x = x[:, :, : -self.remove]
        return x


class Fp32LayerNorm(nn.LayerNorm):
    def forward(self, x):
        out = F.layer_norm(
            x.float(),
            self.normalized_shape,
            self.weight.float() if self.weight is not None else None,
            self.bias.float() if self.bias is not None else None,
            self.eps,
        )
        return out.type_as(x)


class Fp32InstanceNorm(nn.InstanceNorm1d):
    """nn/utils.py:1388-1410: instance norm over time, optional transpose."""

    def __init__(self, *args, transpose_last=False, **kwargs):
        super().__init__(*args, **kwargs)
        self.transpose_last = transpose_last

    def forward(self, x):
        if self.transpose_last:
            x = x.transpose(1, 2)
        out = F.instance_norm(
            x.float(),
            running_mean=None,
            running_var=None,
            weight=self.weight.float() if self.weight is not None else None,
            bias=self.bias.float() if self.bias is not None else None,
            use_input_stats=True,
            eps=self.eps,
        )
        if self.transpose_last:
            out = out.transpose(1, 2)
        return out.type_as(x)


class PSwish(nn.Module):
    """alpha * x * sigmoid(beta * x) on (B, C, T) (nn/utils.py:1413-1435)."""

    def __init__(self, num_features):
        super().__init__()
        self.p_swish_alpha = nn.Parameter(torch.full((1, num_features, 1), 2.0))
        self.p_swish_beta = nn.Parameter(torch.zeros(1, num_features, 1))

    def forward(self, x):
        return x * self.p_swish_alpha * torch.sigmoid(self.p_swish_beta * x)


# ---------------------------------------------------------------------------
# sinc frontend
# ---------------------------------------------------------------------------


class SincConv(nn.Module):
    """Parametric band-pass filterbank (nn/sinc.py, learnable_filters=False).

    Reflect-pads (k-1)//2 per side ("same" with L_in==in_channels==1 in
    get_padding_elem, nn/sinc.py:123-126,316-337), rebuilds the filters from
    (low_hz_, band_hz_) each call (:181-223)."""

    def __init__(self, out_channels, kernel_size, stride=1, sample_rate=8000,
                 min_low_hz=50.0, return_abs=False):
        super().__init__()
        assert kernel_size % 2 == 1
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.sample_rate = sample_rate
        self.min_low_hz = min_low_hz
        self.min_band_hz = int(np.ceil(sample_rate / kernel_size))
        self.return_abs = return_abs
        self.low_hz_ = nn.Parameter(torch.zeros(out_channels, 1))
        self.band_hz_ = nn.Parameter(torch.zeros(out_channels, 1))
        half = (kernel_size - 1) // 2
        self._n = 2 * math.pi * torch.arange(-half, 0).float().view(1, -1) / sample_rate
        n_lin = torch.linspace(0, kernel_size / 2 - 1, steps=int(kernel_size / 2))
        self._window = 0.53836 - 0.46164 * torch.cos(2 * math.pi * n_lin / kernel_size)

    def filters(self):
        low = self.min_low_hz + torch.abs(self.low_hz_)
        high = torch.clamp(
            low + self.min_band_hz + torch.abs(self.band_hz_),
            self.min_low_hz, self.sample_rate / 2,
        )
        band = (high - low)[:, 0]
        f_low = low @ self._n
        f_high = high @ self._n
        left = (torch.sin(f_high) - torch.sin(f_low)) / self._n * 2 * self._window
        center = 2 * band.view(-1, 1)
        right = torch.flip(left, dims=[1])
        bp = torch.cat([left, center, right], dim=1) / (2 * band[:, None])
        return bp.view(self.out_channels, 1, self.kernel_size)

    def forward(self, x):  # (B, 1, T)
        pad = (self.kernel_size - 1) // 2
        x = F.pad(x, (pad, pad), mode="reflect")
        wx = F.conv1d(x.float(), self.filters().float(), stride=self.stride)
        return torch.abs(wx) if self.return_abs else wx


# ---------------------------------------------------------------------------
# conv feature extractor (nn/utils.py:1043-1163, mode="layer_norm")
# ---------------------------------------------------------------------------


class ConvFeatureExtractionModel(nn.Module):
    def __init__(self, conv_layers, sample_rate=8000, sinc_input=True,
                 sinc_norm="layer_norm", use_pswish=False):
        super().__init__()
        self.conv_layers = nn.ModuleList()
        in_d = 1
        for i, (dim, k, stride) in enumerate(conv_layers):
            is_sinc = sinc_input and i == 0
            if is_sinc:
                conv = SincConv(
                    dim, k, stride=stride, sample_rate=sample_rate,
                    return_abs=sinc_norm in ("pcen", "instance"),
                )
            else:
                conv = nn.Conv1d(
                    in_d, dim, k, stride=stride, bias=False,
                    padding="same" if stride == 1 else int(np.ceil(stride / 2)),
                )
            norm_kind = sinc_norm if i == 0 else "layer_norm"
            if norm_kind == "instance":
                norm = Fp32InstanceNorm(
                    dim, affine=True, track_running_stats=False, transpose_last=True
                )
            else:
                norm = Fp32LayerNorm(dim, elementwise_affine=True)
            act = PSwish(dim) if (is_sinc and use_pswish) else nn.GELU()
            self.conv_layers.append(
                nn.Sequential(
                    conv,
                    nn.Dropout(p=0.0),
                    nn.Sequential(TransposeLast(), norm, TransposeLast()),
                    act,
                )
            )
            in_d = dim

    def forward(self, x):  # (B, T)
        x = x.unsqueeze(1)
        for conv in self.conv_layers:
            x = conv(x)
        return x  # (B, C, T')


# ---------------------------------------------------------------------------
# transformer blocks (nn/modalities/modules.py:272-410)
# ---------------------------------------------------------------------------


class AltAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, padding_mask=None, alibi_bias=None):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, C // self.num_heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        dtype = q.dtype
        q = q * self.scale
        attn = q @ k.transpose(-2, -1)
        if alibi_bias is not None:
            attn = attn.type_as(alibi_bias)
            attn[:, : alibi_bias.size(1)] += alibi_bias
        if padding_mask is not None and padding_mask.any():
            attn = attn.masked_fill(
                padding_mask.unsqueeze(1).unsqueeze(2).to(torch.bool), float("-inf")
            )
        attn = attn.softmax(dim=-1, dtype=torch.float32).to(dtype=dtype)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class AltBlock(nn.Module):
    """Post-/pre-LN block returning (x, tap); tap = raw MLP output when
    ffn_targets (modules.py:320-337)."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, norm_eps=1e-5,
                 layer_norm_first=False, ffn_targets=True):
        super().__init__()
        self.layer_norm_first = layer_norm_first
        self.ffn_targets = ffn_targets
        self.norm1 = nn.LayerNorm(dim, eps=norm_eps)
        self.attn = AltAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=norm_eps)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, padding_mask=None, alibi_bias=None):
        if self.layer_norm_first:
            x = x + self.attn(self.norm1(x), padding_mask, alibi_bias)
            r = x = self.mlp(self.norm2(x))
            t = x
            x = r + x
            if not self.ffn_targets:
                t = x
        else:
            x = x + self.attn(x, padding_mask, alibi_bias)
            r = x = self.norm1(x)
            x = self.mlp(x)
            t = x
            x = self.norm2(r + x)
            if not self.ffn_targets:
                t = x
        return x, t


class BlockEncoder(nn.Module):
    """Prenet (modules.py:74-108): post-LN applies norm BEFORE the blocks."""

    def __init__(self, blocks, norm, layer_norm_first):
        super().__init__()
        self.blocks = blocks
        self.norm = norm
        self.layer_norm_first = layer_norm_first

    def forward(self, x, padding_mask, alibi_bias, alibi_scale=None):
        if self.norm is not None and not self.layer_norm_first:
            x = self.norm(x)
        for i, blk in enumerate(self.blocks):
            ab = alibi_bias
            if ab is not None and alibi_scale is not None:
                scale = alibi_scale[i] if alibi_scale.size(0) > 1 else alibi_scale.squeeze(0)
                ab = ab * scale.type_as(ab)
            x, _ = blk(x, padding_mask, ab)
        if self.norm is not None and self.layer_norm_first:
            x = self.norm(x)
        return x


# ---------------------------------------------------------------------------
# ALiBi (nn/modalities/base.py:553-657)
# ---------------------------------------------------------------------------


def get_alibi_slopes(n):
    def pow2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(n).is_integer():
        return pow2(n)
    closest = 2 ** math.floor(math.log2(n))
    return pow2(closest) + get_alibi_slopes(2 * closest)[0::2][: n - closest]


def get_alibi_bias(batch_size, time_steps, heads):
    slopes = torch.tensor(get_alibi_slopes(heads), dtype=torch.float32)
    pos = torch.arange(time_steps)
    dist = -(pos.unsqueeze(0) - pos.unsqueeze(1)).abs()
    bias = slopes.view(heads, 1, 1) * dist.unsqueeze(0).float()
    return bias.unsqueeze(0).expand(batch_size, heads, time_steps, time_steps)


# ---------------------------------------------------------------------------
# audio modality encoder + full model
# ---------------------------------------------------------------------------


class AudioEncoder(nn.Module):
    def __init__(self, conv_layers, embed_dim, num_heads, prenet_depth,
                 conv_pos_depth, conv_pos_width, conv_pos_groups,
                 sample_rate=8000, sinc_input=True, sinc_norm="layer_norm",
                 use_pswish=False, norm_eps=1e-5, layer_norm_first=False,
                 mlp_ratio=4.0, learned_alibi_scale_per_head=True,
                 decoder=None):
        super().__init__()
        feat_dim = conv_layers[-1][0]
        self.num_heads = num_heads
        self.local_encoder = ConvFeatureExtractionModel(
            conv_layers, sample_rate, sinc_input, sinc_norm, use_pswish
        )
        self.project_features = nn.Sequential(
            TransposeLast(),
            Fp32LayerNorm(feat_dim, elementwise_affine=True),
            nn.Linear(feat_dim, embed_dim),
        )
        k = max(3, conv_pos_width // conv_pos_depth)
        self.relative_positional_encoder = nn.Sequential(
            TransposeLast(),
            *[
                nn.Sequential(
                    nn.Conv1d(embed_dim, embed_dim, kernel_size=k,
                              padding=k // 2, groups=conv_pos_groups),
                    SamePad(k),
                    TransposeLast(),
                    Fp32LayerNorm(embed_dim, elementwise_affine=False),
                    TransposeLast(),
                    nn.GELU(),
                )
                for _ in range(conv_pos_depth)
            ],
            TransposeLast(),
        )
        self.context_encoder = BlockEncoder(
            nn.ModuleList(
                AltBlock(embed_dim, num_heads, mlp_ratio, norm_eps,
                         layer_norm_first)
                for _ in range(prenet_depth)
            ),
            Fp32LayerNorm(embed_dim, elementwise_affine=True)
            if not layer_norm_first
            else None,
            layer_norm_first,
        )
        self.alibi_scale = nn.Parameter(
            torch.ones(1, 1, num_heads if learned_alibi_scale_per_head else 1, 1, 1)
        )
        # modality decoder (pretrain only): decoder is a dict of
        # D2vDecoderConfig fields (nn/modalities/audio.py:130-134)
        self.decoder = (
            Decoder1d(input_dim=embed_dim, **decoder) if decoder else None
        )

    def contextualized_features(self, x):
        """features_only path of base.py:215-344 (mask=False, no padding)."""
        x_pos = self.relative_positional_encoder(x)
        x = x + x_pos
        B, T, _ = x.shape
        bias = get_alibi_bias(B, T, self.num_heads)
        scale = self.alibi_scale.clamp_min(0)
        # size(0)==1: fold into the bias, no per-layer scales (base.py:304-308)
        bias = bias * scale.squeeze(0).type_as(bias)
        x = self.context_encoder(x, None, bias, None)
        return x, bias


class Data2VecMultiModel(nn.Module):
    """features_only forward (nn/data2vec2.py:516-728, post-LN: norm=None)."""

    def __init__(self, conv_layers, embed_dim, num_heads, depth, prenet_depth,
                 conv_pos_depth=5, conv_pos_width=95, conv_pos_groups=16,
                 sample_rate=8000, sinc_input=True, sinc_norm="layer_norm",
                 use_pswish=False, norm_eps=1e-5, layer_norm_first=False,
                 mlp_ratio=4.0, decoder=None):
        super().__init__()
        self.modality_encoders = nn.ModuleDict(
            {
                "AUDIO": AudioEncoder(
                    conv_layers, embed_dim, num_heads, prenet_depth,
                    conv_pos_depth, conv_pos_width, conv_pos_groups,
                    sample_rate, sinc_input, sinc_norm, use_pswish,
                    norm_eps, layer_norm_first, mlp_ratio,
                    decoder=decoder,
                )
            }
        )
        self.blocks = nn.ModuleList(
            AltBlock(embed_dim, num_heads, mlp_ratio, norm_eps, layer_norm_first)
            for _ in range(depth)
        )
        self.norm = (
            nn.LayerNorm(embed_dim, eps=norm_eps) if layer_norm_first else None
        )

    def extract_features(self, source):
        enc = self.modality_encoders["AUDIO"]
        x = enc.local_encoder(source)  # (B, C, T')
        x = enc.project_features(x)  # (B, T', E)
        x, bias = enc.contextualized_features(x)
        layer_results = []
        for blk in self.blocks:
            x, lr = blk(x, None, bias)
            layer_results.append(lr)
        if self.norm is not None:
            x = self.norm(x)
        return {"x": x, "layer_results": layer_results}


class Decoder1d(nn.Module):
    """Grouped-conv decoder + residual + projection
    (nn/modalities/modules.py:137-192), fairseq state-dict naming
    (``blocks.N.0.weight``, ``proj.weight``)."""

    def __init__(self, input_dim, decoder_dim, decoder_kernel, decoder_groups,
                 decoder_layers, projection_layers=1, projection_ratio=2.0,
                 decoder_residual=True):
        super().__init__()
        self.decoder_residual = decoder_residual

        def make_block(in_dim):
            return nn.Sequential(
                nn.Conv1d(
                    in_dim, decoder_dim, kernel_size=decoder_kernel,
                    padding=decoder_kernel // 2, groups=decoder_groups,
                ),
                SamePad(decoder_kernel),
                TransposeLast(),
                nn.LayerNorm(decoder_dim, elementwise_affine=False),
                TransposeLast(),
                nn.GELU(),
            )

        self.blocks = nn.Sequential(
            *[make_block(input_dim if i == 0 else decoder_dim)
              for i in range(decoder_layers)]
        )
        projs = []
        curr = decoder_dim
        for i in range(projection_layers - 1):
            nxt = int(curr * projection_ratio) if i == 0 else curr
            projs.append(nn.Linear(curr, nxt))
            projs.append(nn.GELU())
            curr = nxt
        projs.append(nn.Linear(curr, input_dim))
        self.proj = projs[0] if len(projs) == 1 else nn.Sequential(*projs)

    def forward(self, x):  # (B, T, C)
        x = x.transpose(1, 2)
        residual = x
        for layer in self.blocks:
            x = layer(x)
            # add_residual skips on channel mismatch (modules.py:124-132)
            if self.decoder_residual and residual.size(1) == x.size(1):
                x = x + residual
            residual = x
        x = x.transpose(1, 2)
        return self.proj(x)


def make_targets(taps, num_layers, instance_norm_target_layer=True,
                 batch_norm_target_layer=False, layer_norm_target_layer=False,
                 layer_norm_targets=False, instance_norm_targets=False):
    """EMA-teacher target construction (nn/data2vec2.py:1023-1066)."""
    with torch.no_grad():
        tls = [t for t in taps[-num_layers:]]
        permuted = False
        if instance_norm_target_layer or batch_norm_target_layer:
            tls = [t.transpose(1, 2) for t in tls]  # BTC -> BCT
            permuted = True
        if batch_norm_target_layer:
            tls = [
                F.batch_norm(t.float(), running_mean=None, running_var=None,
                             training=True)
                for t in tls
            ]
        if instance_norm_target_layer:
            tls = [F.instance_norm(t.float()) for t in tls]
        if permuted:
            tls = [t.transpose(1, 2) for t in tls]
        if layer_norm_target_layer:
            tls = [F.layer_norm(t.float(), t.shape[-1:]) for t in tls]
        y = tls[0].float()
        for t in tls[1:]:
            y = y + t.float()
        y = y / len(tls)
        if layer_norm_targets:
            y = F.layer_norm(y, y.shape[-1:])
        if instance_norm_targets:
            y = F.instance_norm(y.transpose(1, 2)).transpose(1, 2)
        return y


def d2v_loss(x, y, loss_beta=0.0, loss_scale=None):
    """Masked regression loss, element-wise (nn/data2vec2.py:1005-1021)."""
    x = x.reshape(-1, x.size(-1)).float()
    y = y.reshape(-1, x.size(-1))
    if loss_beta == 0:
        loss = F.mse_loss(x, y, reduction="none")
    else:
        loss = F.smooth_l1_loss(x, y, reduction="none", beta=loss_beta)
    scale = loss_scale if loss_scale is not None else 1 / math.sqrt(x.size(-1))
    return loss * scale


class PretrainModel(nn.Module):
    """Mirror of the *pretrain* forward (nn/data2vec2.py:516-909):
    masked student (keep-set removal, base.py:215-344) -> Decoder1d scatter
    (base.py:162-192) -> EMA teacher targets (make_targets) -> d2v loss.

    The teacher runs with the same weights as the student (EMA decay 1 at
    init) — the parity test compares the *composition math*, not the EMA
    update, which is tested separately. ``mask_noise_std`` is fixed at 0 so
    decoder mask tokens are zeros (deterministic across frameworks).
    Takes precomputed MaskInfo index arrays so both frameworks consume the
    identical mask (the reference samples masks host-side with numpy;
    index-construction parity is tested separately in test_ops)."""

    def __init__(self, w2v_model, avg_k, d2v_loss_weight=1.0, loss_beta=0.0,
                 loss_scale=None, instance_norm_target_layer=True,
                 layer_norm_target_layer=False, layer_norm_targets=False,
                 instance_norm_targets=False):
        super().__init__()
        self.w2v_model = w2v_model
        self.avg_k = avg_k
        self.d2v_loss_weight = d2v_loss_weight
        self.loss_beta = loss_beta
        self.loss_scale = loss_scale
        self.norm_flags = dict(
            instance_norm_target_layer=instance_norm_target_layer,
            layer_norm_target_layer=layer_norm_target_layer,
            layer_norm_targets=layer_norm_targets,
            instance_norm_targets=instance_norm_targets,
        )

    def forward(self, source, mask, ids_keep, ids_restore):
        """source (B, wav); mask (B, T) 1=masked; ids_keep (B, K);
        ids_restore (B, T). Returns dict(targets, decoder_out, loss)."""
        enc = self.w2v_model.modality_encoders["AUDIO"]
        local = enc.local_encoder(source)
        local = enc.project_features(local)  # (B, T, E)
        B, T, E = local.shape
        K = ids_keep.size(1)

        # ---- student: apply mask (encoder_zero_mask), rel-pos on the
        # masked sequence, then remove masked tokens (base.py:265-290)
        x_masked = local * (1 - mask.unsqueeze(-1).type_as(local))
        x_pos = enc.relative_positional_encoder(x_masked)
        idk = ids_keep.unsqueeze(-1).expand(-1, -1, E)
        x = torch.gather(local, 1, idk) + torch.gather(x_pos, 1, idk)

        # ALiBi at full length, scale folded in, then sliced to the keep-set
        # (base.py:292-314, masked_alibi :681-698)
        bias_full = get_alibi_bias(B, T, enc.num_heads)
        scale = enc.alibi_scale.clamp_min(0)
        bias_full = bias_full * scale.squeeze(0).type_as(bias_full)
        H = bias_full.size(1)
        bias = torch.gather(
            bias_full, 2, ids_keep.view(B, 1, K, 1).expand(-1, H, -1, T)
        )
        bias = torch.gather(
            bias, 3, ids_keep.view(B, 1, 1, K).expand(-1, H, K, -1)
        )

        x = enc.context_encoder(x, None, bias, None)
        for blk in self.w2v_model.blocks:
            x, _ = blk(x, None, bias)
        if self.w2v_model.norm is not None:
            x = self.w2v_model.norm(x)

        # ---- decoder input: scatter keep-set + zero mask tokens back to
        # full length (base.py:162-192 with mask_noise_std=0)
        mask_tokens = x.new_zeros(B, T - K, E)
        x_full = torch.cat([x, mask_tokens], dim=1)
        idr = ids_restore.unsqueeze(-1).expand(-1, -1, E)
        dx = torch.gather(x_full, 1, idr)
        dec_out = enc.decoder(dx)

        # ---- teacher: unmasked full sequence, same params
        # (nn/data2vec2.py:779-846, ema_encoder_only=False,
        # ema_local_encoder=False: contextualized_features on the student's
        # local features, then the trunk blocks, collecting taps)
        with torch.no_grad():
            xt = local + enc.relative_positional_encoder(local)
            xt = enc.context_encoder(xt, None, bias_full, None)
            taps = []
            for blk in self.w2v_model.blocks:
                xt, lr = blk(xt, None, bias_full)
                taps.append(lr)
            y = make_targets(taps, self.avg_k, **self.norm_flags)

        # ---- masked regression (nn/data2vec2.py:850-909 + the criterion's
        # sum/sample_size contract, nn/criterions.py:405-430)
        mb = mask.bool()
        y_m = y[mb]
        x_m = dec_out[mb]
        sample_size = mb.sum()
        reg = d2v_loss(x_m, y_m, self.loss_beta, self.loss_scale)
        loss = reg.sum() * self.d2v_loss_weight / sample_size
        return {"targets": y, "decoder_out": dec_out, "loss": loss,
                "student_x": x}


class _W2VEncoder(nn.Module):
    def __init__(self, w2v_model, embed_dim, n_classes):
        super().__init__()
        self.w2v_model = w2v_model
        self.proj = nn.Linear(embed_dim, n_classes)


class FinetuneModel(nn.Module):
    """Wav2VecEncoderModOut inference path (nn/wav2vec2.py:433-482)."""

    def __init__(self, w2v_model, embed_dim, n_classes, average_top_k_layers):
        super().__init__()
        self.w2v_encoder = _W2VEncoder(w2v_model, embed_dim, n_classes)
        self.average_top_k_layers = average_top_k_layers

    def forward(self, source):
        res = self.w2v_encoder.w2v_model.extract_features(source)
        taps = res["layer_results"][-self.average_top_k_layers:]
        x = (sum(taps) / len(taps)).to(res["x"].dtype)
        return self.w2v_encoder.proj(x)
