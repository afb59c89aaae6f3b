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
                 mlp_ratio=4.0, learned_alibi_scale_per_head=True):
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
                 mlp_ratio=4.0):
        super().__init__()
        self.modality_encoders = nn.ModuleDict(
            {
                "AUDIO": AudioEncoder(
                    conv_layers, embed_dim, num_heads, prenet_depth,
                    conv_pos_depth, conv_pos_width, conv_pos_groups,
                    sample_rate, sinc_input, sinc_norm, use_pswish,
                    norm_eps, layer_norm_first, mlp_ratio,
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
