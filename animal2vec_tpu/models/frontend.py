"""Waveform frontend: Sinc filterbank + wav2vec2-style conv feature stack.

Replaces nn/sinc.py (SincConv), nn/utils.py:1043-1163
(ConvFeatureExtractionModel), nn/utils.py:1177-1435 (PCEN / EMA / PSwish /
Fp32InstanceNorm). TPU design choices:

* activations are (B, T, C); convs run through lax.conv_general_dilated with
  NHC/HIO layouts so XLA tiles them onto the MXU,
* the sinc filterbank is rebuilt from its two small frequency-parameter
  vectors every step (ops/sinc.py) — negligible FLOPs, keeps the filters
  exactly parametric like the reference,
* PCEN's sequential smoother is a first-order linear recurrence evaluated
  with ``lax.associative_scan`` (log-depth on device) instead of the
  reference's per-timestep Python loop (nn/utils.py:1360-1370).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from animal2vec_tpu.models.modules import Fp32LayerNorm, conv1d_same
from animal2vec_tpu.ops.sinc import mel_init_filterbank, sinc_filters, full_hamming_window
from animal2vec_tpu.ops.conv_arith import same_pad_1d, strided_pad_1d


class PSwish(nn.Module):
    """alpha * x * sigmoid(beta * x); alpha init 2, beta init 0 → linear at
    init, matching the Sinc frontend expectation (nn/utils.py:1413-1435)."""

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        c = x.shape[-1]
        alpha = self.param("p_swish_alpha", nn.initializers.constant(2.0), (c,), jnp.float32)
        beta = self.param("p_swish_beta", nn.initializers.zeros, (c,), jnp.float32)
        return x * alpha.astype(x.dtype) * jax.nn.sigmoid(beta.astype(x.dtype) * x)


class SincConv(nn.Module):
    """Learnable band-pass FIR filterbank (SincNet; nn/sinc.py).

    Two modes mirroring the reference:
      * parametric (learnable_filters=False): learn (low_hz, band_hz), filters
        rebuilt each call (nn/sinc.py:141-151),
      * learnable kernel (learnable_filters=True): the FIR taps themselves are
        the parameter, initialized from the sinc construction; the full
        Hamming window is re-applied multiplicatively at every call, which is
        the functional equivalent of the reference's in-place data mutation
        (nn/sinc.py:153-154).
    Padding: reflect-"same" (nn/sinc.py:123-126,286-313).
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    sample_rate: int = 8_000
    min_low_hz: float = 50.0
    min_band_hz: Optional[float] = None
    learnable_filters: bool = False
    apply_window_to_root: bool = False
    return_abs: bool = False
    init_scale: str = "mel"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, 1) or (B, T)
        squeeze = x.ndim == 2
        if squeeze:
            x = x[..., None]
        if self.learnable_filters:
            def init_kernel(key):
                low, band = mel_init_filterbank(
                    self.out_channels, self.kernel_size, self.sample_rate,
                    self.min_low_hz, self.min_band_hz, self.init_scale,
                )
                return np.asarray(
                    sinc_filters(jnp.asarray(low), jnp.asarray(band),
                                 self.kernel_size, self.sample_rate,
                                 self.min_low_hz, self.min_band_hz)
                )

            kern = self.param("kernel", init_kernel)  # (C, K)
            if self.apply_window_to_root:
                kern = kern * jnp.asarray(full_hamming_window(self.kernel_size))[None, :]
            filters = kern
        else:
            def init_low(key):
                return mel_init_filterbank(
                    self.out_channels, self.kernel_size, self.sample_rate,
                    self.min_low_hz, self.min_band_hz, self.init_scale,
                )[0]

            def init_band(key):
                return mel_init_filterbank(
                    self.out_channels, self.kernel_size, self.sample_rate,
                    self.min_low_hz, self.min_band_hz, self.init_scale,
                )[1]

            low_hz = self.param("low_hz", init_low)
            band_hz = self.param("band_hz", init_band)
            filters = sinc_filters(
                low_hz, band_hz, self.kernel_size, self.sample_rate,
                self.min_low_hz, self.min_band_hz,
            )  # (C, K)

        pad = self.kernel_size // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        # conv in fp32 (reference casts input+filters to float, nn/sinc.py:144-151)
        kernel_hio = jnp.transpose(filters, (1, 0))[:, None, :]  # (K, 1, C)
        out = jax.lax.conv_general_dilated(
            xp.astype(jnp.float32),
            kernel_hio.astype(jnp.float32),
            window_strides=(self.stride,),
            padding=[(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        out = out.astype(self.dtype)
        return jnp.abs(out) if self.return_abs else out


class ExponentialMovingAverageSmoother(nn.Module):
    """Learnable first-order IIR smoother for PCEN (nn/utils.py:1294-1377).

    s[t] = w * x[t] + (1 - w) * s[t-1], s[0] = x[0].
    Evaluated as an associative scan: the recurrence (a, b) composition
    (a2*a1, a2*b1 + b2) runs in O(log T) depth on the VPU.
    """

    per_channel: bool = True
    coeff_init: float = 0.04

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        c = x.shape[-1] if self.per_channel else 1
        w = self.param("weights", nn.initializers.constant(self.coeff_init), (c,), jnp.float32)
        w = jnp.clip(w, 0.0, 1.0).astype(x.dtype)
        a = jnp.full_like(x, 1.0 - w)
        b = w * x
        a = a.at[:, 0, :].set(0.0)
        b = b.at[:, 0, :].set(x[:, 0, :])

        def combine(left, right):
            a1, b1 = left
            a2, b2 = right
            return a2 * a1, a2 * b1 + b2

        _, s = jax.lax.associative_scan(combine, (a, b), axis=1)
        return s


class PCEN(nn.Module):
    """Per-channel energy normalization (sPCEN variant; nn/utils.py:1177-1291),
    fp32 internally."""

    alpha: float = 0.96
    smooth_coef: float = 0.04
    delta: float = 2.0
    root: float = 2.0
    floor: float = 1e-12
    per_channel_smooth_coef: bool = True

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        dtype = x.dtype
        x = x.astype(jnp.float32)
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.constant(self.alpha), (c,), jnp.float32)
        delta = self.param("delta", nn.initializers.constant(self.delta), (c,), jnp.float32)
        root = self.param("root", nn.initializers.constant(self.root), (c,), jnp.float32)
        alpha = jnp.minimum(alpha, 1.0)
        root = jnp.maximum(root, 1.0)
        one_over_root = 1.0 / root
        smoother = ExponentialMovingAverageSmoother(
            per_channel=self.per_channel_smooth_coef,
            coeff_init=self.smooth_coef,
            name="ema",
        )(x)
        out = (x / (self.floor + smoother) ** alpha + delta) ** one_over_root - delta**one_over_root
        return out.astype(dtype)


class Fp32InstanceNorm(nn.Module):
    """Instance norm over time with optional affine (nn/utils.py:1388-1410);
    input (B, T, C), stats per (B, C) over T, fp32."""

    use_affine: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=1, keepdims=True)
        var = x32.var(axis=1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.use_affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y * scale + bias
        return y.astype(dtype)


class ConvFeatureExtractor(nn.Module):
    """Sinc + conv feature stack: raw (B, T) waveform -> (B, T/40, C) features
    (nn/utils.py:1043-1163 with the MeerKAT layout
    a2v_large_pretrain_best.yaml:24).

    Layer i: conv(dim, k, stride) -> [dropout] -> norm -> activation.
    First layer is SincConv when sinc_input; its norm is selected by
    sinc_norm (layer_norm | instance | pcen) and its activation can be
    PSwish. Strided convs use ceil(stride/2) zero padding, stride-1 convs
    torch-'same' (ops/conv_arith.py).
    """

    conv_layers: Sequence[Tuple[int, int, int]]
    mode: str = "layer_norm"
    conv_bias: bool = False
    sinc_input: bool = True
    apply_window_to_root: bool = False
    sample_rate: int = 8_000
    sinc_norm: str = "layer_norm"
    use_pswish: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (B, T)
        assert self.mode in ("default", "layer_norm")
        x = x[..., None].astype(self.dtype)  # (B, T, 1)
        for i, (dim, k, stride) in enumerate(self.conv_layers):
            is_first = i == 0
            if is_first and (self.sinc_input or self.apply_window_to_root):
                x = SincConv(
                    out_channels=dim,
                    kernel_size=k,
                    stride=stride,
                    sample_rate=self.sample_rate,
                    learnable_filters=self.apply_window_to_root and self.sinc_input,
                    apply_window_to_root=self.apply_window_to_root,
                    return_abs=self.sinc_norm in ("pcen", "instance"),
                    dtype=self.dtype,
                    name=f"conv_{i}",
                )(x)
            else:
                in_dim = x.shape[-1]
                kern = self.param(
                    f"conv_{i}_kernel",
                    nn.initializers.he_normal(),
                    (k, in_dim, dim),
                    jnp.float32,
                )
                bias = (
                    self.param(f"conv_{i}_bias", nn.initializers.zeros, (dim,), jnp.float32)
                    if self.conv_bias
                    else None
                )
                x = conv1d_same(
                    x,
                    kern.astype(self.dtype),
                    bias.astype(self.dtype) if bias is not None else None,
                    stride=stride,
                    pad=same_pad_1d(k) if stride == 1 else strided_pad_1d(stride),
                )
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            # normalization
            norm_kind = self.sinc_norm if is_first else "layer_norm"
            if self.mode == "layer_norm":
                if norm_kind == "pcen":
                    x = PCEN(name=f"norm_{i}")(x)
                elif norm_kind == "instance":
                    x = Fp32InstanceNorm(use_affine=True, name=f"norm_{i}")(x)
                else:
                    x = Fp32LayerNorm(use_affine=True, name=f"norm_{i}")(x)
            elif is_first:  # mode == default: group norm on first layer only
                x = nn.GroupNorm(num_groups=dim, dtype=jnp.float32, name=f"norm_{i}")(x)
            # activation
            if is_first and (self.sinc_input or self.apply_window_to_root) and self.use_pswish:
                x = PSwish(name=f"act_{i}")(x)
            else:
                x = nn.gelu(x, approximate=False)
        return x
