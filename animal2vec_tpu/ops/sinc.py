"""Parametric sinc band-pass filterbank construction (SincNet frontend).

Reimplements the *math* of the reference SincConv (nn/sinc.py:181-276) as pure
functions of the learnable ``(low_hz, band_hz)`` parameters so the filterbank
is differentiable, jit-able, and trivially convertible from fairseq
checkpoints (parameters ``low_hz_`` / ``band_hz_`` map 1:1).

Construction recipe (nn/sinc.py:181-223):
  low  = min_low_hz + |low_hz|
  high = clip(low + min_band_hz + |band_hz|, min_low_hz, sr/2)
  band = high - low
  n    = 2*pi*arange(-(k-1)/2, 0)/sr                      (half time axis)
  left = (sin(high*n) - sin(low*n)) / n * 2 * hamming_half
  filt = concat([left, 2*band, flip(left)]) / (2*band)

Default ``min_band_hz = ceil(sr / k)`` (nn/sinc.py:77-81).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _to_mel(hz):
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def _to_hz(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def default_min_band_hz(sample_rate: int, kernel_size: int) -> int:
    return int(np.ceil(sample_rate / kernel_size))


def mel_init_filterbank(
    out_channels: int,
    kernel_size: int,
    sample_rate: int = 8000,
    min_low_hz: float = 50.0,
    min_band_hz: float | None = None,
    init_scale: str = "mel",
) -> Tuple[np.ndarray, np.ndarray]:
    """Initial (low_hz, band_hz) arrays, mel- or linearly spaced
    (nn/sinc.py:225-248). Shapes: (out_channels, 1)."""
    if min_band_hz is None:
        min_band_hz = default_min_band_hz(sample_rate, kernel_size)
    high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)
    if init_scale == "mel":
        mel = np.linspace(_to_mel(min_low_hz), _to_mel(high_hz), out_channels + 1)
        hz = _to_hz(mel)
    else:
        hz = np.linspace(min_low_hz, high_hz, out_channels + 1)
    low_hz = hz[:-1][:, None].astype(np.float32)
    band_hz = np.diff(hz)[:, None].astype(np.float32)
    return low_hz, band_hz


def half_hamming_window(kernel_size: int) -> np.ndarray:
    """Half Hamming window over floor(k/2) taps (nn/sinc.py:264-270).
    Note the reference divides by ``kernel_size`` (not k-1), reproduce that."""
    n_lin = np.linspace(0, kernel_size / 2 - 1, num=int(kernel_size / 2))
    return (0.53836 - 0.46164 * np.cos(2 * math.pi * n_lin / kernel_size)).astype(
        np.float32
    )


def full_hamming_window(kernel_size: int) -> np.ndarray:
    """Full window used by the learnable-kernel mode (nn/sinc.py:256-261)."""
    n_lin = np.linspace(0, kernel_size - 1, num=kernel_size)
    return (0.53836 - 0.46164 * np.cos(2 * math.pi * n_lin / kernel_size)).astype(
        np.float32
    )


def sinc_filters(
    low_hz: jnp.ndarray,
    band_hz: jnp.ndarray,
    kernel_size: int,
    sample_rate: int = 8000,
    min_low_hz: float = 50.0,
    min_band_hz: float | None = None,
) -> jnp.ndarray:
    """Build the (out_channels, kernel_size) band-pass FIR filters from the
    learnable frequency parameters (nn/sinc.py:181-223)."""
    assert kernel_size % 2 == 1, "sinc kernel must be odd"
    if min_band_hz is None:
        min_band_hz = default_min_band_hz(sample_rate, kernel_size)
    low_hz = low_hz.astype(jnp.float32)
    band_hz = band_hz.astype(jnp.float32)

    low = min_low_hz + jnp.abs(low_hz)  # (C, 1)
    high = jnp.clip(low + min_band_hz + jnp.abs(band_hz), min_low_hz, sample_rate / 2)
    band = (high - low)[:, 0]  # (C,)

    half = (kernel_size - 1) // 2
    n = (2 * math.pi * np.arange(-half, 0, dtype=np.float32)[None, :] / sample_rate)
    n = jnp.asarray(n)  # (1, half)
    window = jnp.asarray(half_hamming_window(kernel_size))[None, :]  # (1, half)

    f_low = low @ n  # (C, half)
    f_high = high @ n
    band_pass_left = (jnp.sin(f_high) - jnp.sin(f_low)) / n * 2.0 * window
    band_pass_center = 2.0 * band[:, None]  # (C, 1)
    band_pass_right = jnp.flip(band_pass_left, axis=1)
    filters = jnp.concatenate(
        [band_pass_left, band_pass_center, band_pass_right], axis=1
    )
    filters = filters / (2.0 * band[:, None])
    return filters  # (C, K)
