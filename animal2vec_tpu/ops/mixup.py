"""BC-learning mixup with A-weighted gain matching.

Reimplements the augmentation of nn/data2vec2.py:453-498,536-598 (identical
copy at nn/wav2vec2.py:264-309,369-431): two waveforms are mixed with a ratio
derived from their perceptual (A-weighted) loudness difference, following
Tokozume et al. 2017 (BC learning). Runs fully on device: frame unfold is a
reshape-free strided slice, the spectrum is an rfft (XLA-native), and the
A-weight curve is a precomputed constant.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def a_weighting_table(fs: int, n_fft: int, min_db: float = -80.0) -> np.ndarray:
    """Linear-power A-weighting curve over rfft bins
    (nn/data2vec2.py:461-479)."""
    freq = np.linspace(0, fs // 2, n_fft // 2 + 1)
    freq_sq = freq**2
    freq_sq[0] = 1.0
    weight = 2.0 + 20.0 * (
        2 * np.log10(12194)
        + 2 * np.log10(freq_sq)
        - np.log10(freq_sq + 12194**2)
        - np.log10(freq_sq + 20.6**2)
        - 0.5 * np.log10(freq_sq + 107.7**2)
        - 0.5 * np.log10(freq_sq + 737.9**2)
    )
    weight = np.maximum(weight, min_db)
    return np.power(10.0, weight / 10.0).astype(np.float32)


def _unfold(x: jnp.ndarray, size: int, hop: int) -> jnp.ndarray:
    """torch.unfold(-1, size, hop) equivalent: (..., T) -> (..., F, size)."""
    t = x.shape[-1]
    n_frames = (t - size) // hop + 1
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(size)[None, :])
    return x[..., idx]


def compute_gain(
    sound: jnp.ndarray,
    fs: int = 8_000,
    wl: float = 0.1,
    min_db: float = -80.0,
    mode: str = "A_weighting",
) -> jnp.ndarray:
    """Per-frame gain in dB, shape (..., F) (nn/data2vec2.py:453-498)."""
    n_fft = round(fs * wl)
    frames = _unfold(sound, n_fft, n_fft // 2)
    if mode == "RMSE":
        g = jnp.mean(frames.astype(jnp.float32) ** 2, axis=-1)
    elif mode == "A_weighting":
        window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
        # torch.hann_window(n) is periodic: hanning(n+1)[:-1]
        spec = jnp.fft.rfft(window * frames.astype(jnp.float32))
        power = jnp.abs(spec) ** 2
        g = jnp.sum(power * jnp.asarray(a_weighting_table(fs, n_fft, min_db)), axis=-1)
    else:
        raise ValueError(mode)
    gain = jnp.maximum(g, 10.0 ** (min_db / 10.0))
    return 10.0 * jnp.log10(gain)


def bc_mixup(
    rng: jax.Array,
    source: jnp.ndarray,
    target: Optional[jnp.ndarray],
    source_mixup: float,
    mixup_prob: float,
    same_mixup: bool,
    gain_mode: str,
    sample_rate: int,
    mixing_window_length: float,
    target_mixup: bool,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Mix a batch with a random permutation of itself
    (nn/data2vec2.py:536-598). Static-shape: the bernoulli 'which rows mix'
    choice is applied as a blend mask instead of fancy indexing."""
    if source_mixup < 0 or mixup_prob <= 0:
        return source, target
    b = source.shape[0]
    rng_mask, rng_r, rng_perm = jax.random.split(rng, 3)
    mix_mask = (
        jnp.ones((b,), dtype=bool)
        if mixup_prob >= 1
        else jax.random.bernoulli(rng_mask, mixup_prob, (b,))
    )
    r = jax.random.uniform(
        rng_r,
        (1,) if same_mixup else (b,),
        minval=max(1e-6, source_mixup),
        maxval=1.0,
    ).astype(source.dtype)
    perm = jax.random.permutation(rng_perm, b)
    s2 = source[perm]

    if gain_mode == "none":
        p = jnp.broadcast_to(r, (b,))[:, None]
    else:
        if gain_mode == "naive_rms":
            g1 = jnp.sqrt(jnp.mean(source.astype(jnp.float32) ** 2, axis=-1))
        else:
            g1 = jnp.max(
                compute_gain(source, fs=sample_rate, wl=mixing_window_length, mode=gain_mode),
                axis=-1,
            )
        g1 = g1.astype(source.dtype)
        g2 = g1[perm]
        p = 1.0 / (1.0 + 10.0 ** ((g1 - g2) / 20.0) * (1.0 - r) / r)
        p = p[:, None]

    mixed = (p * source + (1 - p) * s2) / jnp.sqrt(p**2 + (1 - p) ** 2)
    mixed = jnp.where(mix_mask[:, None], mixed, source)

    if target is not None and target_mixup:
        r_t = jnp.broadcast_to(r, (b,))[:, None, None].astype(target.dtype)
        mixed_t = target * r_t + (1 - r_t) * target[perm]
        target = jnp.where(mix_mask[:, None, None], mixed_t, target)
    return mixed, target
