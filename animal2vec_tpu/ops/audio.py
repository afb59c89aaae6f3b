"""Waveform pre-processing helpers.

chunk_and_normalize mirrors nn/utils.py:1438-1475 (long file -> batches of
fixed-length segments, right-pad the last, per-chunk layer-norm); the
normalization itself (zero mean / unit variance per clip) mirrors the
``normalize=True`` postprocess of the fairseq RawAudioDataset consumed at
nn/audio_tasks.py:330-333.
"""

from __future__ import annotations

from typing import List

import numpy as np


def layer_norm_1d(x: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """Zero-mean unit-variance normalization over the full clip."""
    x = np.asarray(x, dtype=np.float32)
    mean = x.mean()
    var = x.var()
    return (x - mean) / np.sqrt(var + eps)


def chunk_and_normalize(
    data: np.ndarray,
    segment_length: float = 10.0,
    sample_rate: int = 8_000,
    normalize: bool = True,
    max_batch_size: int = 16,
) -> List[np.ndarray]:
    """Split a 1-D waveform into (<=max_batch_size, seq_len) batches.

    Returns a list of 2-D float32 arrays; the final segment is right-padded
    with zeros to seq_len.
    """
    data = np.asarray(data, dtype=np.float32).squeeze()
    assert data.ndim == 1, "expected a mono waveform"
    seq_len = round(segment_length * sample_rate)
    if len(data) > seq_len:
        n_seg = int(np.ceil(len(data) / seq_len))
        padded = np.zeros(n_seg * seq_len, dtype=np.float32)
        padded[: len(data)] = data
        segments = padded.reshape(n_seg, seq_len)
    else:
        segments = data[None, :]
    if normalize:
        segments = np.stack([layer_norm_1d(s) for s in segments])
    return [
        segments[i: i + max_batch_size]
        for i in range(0, len(segments), max_batch_size)
    ]
