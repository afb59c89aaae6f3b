"""Convolution shape/padding arithmetic.

The reference uses three distinct padding conventions that all have to be
reproduced exactly for logit parity:

1. torch ``Conv1d(padding="same")`` for stride-1 convs
   (nn/utils.py:1089): total pad = k-1, split left = (k-1)//2, right = rest.
2. ``padding = ceil(stride/2)`` zeros on both sides for strided convs
   (nn/utils.py:1089, right branch).
3. SincConv reflect-"same": (k//2, k//2) reflect padding for odd k
   (nn/sinc.py:123-139,316-337 — `get_padding_elem` reduces to floor(k/2) both
   sides for the configurations used).

Additionally the frame-label arithmetic clamps kernels at 10
(nn/audio_tasks.py:349) while the padding-mask arithmetic uses the full kernel
(nn/modalities/audio.py:151-197) — both are provided.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple


def same_pad_1d(kernel: int) -> Tuple[int, int]:
    """torch Conv1d(padding='same') split for stride 1: left=(k-1)//2."""
    total = kernel - 1
    left = total // 2
    return left, total - left


def strided_pad_1d(stride: int) -> Tuple[int, int]:
    """Reference's strided-conv padding: ceil(stride/2) both sides
    (nn/utils.py:1089)."""
    p = math.ceil(stride / 2)
    return p, p


def conv_out_length(length: int, kernel: int, stride: int, pad: Tuple[int, int]) -> int:
    return (length + pad[0] + pad[1] - kernel) // stride + 1


def feature_extractor_out_length(
    length: int, conv_layers: Sequence[Tuple[int, int, int]]
) -> int:
    """Output length of the full conv stack using the *runtime* padding rules.

    Mirrors nn/utils.py:80-98 `get_conv_size` with p=0 -> implicit
    ceil(stride/2) padding and the stride==1 early-return (length unchanged),
    which is also how convert_padding_mask computes lengths
    (nn/modalities/audio.py:151-197).
    """
    for _, k, s in conv_layers:
        if s == 1:
            continue  # 'same' padding keeps length
        pad = strided_pad_1d(s)
        length = conv_out_length(length, k, s, pad)
    return length


def label_frame_length(length: int, conv_layers: Sequence[Tuple[int, int, int]]) -> int:
    """Label-target frame count: identical arithmetic but kernels clamped at
    min(10, k) (nn/audio_tasks.py:349). For the shipped MeerKAT stack both
    formulas agree (only the stride-1 sinc layer has k>10 and stride-1 layers
    keep length)."""
    for _, k, s in conv_layers:
        if s == 1:
            continue
        pad = strided_pad_1d(s)
        length = conv_out_length(length, min(10, k), s, pad)
    return length


def feature_lengths_per_layer(
    length: int, conv_layers: Sequence[Tuple[int, int, int]]
) -> List[int]:
    out = []
    for _, k, s in conv_layers:
        if s != 1:
            length = conv_out_length(length, k, s, strided_pad_1d(s))
        out.append(length)
    return out
