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


def lane_pack_factor(groups: int, cin_per_group: int, max_pack: int = 2) -> int:
    """Smallest divisor ``p`` of ``groups`` (capped at ``max_pack``) that
    makes ``cin_per_group * p`` a multiple of 128.

    TPU Mosaic tiles the trailing (lane) dim to 128: XLA stores grouped-conv
    activations as (..., G, C/G), so C/G = 64 buffers occupy 2x their logical
    HBM (the dominant a2v-large pretrain residuals — see docs/PERF.md). Fusing
    ``p`` adjacent groups into one lane-dense super-group via a block-diagonal
    kernel (expand_grouped_kernel) removes the padding at ``p``x the conv
    FLOPs — worthwhile when the padded compute was idling the same factor
    anyway (p=2 for 64-wide groups)."""
    if groups <= 1 or cin_per_group % 128 == 0:
        return 1
    for p in range(2, min(groups, max_pack) + 1):
        if groups % p == 0 and (cin_per_group * p) % 128 == 0:
            return p
    return 1


def expand_grouped_kernel(kernel, groups: int, pack: int):
    """(K, C_in/G, C_out) grouped-conv kernel -> block-diagonal
    (K, C_in/G * pack, C_out) kernel for feature_group_count = G/pack.

    Exact: original group ``g`` sits at offset ``(g % pack) * cin_g`` inside
    super-group ``g // pack``; all other blocks are zero. The expansion is
    loop-invariant, so XLA hoists it out of scan/step loops."""
    import jax.numpy as jnp

    if pack == 1:
        return kernel
    k, cin_g, cout = kernel.shape
    s = groups // pack
    cout_g = cout // groups
    old = kernel.reshape(k, cin_g, s, pack, cout_g)
    eye = jnp.eye(pack, dtype=kernel.dtype)
    new = jnp.einsum("ab,kcsbo->kacsbo", eye, old)
    return new.reshape(k, pack * cin_g, cout)
