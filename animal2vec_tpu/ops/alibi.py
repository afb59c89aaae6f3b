"""ALiBi attention biases (1-D symmetric, 2-D grid).

Reimplements the math of nn/modalities/base.py:553-657: geometric head slopes
(power-of-two recipe with the non-power-of-two interleave workaround), a
symmetric distance bias 0 on the diagonal, and the 2-D manhattan/euclidean
variant for the image modality. Biases are returned as (heads, T, T) fp32;
batching/scaling/gathering is done by the callers (models/).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def alibi_slopes(num_heads: int) -> np.ndarray:
    def pow2_slopes(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(num_heads).is_integer():
        slopes = pow2_slopes(num_heads)
    else:
        closest = 2 ** math.floor(math.log2(num_heads))
        slopes = (
            pow2_slopes(closest)
            + alibi_slopes(2 * closest).tolist()[0::2][: num_heads - closest]
        )
    return np.asarray(slopes, dtype=np.float32)


@lru_cache(maxsize=8)
def _distance_1d(t: int) -> np.ndarray:
    idx = np.arange(t)
    return -np.abs(idx[None, :] - idx[:, None]).astype(np.float32)


def alibi_bias_1d(time_steps: int, num_heads: int) -> jnp.ndarray:
    """(heads, T, T) symmetric ALiBi bias (nn/modalities/base.py:582-591)."""
    slopes = alibi_slopes(num_heads)
    bias = slopes[:, None, None] * _distance_1d(time_steps)[None]
    return jnp.asarray(bias)


def alibi_bias_2d(
    num_patches: int, num_heads: int, distance: str = "manhattan"
) -> jnp.ndarray:
    """(heads, P, P) bias for a sqrt(P) x sqrt(P) grid
    (nn/modalities/base.py:592-611)."""
    n = math.isqrt(num_patches)
    assert n * n == num_patches, num_patches
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    coords = np.stack([ii.reshape(-1), jj.reshape(-1)], axis=1).astype(np.float32)
    dx = np.abs(coords[:, None, 0] - coords[None, :, 0])
    dy = np.abs(coords[:, None, 1] - coords[None, :, 1])
    if distance == "manhattan":
        dist = dx + dy
    elif distance == "euclidean":
        dist = np.sqrt(dx**2 + dy**2)
    else:
        raise ValueError(distance)
    slopes = alibi_slopes(num_heads)
    return jnp.asarray(slopes[:, None, None] * (-dist)[None])
