"""1-D convolution as stride-grouped matmuls.

XLA's TPU conv lowering runs the frontend's narrow-kernel convs at 20-60
TFLOP/s (profiled, docs/PERF.md); plain matmuls reach ~118. A (k, s) conv is
algebraically a sum of ceil(k/s) full-width matmuls over stride-grouped views
of the input:

  y[t] = sum_j x[t*s + j - pad] @ W[j]            (j in [0, k))
       = sum_a xr[t + a] @ Wa                      (a in [0, ceil(k/s)))

where xr groups each s consecutive input samples into one row
(xr[i] = x_pad[i*s : (i+1)*s], flattened with channels) and
Wa = W[a*s : (a+1)*s] flattened to (s*C_in, C_out), zero-padded past k.
Every term is then a dense (T_out, s*C_in) x (s*C_in, C_out) matmul — MXU
shapes instead of implicit im2col.

Measured verdict (v5e, r2): wiring this into the conv feature extractor
made end-to-end inference SLOWER (43.1 vs 46.9 clips/s/chip at batch 32) —
XLA's conv lowering beats the decomposition once the stride-grouped reshape
relayouts are paid. Kept as a tested op for revisits on other topologies;
NOT used by the frontend (docs/PERF.md).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def conv1d_mm(
    x: jnp.ndarray,          # (B, T, C_in)
    kernel: jnp.ndarray,     # (K, C_in, C_out)
    bias: Optional[jnp.ndarray],
    stride: int,
    pad: Tuple[int, int],
) -> jnp.ndarray:
    """Matmul-decomposed ungrouped 1-D conv; matches conv1d_same numerics."""
    b, t, c_in = x.shape
    k, _, c_out = kernel.shape
    s = stride
    n_taps = math.ceil(k / s)

    t_pad = t + pad[0] + pad[1]
    t_out = (t_pad - k) // s + 1
    # length so every stride-group row and every shifted view is in range.
    # need can be smaller than pad[0]+t when (t_pad-k) % s exceeds
    # n_taps*s-k: the excess tail contributes to no output row, so crop it
    # (never pad by a negative amount).
    need = (t_out + n_taps - 1) * s
    right = need - t - pad[0]
    xp = jnp.pad(x, ((0, 0), (pad[0], max(0, right)), (0, 0)))
    if right < 0:
        xp = xp[:, :need]
    xr = xp.reshape(b, need // s, s * c_in)

    wk = kernel.reshape(k, c_in, c_out)
    if n_taps * s != k:  # zero-pad kernel taps past k
        wk = jnp.pad(wk, ((0, n_taps * s - k), (0, 0), (0, 0)))
    wa = wk.reshape(n_taps, s * c_in, c_out)

    y = None
    for a in range(n_taps):
        term = jax.lax.dynamic_slice_in_dim(xr, a, t_out, axis=1) @ wa[a]
        y = term if y is None else y + term
    if bias is not None:
        y = y + bias
    return y
