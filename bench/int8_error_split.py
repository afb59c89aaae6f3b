"""Which int8 error dominates the fused-MLP delta: weights or activations?

The round-3 quality study (bench/int8_quality.py) put the int8-MLP serving
mode at 0.018 max-abs frame-logit delta vs bf16 — far outside the 1e-3
BASELINE parity budget. VERDICT r3 item 7 asks whether per-group weight
scales or first/last-layer bf16 exclusion could close it. Before investing
in either, split the error at one a2v-large MLP:

  (a) int8 weights  x fp32 activations   -> weight-quant error alone
  (b) fp32 weights  x int8 activations   -> activation-quant error alone
  (c) both int8 (the shipped kernel schedule, incl. hidden re-quant)

If (b) ~ (c) >> (a), weight-side mitigations (per-group scales) cannot help
— the per-row dynamic activation quant is the wall. Pure numpy/jnp math
(exact emulation of ops/fused_mlp._kernel_int8's schedule), runs anywhere.

Run: python -m bench.int8_error_split
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def quant_rows(x):
    s = np.maximum(np.max(np.abs(x), axis=1, keepdims=True) / 127.0, 1e-12)
    return np.round(x / s), s


def quant_cols(w):
    s = np.maximum(np.max(np.abs(w), axis=0, keepdims=True) / 127.0, 1e-12)
    return np.round(w / s), s


def gelu(x):
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def mlp(x, w1, b1, w2, b2, *, int8_w=False, int8_x=False, groups=1):
    """fp64 reference MLP with optional int8 emulation on either side.

    groups > 1: per-group weight scales along the reduction axis (the
    mitigation VERDICT asks about) — each C/groups slab gets its own
    per-output-channel scale."""
    if int8_x:
        xq, xs = quant_rows(x)
    if int8_w:
        h = np.zeros((x.shape[0], w1.shape[1]))
        for g in range(groups):
            sl = slice(g * w1.shape[0] // groups, (g + 1) * w1.shape[0] // groups)
            wq, ws = quant_cols(w1[sl])
            if int8_x:
                h += (xq[:, sl] @ wq) * xs * ws
            else:
                # fp32 activations against dequantized weights
                h += x[:, sl] @ (wq * ws)
    else:
        h = (xq * xs) @ w1 if int8_x else x @ w1
    h = gelu(h + b1)
    if int8_x:
        hq, hs = quant_rows(h)
    if int8_w:
        y = np.zeros((x.shape[0], w2.shape[1]))
        for g in range(groups):
            sl = slice(g * w2.shape[0] // groups, (g + 1) * w2.shape[0] // groups)
            wq, ws = quant_cols(w2[sl])
            if int8_x:
                y += (hq[:, sl] @ wq) * hs * ws
            else:
                y += h[:, sl] @ (wq * ws)
    else:
        y = (hq * hs) @ w2 if int8_x else h @ w2
    return y + b2


def main():
    rng = np.random.default_rng(0)
    n, c, m = 2048, 1024, 4096
    # activations shaped like post-LN transformer streams: unit variance
    # with a few heavy outlier tokens (the regime that breaks per-row quant)
    x = rng.normal(size=(n, c))
    out_rows = rng.choice(n, 32, replace=False)
    x[out_rows] *= 8.0
    w1 = rng.normal(size=(c, m)) / np.sqrt(c)
    b1 = rng.normal(size=(m,)) * 0.1
    w2 = rng.normal(size=(m, c)) / np.sqrt(m)
    b2 = rng.normal(size=(c,)) * 0.1

    ref = mlp(x, w1, b1, w2, b2)
    scale = np.sqrt(np.mean(ref**2))

    def report(name, y):
        d = y - ref
        print(
            f"{name:44s} max-abs {np.max(np.abs(d)):9.5f}"
            f"  rel-RMS {np.sqrt(np.mean(d**2))/scale:8.5f}"
        )

    report("int8 weights only (per-channel)", mlp(x, w1, b1, w2, b2, int8_w=True))
    report("int8 weights only (8 groups along C)",
           mlp(x, w1, b1, w2, b2, int8_w=True, groups=8))
    report("int8 activations only (per-row)", mlp(x, w1, b1, w2, b2, int8_x=True))
    report("both int8 (shipped kernel schedule)",
           mlp(x, w1, b1, w2, b2, int8_w=True, int8_x=True))
    report("both int8, 8-group weight scales",
           mlp(x, w1, b1, w2, b2, int8_w=True, int8_x=True, groups=8))


if __name__ == "__main__":
    main()
