"""Metric / statistics primitives.

confusion_counts mirrors nn/utils.py:925-968 (micro-averaged TP/FP/TN/FN over
classes); compute_var mirrors nn/data2vec2.py:1095-1110 including the
cross-replica reduction (the reference's ``dist.all_reduce`` becomes an
optional ``lax.psum`` axis); get_annealed_rate mirrors
nn/modalities/base.py:492-497.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def confusion_counts(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Micro-averaged TP/FP/TN/FN for binary {0,1} arrays of equal shape.

    ``weights`` (broadcastable to ``preds``) masks elements out of the
    counts — used to exclude repeated padding rows in eval batches."""
    preds = preds.astype(jnp.int32)
    targets = targets.astype(jnp.int32)
    if weights is None:
        tp = jnp.sum((preds == 1) & (targets == 1))
        fp = jnp.sum((preds == 1) & (targets == 0))
        tn = jnp.sum((preds == 0) & (targets == 0))
        fn = jnp.sum((preds == 0) & (targets == 1))
    else:
        tp = jnp.sum(((preds == 1) & (targets == 1)) * weights)
        fp = jnp.sum(((preds == 1) & (targets == 0)) * weights)
        tn = jnp.sum(((preds == 0) & (targets == 0)) * weights)
        fn = jnp.sum(((preds == 0) & (targets == 1)) * weights)
    return tp, fp, tn, fn


def multilabel_accuracy(
    logits: jnp.ndarray, targets: jnp.ndarray, threshold: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(n_correct, total) with sigmoid thresholding
    (nn/data2vec2.py:1068-1082)."""
    preds = (jax.nn.sigmoid(logits.astype(jnp.float32)) >= threshold).astype(jnp.int32)
    n_correct = jnp.sum(preds == targets.astype(jnp.int32))
    total = jnp.asarray(preds.size, dtype=jnp.int32)
    return n_correct, total


def compute_var(y: jnp.ndarray, axis_name: Optional[str] = None) -> jnp.ndarray:
    """Mean over dims of sqrt(var + 1e-6) across the flattened batch,
    optionally reduced across a mesh axis (nn/data2vec2.py:1095-1110)."""
    y = y.reshape(-1, y.shape[-1]).astype(jnp.float32)
    if axis_name is not None:
        zc = jax.lax.psum(jnp.asarray(y.shape[0], jnp.float32), axis_name)
        zs = jax.lax.psum(y.sum(axis=0), axis_name)
        zss = jax.lax.psum((y**2).sum(axis=0), axis_name)
        var = zss / (zc - 1) - (zs**2) / (zc * (zc - 1))
    else:
        var = jnp.var(y, axis=0, ddof=1)
    return jnp.sqrt(var + 1e-6).mean()


def get_annealed_rate(start: float, end: float, curr_step, total_steps: int):
    """Linear anneal from start to end over total_steps; traced-value safe."""
    r = end - start
    pct_remaining = 1.0 - curr_step / total_steps
    annealed = end - r * pct_remaining
    return jnp.where(curr_step >= total_steps, end, annealed)
