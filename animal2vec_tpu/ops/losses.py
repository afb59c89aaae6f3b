"""Loss functions: sigmoid focal loss, data2vec regression, smoothed CE.

sigmoid_focal_loss follows nn/utils.py:971-1010 (RetinaNet, alpha=0.25
gamma=2); d2v_regression_loss follows nn/data2vec2.py:1005-1021 (MSE or
smooth-L1 scaled by 1/sqrt(D)); label_smoothed_nll_loss is the focal-loss
alternative used when criterion.use_focal_loss is False
(nn/criterions.py:241-249).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "none",
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    # binary cross-entropy with logits, numerically stable
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def d2v_regression_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    loss_beta: float = 0.0,
    loss_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Per-element regression loss between student predictions and teacher
    targets, scaled by 1/sqrt(dim) when loss_scale is None."""
    d = x.shape[-1]
    x = x.reshape(-1, d).astype(jnp.float32)
    y = y.reshape(-1, d).astype(jnp.float32)
    if loss_beta == 0:
        loss = (x - y) ** 2
    else:
        diff = jnp.abs(x - y)
        loss = jnp.where(
            diff < loss_beta,
            0.5 * diff**2 / loss_beta,
            diff - 0.5 * loss_beta,
        )
    scale = loss_scale if loss_scale is not None else 1.0 / math.sqrt(d)
    return loss * scale


def label_smoothed_nll_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    epsilon: float = 0.0,
    reduction: str = "sum",
) -> jnp.ndarray:
    """Label-smoothed cross-entropy over integer class targets."""
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lprobs = lprobs.reshape(-1, lprobs.shape[-1])
    targets = targets.reshape(-1)
    nll = -jnp.take_along_axis(lprobs, targets[:, None], axis=-1)[:, 0]
    smooth = -lprobs.mean(axis=-1)
    loss = (1.0 - epsilon) * nll + epsilon * smooth
    if reduction == "sum":
        return loss.sum()
    if reduction == "mean":
        return loss.mean()
    return loss
