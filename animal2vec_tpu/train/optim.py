"""Optimizer + LR schedule factory (optax).

Replaces the reference's fairseq composite optimizer + cosine scheduler
(configs/MeerKAT/a2v_large_pretrain_best.yaml:66-81,
finetune_mixup_100.yaml:67-76) and the per-parameter ``optim_overrides``
mechanism:

* no weight decay for 1-D params / biases / alibi_scale / p_swish
  (nn/data2vec2.py:318-320),
* layer-wise lr decay for finetuning (nn/wav2vec2.py:214-236) implemented as
  a per-slice multiplier over the *stacked* scanned-block parameters — one
  transform, not N param groups,
* cosine schedule with warmup; fairseq's cosine decays over
  (max_update - warmup) to min_lr.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
import flax.traverse_util as tu

from animal2vec_tpu.config import OptimizationConfig


def build_lr_schedule(cfg: OptimizationConfig) -> optax.Schedule:
    warmup = optax.linear_schedule(
        init_value=cfg.warmup_init_lr,
        end_value=cfg.lr,
        transition_steps=max(1, cfg.warmup_updates),
    )
    if cfg.schedule == "cosine":
        decay = optax.cosine_decay_schedule(
            init_value=cfg.lr,
            decay_steps=max(1, cfg.max_update - cfg.warmup_updates),
            alpha=cfg.min_lr / cfg.lr if cfg.lr > 0 else 0.0,
        )
    elif cfg.schedule == "constant":
        decay = optax.constant_schedule(cfg.lr)
    else:
        raise ValueError(cfg.schedule)
    return optax.join_schedules([warmup, decay], [cfg.warmup_updates])


def _no_decay(path: Tuple[str, ...], leaf) -> bool:
    """Match the reference's no-weight-decay rule
    (nn/data2vec2.py:318-320)."""
    name = path[-1] if path else ""
    joined = "/".join(str(p) for p in path)
    if "alibi_scale" in joined or "p_swish" in joined:
        return True
    if name in ("bias", "scale"):
        return True
    # stacked (scanned) leaves have a leading depth axis; a per-layer vector
    # is (depth, C) — still a "1-D" param in the reference's sense
    ndim = getattr(leaf, "ndim", 0)
    if "blocks/block" in joined or "/blocks_" in joined:
        return ndim <= 2 and name not in ("kernel",)
    return ndim <= 1


def decay_mask(params: Any) -> Any:
    flat = tu.flatten_dict(params)
    mask = {p: not _no_decay(p, v) for p, v in flat.items()}
    return tu.unflatten_dict(mask)


def layer_decay_scales(
    params: Any,
    layer_decay: float,
    prenet_path: Tuple[str, ...],
    trunk_path: Tuple[str, ...],
    prenet_depth: int,
    trunk_depth: int,
) -> Optional[Any]:
    """Per-leaf lr multipliers implementing layer-wise decay
    (nn/wav2vec2.py:214-236): layers 1..L get decay^(L+1-lid). Stacked block
    params get a (depth, 1, ...) broadcast vector; everything else 1.0."""
    if layer_decay >= 1.0:
        return None
    total = prenet_depth + trunk_depth
    num_layers = total + 1

    def scale_for(lid: int) -> float:
        return layer_decay ** (num_layers - lid)

    flat = tu.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        joined = tuple(path)
        if joined[: len(prenet_path)] == prenet_path:
            base = 1  # prenet layers are lid 1..prenet_depth
            vec = jnp.asarray([scale_for(base + i) for i in range(prenet_depth)])
        elif joined[: len(trunk_path)] == trunk_path:
            base = 1 + prenet_depth
            vec = jnp.asarray([scale_for(base + i) for i in range(trunk_depth)])
        else:
            out[path] = jnp.asarray(1.0)
            continue
        shape = (len(vec),) + (1,) * (leaf.ndim - 1)
        out[path] = vec.reshape(shape)
    return tu.unflatten_dict(out)


def scale_by_tree(scales: Any) -> optax.GradientTransformation:
    """Multiply updates by a per-leaf (broadcastable) scale tree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        upd = jax.tree_util.tree_map(lambda u, s: u * s, updates, scales)
        return upd, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    cfg: OptimizationConfig,
    params: Any,
    layer_scales: Optional[Any] = None,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """clip_by_global_norm -> adam(w) -> [layer-decay scaling] -> -lr."""
    schedule = build_lr_schedule(cfg)
    chain = []
    if cfg.clip_norm and cfg.clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_norm))
    chain.append(
        optax.scale_by_adam(b1=cfg.adam_betas[0], b2=cfg.adam_betas[1], eps=cfg.adam_eps)
    )
    if cfg.weight_decay and cfg.weight_decay > 0:
        chain.append(
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask(params))
        )
    if layer_scales is not None:
        chain.append(scale_by_tree(layer_scales))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain), schedule
