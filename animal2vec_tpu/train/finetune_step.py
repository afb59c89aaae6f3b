"""Finetuning: focal-loss frame classification steps.

Replaces fairseq Trainer + FinetuneCrossEntropyCriterion
(nn/criterions.py:137-277): mixup (source+targets), masking-as-
regularization (span mask applied in place + channel mask,
nn/wav2vec2.py:369-448), focal or label-smoothed loss over all frames,
confusion-count metrics. The freeze-first-N-updates schedule is a traced
comparison against the state step, so phase changes don't recompile.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from animal2vec_tpu.config import Config
from animal2vec_tpu.models.finetune import FinetuneModel
from animal2vec_tpu.ops import (
    bc_mixup,
    sigmoid_focal_loss,
    label_smoothed_nll_loss,
    span_mask,
    expected_span_mask_tokens,
)
from animal2vec_tpu.ops.masking import make_mask_info_static, channel_mask as make_channel_mask
from animal2vec_tpu.ops.conv_arith import feature_extractor_out_length
from animal2vec_tpu.ops.stats import confusion_counts
from animal2vec_tpu.train.state import FinetuneState


def _rngs(rng):
    k = jax.random.split(rng, 3)
    return {"dropout": k[0], "layerdrop": k[1], "mask_noise": k[2]}


def finetune_loss(
    params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    step: jnp.ndarray,
    model: FinetuneModel,
    cfg: Config,
    train: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    ft = cfg.finetune
    source = batch["source"]
    target = batch["target"].astype(jnp.float32)
    padding_mask = batch.get("padding_mask")

    rng, r_mix, r_mask, r_cmask = jax.random.split(rng, 4)
    if train and ft.mixup.source_mixup >= 0 and ft.mixup.mixup_prob > 0:
        source, target = bc_mixup(
            r_mix,
            source,
            target,
            ft.mixup.source_mixup,
            ft.mixup.mixup_prob,
            ft.mixup.same_mixup,
            ft.mixup.gain_mode,
            ft.sample_rate,
            ft.mixup.mixing_window_length,
            ft.mixup.target_mixup,
        )

    b = source.shape[0]
    conv_layers = cfg.task.conv_layers()
    t_feat = feature_extractor_out_length(source.shape[1], conv_layers)

    mask_info = None
    cmask = None
    if train and ft.apply_mask and ft.mask_prob > 0:
        mask = span_mask(r_mask, b, t_feat, ft.mask_prob, ft.mask_length)
        m = expected_span_mask_tokens(t_feat, ft.mask_prob, ft.mask_length)
        mask_info = make_mask_info_static(mask, m)
    if train and ft.mask_channel_prob > 0:
        cmask = make_channel_mask(
            r_cmask, b, cfg.model.embed_dim, ft.mask_channel_prob, ft.mask_channel_length
        )

    gate = step >= ft.freeze_finetune_updates
    out = model.apply(
        {"params": params},
        source,
        padding_mask,
        mask_info,
        cmask,
        gate,
        not train,
        rngs=_rngs(rng) if train else None,
    )
    logits = out["encoder_out"]  # (B, T, C)
    t_frames = logits.shape[1]

    # eval loaders pad the final short batch by repeating items (row
    # weights) and, with native-length buckets, clips can be shorter than
    # the bucket (frame weights from the conv-rate padding mask). Both are
    # masked out of every summed metric so P/R/F1 and the loss are computed
    # over the true clips/frames only. Training is unchanged: drop_last
    # always (no repeated rows), and the reference computes the train loss
    # over all frames including padding (nn/criterions.py:241-247).
    n_valid = batch.get("n_valid")
    if n_valid is not None:
        row_w = (jnp.arange(b) < n_valid).astype(jnp.float32)
        n_rows = n_valid.astype(jnp.float32)
    else:
        row_w = jnp.ones((b,), jnp.float32)
        n_rows = jnp.asarray(b, jnp.float32)
    frame_pad = out.get("padding_mask")
    if not train and frame_pad is not None:
        fw = row_w[:, None] * (1.0 - frame_pad.astype(jnp.float32))  # (B, T)
    else:
        fw = jnp.broadcast_to(row_w[:, None], (b, t_frames))

    if cfg.criterion.use_focal_loss:
        loss = sigmoid_focal_loss(logits, target, reduction="none")
        loss = (loss * fw[:, :, None]).sum()
    else:
        loss = label_smoothed_nll_loss(
            logits, target.astype(jnp.int32).reshape(-1),
            epsilon=cfg.criterion.label_smoothing, reduction="none",
        )  # (B*T,)
        loss = (loss.reshape(b, t_frames) * fw).sum()
    ntokens = fw.sum()
    loss_n = loss / ntokens

    metrics: Dict[str, jnp.ndarray] = {"loss": loss_n, "sample_size": ntokens}
    p32 = None
    if not train:
        # verbose-eval capture (nn/criterions.py:270-276) — reused by the
        # eval step so the model runs once, not twice; padded rows/frames
        # are trimmed host-side (validate_finetune) using _frame_valid
        p32 = jax.nn.sigmoid(logits.astype(jnp.float32))
        metrics["_predictions"] = p32
        metrics["_frame_valid"] = fw > 0  # (B, T) bool
    if cfg.criterion.report_accuracy:
        if p32 is None:
            p32 = jax.nn.sigmoid(logits.astype(jnp.float32))
        preds = (p32 >= cfg.criterion.metric_threshold).astype(jnp.int32)
        tgt_bin = (target >= 0.5).astype(jnp.int32)
        w3 = fw[:, :, None]
        tp, fp, tn, fn = confusion_counts(preds, tgt_bin, weights=w3)
        metrics.update(
            {
                "finetune/n_correct": jnp.sum((preds == tgt_bin) * w3),
                "finetune/total": ntokens * logits.shape[-1],
                "finetune/tp": tp,
                "finetune/fp": fp,
                "finetune/tn": tn,
                "finetune/fn": fn,
            }
        )
    return loss_n, metrics


def make_finetune_train_step(model: FinetuneModel, cfg: Config):
    accum = max(1, cfg.optimization.update_freq)

    def train_step(state: FinetuneState, batch, rng: jax.Array):
        grad_fn = jax.value_and_grad(finetune_loss, has_aux=True)

        def micro(carry, inp):
            grads_acc, metrics_acc = carry
            mb, r = inp
            (loss, metrics), grads = grad_fn(
                state.params, mb, r, state.step, model, cfg, True
            )
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc, metrics)
            return (grads_acc, metrics_acc), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        rngs = jax.random.split(rng, accum)
        mb0 = jax.tree_util.tree_map(lambda x: x[0], batch)
        metric_shapes = jax.eval_shape(
            lambda p, b, r, s: finetune_loss(p, b, r, s, model, cfg, True)[1],
            state.params, mb0, rngs[0], state.step,
        )
        zero_metrics = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), metric_shapes
        )
        (grads, metrics), _ = jax.lax.scan(
            micro, (zero_grads, zero_metrics), (batch, rngs)
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        metrics = jax.tree_util.tree_map(lambda m: m / accum, metrics)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    return train_step


def make_finetune_eval_step(model: FinetuneModel, cfg: Config):
    def eval_step(state: FinetuneState, batch, rng):
        _, metrics = finetune_loss(
            state.params, batch, rng, state.step, model, cfg, train=False
        )
        return metrics

    return eval_step
