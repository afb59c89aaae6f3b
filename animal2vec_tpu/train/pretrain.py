"""Pretraining: data2vec-2.0 loss assembly + jitted train/eval steps.

Replaces the fairseq Trainer + ExpandedModelCriterion stack
(nn/audio_train_routine.py:262-383, nn/criterions.py:388-411) with one
compiled function: mixup -> local features -> clone-batch masking -> student
(keep-set) -> conv decoders -> EMA teacher targets -> masked regression
[+ linear-probe focal loss], with gradient accumulation as a lax.scan over
microbatches (the reference's GroupedIterator/update_freq,
nn/audio_train_routine.py:276-280) and the EMA update fused into the same
step. All cross-device reduction is GSPMD-inserted from shardings.
"""

from __future__ import annotations

import ast
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from animal2vec_tpu.config import Config
from animal2vec_tpu.models.data2vec2 import Data2VecMulti, finish_targets
from animal2vec_tpu.ops import (
    bc_mixup,
    d2v_regression_loss,
    sigmoid_focal_loss,
    span_mask,
    expected_span_mask_tokens,
    compute_var,
)
from animal2vec_tpu.ops.masking import make_mask_info_static
from animal2vec_tpu.ops.stats import confusion_counts
from animal2vec_tpu.train.state import PretrainState, merge_params, ema_decay_at


def _rngs(rng: jax.Array, names=("dropout", "layerdrop", "mask_noise")) -> Dict[str, jax.Array]:
    keys = jax.random.split(rng, len(names))
    return dict(zip(names, keys))


def pretrain_loss(
    params: Any,
    ema_params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    model: Data2VecMulti,
    cfg: Config,
    train: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    mcfg = cfg.model
    mode = (mcfg.supported_modality or "AUDIO").upper()
    acfg = mcfg.modalities.audio if mode == "AUDIO" else mcfg.modalities.image

    rng, r_mix, r_mask, r_apply = jax.random.split(rng, 4)
    source = batch["source"]
    target = batch.get("target")

    # BC-learning mixup on device (nn/data2vec2.py:536-598); audio only
    if (
        train and mode == "AUDIO"
        and mcfg.mixup.source_mixup >= 0 and mcfg.mixup.mixup_prob > 0
    ):
        source, target = bc_mixup(
            r_mix,
            source,
            target,
            mcfg.mixup.source_mixup,
            mcfg.mixup.mixup_prob,
            mcfg.mixup.same_mixup,
            mcfg.mixup.gain_mode,
            mcfg.sample_rate,
            mcfg.mixup.mixing_window_length,
            mcfg.mixup.target_mixup and mcfg.with_labels,
        )

    variables = {"params": params}
    local = model.apply(
        variables,
        source,
        mode,
        not train,
        method=Data2VecMulti.local_features,
        rngs=_rngs(rng) if train else None,
    )
    from animal2vec_tpu.parallel.mesh import constrain_batch

    local = constrain_batch(local)
    b, t, c = local.shape

    # clone_batch applies in eval too: the reference's valid_step runs the
    # full forward (not features_only), and contextualized_features clones
    # whenever mask=True (nn/data2vec2.py:629-637, base.py:241-261)
    clone = mcfg.clone_batch
    local_c = jnp.repeat(local, clone, axis=0) if clone > 1 else local

    if mode == "IMAGE" and acfg.mask_length > 1:
        # 2-D block masking for the image branch
        # (nn/modalities/images.py:200-239)
        from animal2vec_tpu.ops import block_mask_2d

        mask = block_mask_2d(
            r_mask, b * clone, t, acfg.mask_prob, acfg.mask_length,
            acfg.mask_prob_adjust, acfg.inverse_mask,
        )
        # block_mask_2d exactifies to round(P * p) (or its inverse)
        m_tokens = int(t * acfg.mask_prob)
        if acfg.inverse_mask:
            m_tokens = t - m_tokens
        m_tokens = max(1, min(m_tokens, t - 1))
    else:
        # span masking, static count (nn/modalities/base.py:370-425)
        mask = span_mask(
            r_mask, b * clone, t, acfg.mask_prob, acfg.mask_length, acfg.mask_dropout
        )
        m_tokens = expected_span_mask_tokens(
            t, acfg.mask_prob, acfg.mask_length, acfg.mask_dropout
        )
    info = make_mask_info_static(mask, m_tokens, acfg.keep_masked_pct)

    rng, r_student, r_dec = jax.random.split(rng, 3)
    x, taps, _, keeps = model.apply(
        variables,
        local_c,
        mode,
        info,
        True,  # remove_masked
        None,
        None,
        acfg.encoder_zero_mask,
        not train,
        method=Data2VecMulti.encode,
        rngs=_rngs(r_student),
    )
    x = constrain_batch(x)
    xs = model.apply(
        variables,
        x,
        mode,
        info,
        not train,
        method=Data2VecMulti.decode_d2v,
        rngs=_rngs(r_dec),
    )

    # EMA teacher on the unmasked full sequence (nn/data2vec2.py:779-844).
    # reduce_targets streams the top-k normalized-tap sum through the
    # teacher's scan — the (depth, B, T, C) fp32 tap stack never exists.
    teacher_model = model
    if mcfg.teacher_matmul_impl and mcfg.teacher_matmul_impl != mcfg.matmul_impl:
        # quantized teacher: same param tree, int8 matmul routing only for
        # this (deterministic, stop-gradient) forward. Safe under grad:
        # targets are stop_gradient'ed, so the int8 kernels (no vjp) are
        # never differentiated.
        import dataclasses as _dc

        # derive from model.cfg (NOT cfg.model): the builder may have
        # adjusted the module's config (e.g. _with_pipeline copies
        # pipeline_stages in, train/build.py) and the teacher must keep
        # every such delta except the matmul routing
        teacher_model = Data2VecMulti(
            cfg=_dc.replace(model.cfg, matmul_impl=mcfg.teacher_matmul_impl),
            dtype=model.dtype,
        )
    # stop_gradient on the teacher VARIABLES too (not just the t_acc
    # output): with ema_encoder_only=true the merged tree carries live
    # student params (pos-conv/alibi), whose tangents would otherwise be
    # traced through the teacher forward — semantically dead (t_acc is
    # stop_gradient'ed below; the reference teacher runs under no_grad,
    # nn/data2vec2.py:819) but fatal for the vjp-less int8 teacher
    # kernels, which have no differentiation rule
    teacher_vars = jax.lax.stop_gradient(
        {"params": merge_params(params, ema_params)}
    )
    _, t_acc, _, _ = teacher_model.apply(
        teacher_vars,
        jax.lax.stop_gradient(local),
        mode,
        None,
        False,
        None,
        None,
        True,
        True,  # deterministic
        True,  # reduce_targets
        method=Data2VecMulti.encode,
    )
    y = finish_targets(
        jax.lax.stop_gradient(t_acc) / mcfg.average_top_k_layers, mcfg
    )  # (B, T, C) fp32

    # static-count masked gather (ids, not boolean select). The clone rows
    # [i*clone, (i+1)*clone) all read sample i's targets, so gather straight
    # from the un-cloned y by folding the clone axis into the gather index —
    # the repeat_interleave'd (B*clone, T, C) fp32 teacher-target buffer
    # (~0.4 GB for a2v-large at batch 4) never materializes
    # (reference: nn/data2vec2.py:846-858 repeats, then indexes).
    k_keep = info.ids_keep.shape[1]
    ids_masked = info.ids_shuffle[:, k_keep:]  # (B*, M)
    m_cnt = ids_masked.shape[1]
    if clone > 1:
        ids_flat = ids_masked.reshape(b, clone * m_cnt)
        y_m = jnp.take_along_axis(y, ids_flat[..., None], axis=1)
        y_m = y_m.reshape(b * clone, m_cnt, y.shape[-1])
    else:
        y_m = jnp.take_along_axis(y, ids_masked[..., None], axis=1)

    # eval loaders pad the final short batch by repeating items; weight
    # the repeated rows out of every summed loss/counter (train drops last)
    n_valid = batch.get("n_valid")
    if n_valid is not None:
        row_w = (jnp.arange(b) < n_valid).astype(jnp.float32)
        n_rows = n_valid.astype(jnp.float32)
    else:
        row_w = jnp.ones((b,), jnp.float32)
        n_rows = jnp.asarray(b, jnp.float32)
    clone_w = jnp.repeat(row_w, clone, axis=0) if clone > 1 else row_w
    sample_size = n_rows * clone * m_cnt

    losses = {}
    metrics: Dict[str, jnp.ndarray] = {}
    if mcfg.d2v_loss > 0:
        for i, xd in enumerate(xs):
            x_m = jnp.take_along_axis(xd, ids_masked[..., None], axis=1)
            name = f"{mode}_regression_{i}" if len(xs) > 1 else f"{mode}_regression"
            reg = d2v_regression_loss(x_m, y_m, mcfg.loss_beta, mcfg.loss_scale)
            reg = reg.reshape(b * clone, -1) * clone_w[:, None]
            losses[name] = reg.sum() * mcfg.d2v_loss
            metrics[f"pred_var_{i}" if len(xs) > 1 else "pred_var"] = compute_var(
                jax.lax.stop_gradient(x_m)
            )

    if mcfg.cls_loss > 0 and acfg.num_extra_tokens > 0:
        # per-sample time-mean, broadcast to the clone rows post-reduction
        cls_target = jnp.repeat(y.mean(axis=1), clone, axis=0) if clone > 1 else y.mean(axis=1)
        cls_pred = x[:, acfg.num_extra_tokens - 1]
        cls_reg = d2v_regression_loss(cls_pred, cls_target, mcfg.loss_beta, mcfg.loss_scale)
        cls_reg = cls_reg.reshape(b * clone, -1) * clone_w[:, None]
        # reference scales by sample_size (nn/data2vec2.py:879-881) to cancel
        # the criterion's /sample_size, making cls a per-element sum
        losses["cls"] = cls_reg.sum() * mcfg.cls_loss * sample_size

    if mcfg.recon_loss > 0 and mode == "IMAGE":
        recon_t = model.apply(
            variables, batch["source"], method=Data2VecMulti.patchify_targets
        )
        if clone > 1:
            ids_flat = ids_masked.reshape(b, clone * m_cnt)
            recon_t = jnp.take_along_axis(recon_t, ids_flat[..., None], axis=1)
            recon_t = recon_t.reshape(b * clone, m_cnt, recon_t.shape[-1])
        else:
            recon_t = jnp.take_along_axis(recon_t, ids_masked[..., None], axis=1)
        recon = jnp.take_along_axis(xs[0], ids_masked[..., None], axis=1)
        recon = model.apply(variables, recon, method=Data2VecMulti.recon_head)
        losses["recon"] = (
            d2v_regression_loss(recon, recon_t, mcfg.loss_beta, mcfg.loss_scale).sum()
            * mcfg.recon_loss
        )

    # supervised linear probe during pretrain (nn/data2vec2.py:911-947)
    if mcfg.with_labels and target is not None:
        logits = model.apply(
            variables,
            taps,
            mode,
            info,
            not train,
            keeps,
            method=Data2VecMulti.linear_eval,
            rngs=_rngs(rng),
        )  # (B*, T, C) after decoder scatter
        tgt = jnp.repeat(target, clone, axis=0) if clone > 1 else target
        if logits.shape[1] == info.mask.shape[1]:
            logits_m = jnp.take_along_axis(logits, ids_masked[..., None], axis=1)
            tgt_m = jnp.take_along_axis(tgt, ids_masked[..., None], axis=1)
        else:
            logits_m, tgt_m = logits, tgt
        rows = logits_m.shape[0]
        probe_w = clone_w if rows == b * clone else row_w
        if mcfg.use_focal_loss:
            pl_loss = sigmoid_focal_loss(logits_m, tgt_m, reduction="none")
            losses["linear_eval_loss"] = (
                pl_loss.reshape(rows, -1) * probe_w[:, None]
            ).sum()
        else:
            from animal2vec_tpu.ops import label_smoothed_nll_loss

            pl_loss = label_smoothed_nll_loss(
                logits_m, tgt_m.reshape(-1), reduction="none"
            )
            losses["linear_eval_loss"] = (
                pl_loss.reshape(rows, -1) * probe_w[:, None]
            ).sum()
        preds = (jax.nn.sigmoid(logits_m.astype(jnp.float32)) >= mcfg.metric_threshold).astype(jnp.int32)
        w3 = probe_w.reshape((rows,) + (1,) * (preds.ndim - 1))
        tp, fp, tn, fn = confusion_counts(preds, tgt_m, weights=w3)
        metrics.update(
            {
                "pretrain/n_correct": jnp.sum((preds == tgt_m.astype(jnp.int32)) * w3),
                "pretrain/total": probe_w.sum() * (preds.size // rows),
                "pretrain/tp": tp,
                "pretrain/fp": fp,
                "pretrain/tn": tn,
                "pretrain/fn": fn,
            }
        )

    # ModelCriterion weighting contract (nn/criterions.py:388-399):
    # per-loss weights from criterion.loss_weights, default 1.0
    weights = cfg.criterion.loss_weights or {}
    loss = sum(v * weights.get(k, 1.0) for k, v in losses.items()) / sample_size
    metrics["target_var"] = compute_var(y_m)
    metrics["masked_pct"] = jnp.asarray(m_tokens / t, jnp.float32)
    metrics["sample_size"] = sample_size
    for k, v in losses.items():
        metrics[f"loss_{k}"] = v / sample_size
    return loss, metrics


def make_pretrain_train_step(model: Data2VecMulti, cfg: Config):
    """Build the jitted update: grad-accum scan -> optimizer -> EMA."""
    accum = max(1, cfg.optimization.update_freq)

    def train_step(state: PretrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        """batch leaves are (accum, B, ...)."""

        grad_fn = jax.value_and_grad(pretrain_loss, has_aux=True)

        def micro(carry, inp):
            grads_acc, metrics_acc = carry
            mb, r = inp
            (loss, metrics), grads = grad_fn(
                state.params, state.ema_params, mb, r, model, cfg, True
            )
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            metrics = {**metrics, "loss": loss}
            metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc, metrics)
            return (grads_acc, metrics_acc), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        rngs = jax.random.split(rng, accum)
        mb0 = jax.tree_util.tree_map(lambda x: x[0], batch)
        # metric structure probe (shapes only, eval_shape is free)
        metric_shapes = jax.eval_shape(
            lambda p, e, b, r: pretrain_loss(p, e, b, r, model, cfg, True)[1],
            state.params, state.ema_params, mb0, rngs[0],
        )
        zero_metrics = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), metric_shapes
        )
        zero_metrics["loss"] = jnp.asarray(0.0, jnp.float32)

        (grads, metrics), _ = jax.lax.scan(
            micro, (zero_grads, zero_metrics), (batch, rngs)
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        metrics = jax.tree_util.tree_map(lambda m: m / accum, metrics)
        new_state = state.apply_gradients(grads, cfg.model)
        metrics["ema_decay"] = ema_decay_at(cfg.model, new_state.step) * 1000.0
        return new_state, metrics

    return train_step


def make_pretrain_eval_step(model: Data2VecMulti, cfg: Config):
    def eval_step(state: PretrainState, batch, rng):
        loss, metrics = pretrain_loss(
            state.params, state.ema_params, batch, rng, model, cfg, train=False
        )
        metrics["loss"] = loss
        return metrics

    return eval_step
