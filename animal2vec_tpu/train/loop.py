"""Training loop driver: epochs, validation, checkpoints, stopping.

Replaces nn/audio_train_routine.py (the L1 layer): build everything from a
Config, run the epoch/update loop with a single compiled step, trigger
validation + verbose reports, save/rotate checkpoints, stop on max_update /
patience / representation-collapse.

TPU-first details:
* one jitted step per phase (the finetune freeze schedule is a traced
  comparison — no recompiles at the 10k boundary),
* the variance kill-switch (nn/data2vec2.py:972-988) cannot raise inside
  jit; metrics come back each log interval and the host raises
  CollapseError (recovery = restart from the last checkpoint, same as the
  reference),
* metric host transfers happen only at log boundaries.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from animal2vec_tpu.config import Config
from animal2vec_tpu.data.dataset import AudioLabelDataset, BatchLoader
from animal2vec_tpu.evalx.reports import log_eval_report
from animal2vec_tpu.evalx.segmentation import segmented_probs_and_targets, intervals_from_binary
from animal2vec_tpu.ops.conv_arith import feature_extractor_out_length
from animal2vec_tpu.parallel import build_mesh, batch_sharding, param_sharding, replicated
from animal2vec_tpu.train.build import init_finetune, init_pretrain
from animal2vec_tpu.train.checkpoint import CheckpointManager
from animal2vec_tpu.train.finetune_step import (
    make_finetune_eval_step,
    make_finetune_train_step,
)
from animal2vec_tpu.train.metrics import MetricsAccumulator, TensorboardSink
from animal2vec_tpu.train.pretrain import (
    make_pretrain_eval_step,
    make_pretrain_train_step,
)

logger = logging.getLogger("animal2vec_tpu")


class CollapseError(RuntimeError):
    """Representation collapse detected (nn/data2vec2.py:972-988)."""


def _target_len(cfg: Config) -> int:
    if cfg.task.max_sample_size:
        return min(cfg.task.max_sample_size, 80_000 * 4)
    return 80_000 if cfg.task.sample_rate == 8000 else 10 * cfg.task.sample_rate


def _build_loader(
    cfg: Config, split: str, train: bool, accum: int, mesh=None
) -> BatchLoader:
    ds = AudioLabelDataset(
        os.path.join(cfg.task.data, f"{split}.tsv"),
        sample_rate=cfg.task.sample_rate,
        min_sample_size=cfg.task.min_sample_size,
        normalize=cfg.task.normalize,
        return_labels=cfg.task.with_labels,
        unique_labels=cfg.task.labels(),
        use_focal_loss=cfg.criterion.use_focal_loss,
        do_focal_prediction=cfg.task.do_focal_prediction,
        min_label_size=cfg.task.min_label_size if train else 0,
        conv_layers=cfg.task.conv_layers(),
    )
    return BatchLoader(
        ds,
        target_len=_target_len(cfg),
        max_tokens=cfg.dataset.max_tokens,
        batch_size=cfg.dataset.batch_size,
        accum=accum if train else 1,
        shuffle=train,
        seed=cfg.common.seed,
        num_workers=cfg.dataset.num_workers,
        host_index=jax.process_index(),
        host_count=jax.process_count(),
        train=train,
        drop_last=train,
        bucket_lengths=cfg.dataset.buckets(),
        # bucket batch sizes must stay shardable over the mesh "data" axis
        batch_multiple=max(
            cfg.dataset.required_batch_size_multiple,
            int(mesh.shape["data"]) if mesh is not None else 1,
        ),
    )


def _shard_batch(batch: Dict[str, np.ndarray], mesh, train: bool):
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in batch.items():
        if k in ("id", "valid_len"):
            continue
        if k == "n_valid":  # replicated scalar: true (unpadded) item count
            out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P()))
            continue
        ndim = v.ndim
        if train:  # leading accum dim
            spec = P(None, "data", *([None] * (ndim - 2)))
        else:
            spec = P("data", *([None] * (ndim - 1)))
        out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    return out


def _check_collapse(cfg: Config, step: int, metrics: Dict[str, float]):
    if step <= 5000:
        return
    tv = metrics.get("target_var")
    if tv is not None and tv < cfg.model.min_target_var:
        raise CollapseError(f"target var {tv:.4f} < {cfg.model.min_target_var}")
    for k, v in metrics.items():
        if k.startswith("pred_var") and v < cfg.model.min_pred_var:
            raise CollapseError(f"{k} {v:.4f} < {cfg.model.min_pred_var}")


class RunStopper:
    """max_update / stop_time_hours / stop_min_lr stop conditions
    (nn/audio_train_routine.py:194-199,399-416)."""

    def __init__(self, cfg: Config, limit: int):
        from animal2vec_tpu.train.optim import build_lr_schedule

        self.limit = limit
        self.stop_s = cfg.optimization.stop_time_hours * 3600.0
        self.stop_min_lr = cfg.optimization.stop_min_lr
        self.schedule = build_lr_schedule(cfg.optimization)
        self.t0 = time.monotonic()
        # stop_min_lr only binds after warmup (the warmup ramp starts below it)
        self.warmup = cfg.optimization.warmup_updates

    def should_stop(self, step: int) -> Optional[str]:
        if step >= self.limit:
            return f"max_update {self.limit}"
        if self.stop_s > 0 and time.monotonic() - self.t0 >= self.stop_s:
            return f"stop_time_hours {self.stop_s / 3600.0:g}"
        if self.stop_min_lr >= 0 and step > self.warmup:
            lr = float(self.schedule(step))
            if lr < self.stop_min_lr:
                return f"lr {lr:.3g} < stop_min_lr {self.stop_min_lr:g}"
        return None


class EarlyStopper:
    """Patience-based early stop on the best checkpoint metric
    (nn/audio_train_routine.py:233-258)."""

    def __init__(self, patience: int, maximize: bool):
        self.patience = patience
        self.maximize = maximize
        self.best: Optional[float] = None
        self.bad = 0

    def should_stop(self, value: Optional[float]) -> bool:
        if value is None or self.patience <= 0:
            return False
        better = self.best is None or (
            value > self.best if self.maximize else value < self.best
        )
        if better:
            self.best = value
            self.bad = 0
        else:
            self.bad += 1
        return self.bad > self.patience


def run_pretrain(cfg: Config, max_steps: Optional[int] = None) -> Dict[str, float]:
    """Full pretraining run (animal2vec_audio_main + train, routine :48-383)."""
    mesh = build_mesh(cfg.distributed)
    model, state = init_pretrain(
        cfg, jax.random.PRNGKey(cfg.common.seed), example_wav_len=_target_len(cfg)
    )
    ckpt = CheckpointManager(
        cfg.checkpoint.save_dir,
        keep_last=cfg.checkpoint.keep_last,
        best_metric=cfg.checkpoint.best_checkpoint_metric,
        maximize=cfg.checkpoint.maximize_best_checkpoint_metric,
    )
    loader_state = {}
    if ckpt.latest_step() is not None:
        state, extra = ckpt.restore(template=state)
        loader_state = extra.get("loader", {})
        logger.info("restored checkpoint at step %d", int(state.step))

    shardings = param_sharding(state.params, mesh, fsdp=cfg.distributed.fsdp)
    params_sh = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), state)
    state = state.replace(params=params_sh)

    step_fn = jax.jit(make_pretrain_train_step(model, cfg), donate_argnums=(0,))
    eval_fn = jax.jit(make_pretrain_eval_step(model, cfg))
    accum = max(1, cfg.optimization.update_freq)
    loader = _build_loader(cfg, cfg.dataset.train_subset, True, accum, mesh)
    if len(loader) == 0:
        raise ValueError(
            f"train split {cfg.dataset.train_subset!r} yields 0 batches: "
            f"{len(loader.dataset)} usable items < one batch group of "
            f"{loader.batch_size * loader.accum} (batch_size x update_freq); "
            "lower dataset.batch_size/max_tokens or use a larger subset"
        )
    loader.load_state_dict(loader_state)
    sink = TensorboardSink(cfg.common.tensorboard_logdir)
    acc = MetricsAccumulator()
    limit = min(cfg.optimization.max_update, max_steps or cfg.optimization.max_update)
    rng = jax.random.PRNGKey(cfg.common.seed + 17)
    run_stop = RunStopper(cfg, limit)
    stop_reason = None
    last = {}

    with mesh:
        while int(state.step) < limit and stop_reason is None:
            loader.set_epoch(loader.epoch)
            for batch in loader:
                sb = _shard_batch(batch, mesh, train=True)
                rng, sub = jax.random.split(rng)
                # per-step trace annotation (parity with the reference's
                # record_function("train_step-%d"), nn/audio_train_routine.py:331-333)
                with jax.profiler.StepTraceAnnotation("train_step", step_num=int(state.step)):
                    state, metrics = step_fn(state, sb, sub)
                acc.update(metrics)
                step = int(state.step)
                if step % cfg.common.log_interval == 0 or step >= limit:
                    last = acc.summary("train/")
                    sink.log(last, step)
                    logger.info("step %d %s", step, _fmt(last))
                    _check_collapse(
                        cfg, step, {k.split("/", 1)[1]: v for k, v in last.items()}
                    )
                    acc.reset()
                do_validate = (
                    not cfg.dataset.disable_validation
                    and step >= cfg.dataset.validate_after_updates
                    and cfg.dataset.validate_interval_updates
                    and step % cfg.dataset.validate_interval_updates == 0
                )
                if do_validate:
                    val = validate_pretrain(cfg, model, state, eval_fn, mesh, sink, step)
                    ckpt.save(
                        step, state, extra={"loader": loader.state_dict()}, metrics=val
                    )
                elif cfg.checkpoint.save_interval_updates and step % cfg.checkpoint.save_interval_updates == 0:
                    ckpt.save(step, state, extra={"loader": loader.state_dict()})
                stop_reason = run_stop.should_stop(step)
                if stop_reason:
                    break
            loader.epoch += 1
    if stop_reason:
        logger.info("stopping: %s", stop_reason)
    ckpt.save(int(state.step), state, extra={"loader": loader.state_dict()})
    ckpt.wait()
    return last


def validate_pretrain(cfg, model, state, eval_fn, mesh, sink, step) -> Dict[str, float]:
    """Pretrain validation (nn/audio_train_routine.py:471-560): masked-
    prediction loss + variance stats on the valid split, plus the linear-
    probe counters when labels are available."""
    loader = _build_loader(cfg, cfg.dataset.valid_subset, False, 1)
    acc = MetricsAccumulator()
    rng = jax.random.PRNGKey(0)
    with mesh:
        for batch in loader:
            sb = _shard_batch(batch, mesh, train=False)
            metrics = eval_fn(state, sb, rng)
            acc.update(metrics)
    out = acc.summary("valid/")
    sink.log(out, step)
    logger.info("valid %d %s", step, _fmt(out))
    return out


def run_finetune(
    cfg: Config,
    pretrained_params=None,
    max_steps: Optional[int] = None,
    patience: Optional[int] = None,
) -> Dict[str, float]:
    """Full finetuning run with validation + best-F1 checkpointing."""
    mesh = build_mesh(cfg.distributed)
    model, state = init_finetune(
        cfg,
        jax.random.PRNGKey(cfg.common.seed),
        pretrained_params=pretrained_params,
        example_wav_len=_target_len(cfg),
    )
    ckpt = CheckpointManager(
        cfg.checkpoint.save_dir,
        keep_last=cfg.checkpoint.keep_last,
        best_metric=cfg.checkpoint.best_checkpoint_metric or "metrics/finetune/f1",
        maximize=True,
    )
    loader_state = {}
    if ckpt.latest_step() is not None:
        state, extra = ckpt.restore(template=state)
        loader_state = extra.get("loader", {})
        logger.info("restored checkpoint at step %d", int(state.step))

    shardings = param_sharding(state.params, mesh, fsdp=cfg.distributed.fsdp)
    params_sh = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), state)
    state = state.replace(params=params_sh)

    step_fn = jax.jit(make_finetune_train_step(model, cfg), donate_argnums=(0,))
    eval_fn = jax.jit(make_finetune_eval_step(model, cfg))
    accum = max(1, cfg.optimization.update_freq)
    loader = _build_loader(cfg, cfg.dataset.train_subset, True, accum, mesh)
    if len(loader) == 0:
        raise ValueError(
            f"train split {cfg.dataset.train_subset!r} yields 0 batches: "
            f"{len(loader.dataset)} usable items < one batch group of "
            f"{loader.batch_size * loader.accum} (batch_size x update_freq); "
            "lower dataset.batch_size/max_tokens or use a larger subset"
        )
    loader.load_state_dict(loader_state)
    sink = TensorboardSink(cfg.common.tensorboard_logdir)
    acc = MetricsAccumulator()
    limit = min(cfg.optimization.max_update, max_steps or cfg.optimization.max_update)
    rng = jax.random.PRNGKey(cfg.common.seed + 23)
    # CLI arg overrides the config knob when given (reference sets
    # checkpoint.patience in the finetune YAMLs)
    stopper = EarlyStopper(
        cfg.checkpoint.patience if patience is None else patience,
        cfg.checkpoint.maximize_best_checkpoint_metric,
    )
    run_stop = RunStopper(cfg, limit)
    stop_reason = None
    last = {}

    with mesh:
        while int(state.step) < limit and stop_reason is None:
            loader.set_epoch(loader.epoch)
            for batch in loader:
                sb = _shard_batch(batch, mesh, train=True)
                rng, sub = jax.random.split(rng)
                # per-step trace annotation (parity with the reference's
                # record_function("train_step-%d"), nn/audio_train_routine.py:331-333)
                with jax.profiler.StepTraceAnnotation("train_step", step_num=int(state.step)):
                    state, metrics = step_fn(state, sb, sub)
                acc.update(metrics)
                step = int(state.step)
                if step % cfg.common.log_interval == 0 or step >= limit:
                    last = acc.summary("train/")
                    sink.log(last, step)
                    logger.info("step %d %s", step, _fmt(last))
                    acc.reset()
                do_validate = (
                    not cfg.dataset.disable_validation
                    and step >= cfg.dataset.validate_after_updates
                    and cfg.dataset.validate_interval_updates
                    and step % cfg.dataset.validate_interval_updates == 0
                )
                if do_validate:
                    val = validate_finetune(cfg, model, state, eval_fn, mesh, sink, step)
                    ckpt.save(
                        step, state, extra={"loader": loader.state_dict()}, metrics=val
                    )
                    if stopper.should_stop(val.get("metrics/finetune/f1")):
                        logger.info("early stop at %d", step)
                        ckpt.wait()
                        return val
                elif cfg.checkpoint.save_interval_updates and step % cfg.checkpoint.save_interval_updates == 0:
                    ckpt.save(step, state, extra={"loader": loader.state_dict()})
                stop_reason = run_stop.should_stop(step)
                if stop_reason:
                    break
            loader.epoch += 1
    if stop_reason:
        logger.info("stopping: %s", stop_reason)
    ckpt.save(int(state.step), state)
    ckpt.wait()
    return last


def validate_finetune(cfg, model, state, eval_fn, mesh, sink, step) -> Dict[str, float]:
    """Validation pass (routine :471-560): metric aggregation, then verbose
    frame + segmented reports on the gathered prediction tensors."""
    loader = _build_loader(cfg, cfg.dataset.valid_subset, False, 1)
    acc = MetricsAccumulator()
    all_probs, all_targets, all_fvalid = [], [], []
    rng = jax.random.PRNGKey(0)
    with mesh:
        for batch in loader:
            sb = _shard_batch(batch, mesh, train=False)
            metrics = eval_fn(state, sb, rng)
            preds = metrics.pop("_predictions", None)
            fvalid = metrics.pop("_frame_valid", None)
            acc.update(metrics)
            if preds is not None and cfg.task.verbose_tensorboard_logging:
                # trim repeated padding rows from the final short batch so
                # PR curves / reports see each clip exactly once
                nv = int(batch.get("n_valid", len(batch["source"])))
                p = np.asarray(preds)[:nv]
                all_probs.append(p)
                all_targets.append(np.asarray(batch["target"])[:nv])
                all_fvalid.append(
                    np.asarray(fvalid)[:nv]
                    if fvalid is not None
                    else np.ones(p.shape[:2], bool)
                )
    out = acc.summary()
    # native-length buckets produce per-bucket frame counts: right-pad every
    # batch to the longest frame length (padding marked frame-invalid)
    if all_probs:
        t_max = max(p.shape[1] for p in all_probs)

        def _pad_t(a):
            pad = ((0, 0), (0, t_max - a.shape[1])) + ((0, 0),) * (a.ndim - 2)
            return np.pad(a, pad)

        all_probs = [_pad_t(p) for p in all_probs]
        all_targets = [_pad_t(t) for t in all_targets]
        all_fvalid = [_pad_t(f) for f in all_fvalid]
    # cross-host gather of the raw prediction tensors — replaces fairseq's
    # pickle all_gather_list of un-summable logging outputs
    # (nn/criterions.py:368-377, nn/audio_train_routine.py:449-453).
    # Runs unconditionally on every host: BatchLoader shards eval items
    # order[host::hosts] with drop_last=False, so hosts can hold unequal
    # (even zero) sample counts and a skipped collective would deadlock.
    probs = np.concatenate(all_probs, 0).astype(np.float32) if all_probs else None
    targets = np.concatenate(all_targets, 0).astype(np.int32) if all_targets else None
    fvalid = np.concatenate(all_fvalid, 0) if all_fvalid else None
    if jax.process_count() > 1:
        probs = _allgather_uneven(probs, np.float32)
        targets = _allgather_uneven(targets, np.int32)
        fvalid = (
            _allgather_uneven(
                None if fvalid is None else fvalid[..., None].astype(np.float32),
                np.float32,
            )[..., 0]
            > 0.5
        )
    if probs is not None and probs.shape[0] > 0:
        if fvalid is not None:
            # padding frames must not fire events or enter frame metrics
            probs = probs * fvalid[..., None]
        segmented = None
        if cfg.criterion.segmentation_metrics:
            md = {
                "sigma_s": cfg.criterion.sigma_s,
                "metric_threshold": cfg.criterion.metric_threshold,
                "maxfilt_s": cfg.criterion.maxfilt_s,
                "max_duration_s": cfg.criterion.max_duration_s,
                "lowP": cfg.criterion.lowP,
                "iou_threshold": cfg.criterion.iou_threshold,
            }
            seg_idx = [
                [intervals_from_binary(targets[b, :, c]) for c in range(targets.shape[-1])]
                for b in range(targets.shape[0])
            ]
            pr, ta, iou, sp, me = segmented_probs_and_targets(
                targets, seg_idx, probs, md, cfg.task.sample_rate, _target_len(cfg),
                method=cfg.criterion.method,
            )
            segmented = {"probs": pr, "targets": ta, "iou": iou, "splits": sp, "mergers": me}
        if fvalid is not None:
            # frame metrics over true frames only (the reference evaluates
            # at native lengths, nn/audio_tasks.py:453-459; reports flatten
            # to (frames, C) so 2-D inputs are accepted directly)
            flat = fvalid.reshape(-1)
            frame_targets = targets.reshape(-1, targets.shape[-1])[flat]
            frame_probs = probs.reshape(-1, probs.shape[-1])[flat]
        else:
            frame_targets, frame_probs = targets, probs
        report = log_eval_report(
            frame_targets, frame_probs, cfg.task.labels(),
            cfg.criterion.metric_threshold,
            step, writer=sink.writer, prefix="valid", segmented=segmented,
        )
        out.update(report)
    sink.log(out, step)
    logger.info("valid %d %s", step, _fmt(out))
    return out


def _allgather_uneven(x: Optional[np.ndarray], dtype) -> np.ndarray:
    """All-gather (B_i, T, C) arrays whose leading dims differ per host
    (B_i may be zero). ``process_allgather`` requires identical shapes and
    dtypes on every process, so gather counts + trailing shapes first, pad
    every host to the max, then trim."""
    from jax.experimental import multihost_utils as mh

    local = (
        np.zeros((0, 0, 0), dtype) if x is None else np.asarray(x, dtype)
    )
    meta = np.asarray(
        [local.shape[0], *(local.shape[1:] if local.ndim == 3 else (0, 0))],
        np.int64,
    )
    metas = np.asarray(mh.process_allgather(meta, tiled=False)).reshape(-1, 3)
    counts = metas[:, 0]
    max_n = int(counts.max())
    t = int(metas[:, 1].max())
    c = int(metas[:, 2].max())
    if max_n == 0:
        return np.zeros((0, t, c), dtype)
    padded = np.zeros((max_n, t, c), dtype)
    if local.size:
        padded[: local.shape[0]] = local
    g = np.asarray(mh.process_allgather(padded, tiled=False)).reshape(
        (-1, max_n, t, c)
    )
    return np.concatenate(
        [g[h, : int(counts[h])] for h in range(g.shape[0])], 0
    )


def _fmt(metrics: Dict[str, float]) -> str:
    keys = sorted(metrics)[:12]
    return " ".join(f"{k}={metrics[k]:.4g}" for k in keys)
