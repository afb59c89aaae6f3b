"""Host-side metrics registry.

Replaces the fairseq metrics aggregation contexts + meters
(nn/audio_train_routine.py:283-319, nn/criterions.py:279-377): device steps
return scalar dicts; this module accumulates them, computes derived P/R/F1
from summed confusion counts, concatenates eval prediction tensors for PR
curves (the ConcatTensorMeter role, nn/utils.py:1013-1040), and fans out to
tensorboard. Two tiers like the reference's can_sum switch: cheap summed
scalars during training, full tensor gather during verbose validation.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from animal2vec_tpu.evalx.reports import derived_prf


_SUM_KEYS = ("tp", "fp", "tn", "fn", "n_correct", "total", "sample_size")


def _is_sum_key(name: str) -> bool:
    leaf = name.split("/")[-1]
    return leaf in _SUM_KEYS


class MetricsAccumulator:
    """Accumulate per-step scalar dicts; average most keys, sum counters."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._tensors: Dict[str, List[np.ndarray]] = defaultdict(list)
        self._t0 = time.time()
        self._n_steps = 0

    def update(self, metrics: Dict):
        self._n_steps += 1
        for k, v in metrics.items():
            if k.startswith("_"):
                self._tensors[k].append(np.asarray(v))
                continue
            val = float(np.asarray(v))
            self._sums[k] += val
            self._counts[k] += 1

    def summary(self, prefix: str = "") -> Dict[str, float]:
        out: Dict[str, float] = {}
        for k, total in self._sums.items():
            if _is_sum_key(k):
                out[prefix + k] = total
            else:
                out[prefix + k] = total / max(1, self._counts[k])
        # derived metrics from summed confusion counts
        for group in ("finetune", "pretrain"):
            tp = self._sums.get(f"{group}/tp")
            if tp is not None:
                prf = derived_prf(
                    self._sums.get(f"{group}/tp", 0.0),
                    self._sums.get(f"{group}/fp", 0.0),
                    self._sums.get(f"{group}/tn", 0.0),
                    self._sums.get(f"{group}/fn", 0.0),
                )
                for name, val in prf.items():
                    out[f"{prefix}metrics/{group}/{name}"] = val
        if self._n_steps:
            elapsed = time.time() - self._t0
            out[prefix + "ups"] = self._n_steps / max(elapsed, 1e-9)
        return out

    def tensors(self) -> Dict[str, np.ndarray]:
        return {
            k: np.concatenate(v, axis=0) for k, v in self._tensors.items() if v
        }


class TensorboardSink:
    """Metric fan-out: tensorboard always (when a logdir is set), wandb and
    aim opportunistically when their packages + env config exist — the same
    sink set the reference's progress_bar selects
    (nn/audio_train_routine.py:283-319); azureml is intentionally absent."""

    def __init__(self, logdir: Optional[str], project: str = "animal2vec_tpu"):
        self.writer = None
        self._wandb = None
        self._aim_run = None
        if logdir:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(logdir)
            except Exception:
                self.writer = None
        import os

        if os.environ.get("WANDB_PROJECT") or os.environ.get("WANDB_API_KEY"):
            try:
                import wandb

                wandb.init(project=os.environ.get("WANDB_PROJECT", project))
                self._wandb = wandb
            except Exception:
                self._wandb = None
        if os.environ.get("AIM_REPO"):
            try:
                import aim

                self._aim_run = aim.Run(repo=os.environ["AIM_REPO"])
            except Exception:
                self._aim_run = None

    def log(self, metrics: Dict[str, float], step: int):
        scalars = {
            k: v
            for k, v in metrics.items()
            if isinstance(v, (int, float)) and np.isfinite(v)
        }
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(k, v, step)
            self.writer.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        if self._aim_run is not None:
            for k, v in scalars.items():
                self._aim_run.track(v, name=k, step=step)

    def log_figure(self, tag: str, figure, step: int):
        if self.writer is not None:
            self.writer.add_figure(tag, figure, step)
            self.writer.flush()
