"""Checkpoint save/load/resume (orbax).

Replaces fairseq checkpoint_utils (consumed at
nn/audio_train_routine.py:82-90,176-181,459-461): async writes, keep-last-k
rotation, best-metric tracking, auto-resume, and the EMA teacher stored
alongside the student (the reference's ``_ema`` key,
nn/data2vec2.py:412-429). Dataloader epoch state rides along so resume is
deterministic.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

import logging

logger = logging.getLogger("animal2vec_tpu")

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


class CheckpointManager:
    """keep-last-k + best-metric checkpointing with async orbax writes."""

    def __init__(
        self,
        directory: str,
        keep_last: int = 10,
        best_metric: str = "",
        maximize: bool = True,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_last = keep_last
        self.best_metric = best_metric
        self.maximize = maximize
        self._best_value: Optional[float] = None
        self._checkpointer = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler()) if _HAVE_ORBAX else None
        )
        self._load_meta()

    # -- paths ----------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:010d}")

    def _meta_path(self) -> str:
        return os.path.join(self.directory, "meta.json")

    def _load_meta(self):
        if os.path.isfile(self._meta_path()):
            with open(self._meta_path()) as f:
                meta = json.load(f)
            self._best_value = meta.get("best_value")

    def _save_meta(self):
        with open(self._meta_path(), "w") as f:
            json.dump({"best_value": self._best_value}, f)

    def all_steps(self):
        out = []
        for name in os.listdir(self.directory):
            suffix = name[len("step_"):]
            if (
                name.startswith("step_")
                and suffix.isdigit()  # skip orbax .orbax-checkpoint-tmp dirs
                and os.path.isdir(os.path.join(self.directory, name))
            ):
                out.append(int(suffix))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # -- save / restore -------------------------------------------------
    def save(
        self,
        step: int,
        state: Any,
        extra: Optional[Dict[str, Any]] = None,
        metrics: Optional[Dict[str, float]] = None,
    ):
        path = self._step_dir(step)
        tree = {"state": _to_savable(state)}
        if extra:
            tree["extra"] = extra
        if self._checkpointer is not None:
            # an earlier async save of this step may still be finalizing;
            # serialize before re-writing the same destination
            self.wait()
            if os.path.exists(path):
                shutil.rmtree(path, ignore_errors=True)
            self._checkpointer.save(path, tree)
        else:  # numpy fallback
            os.makedirs(path, exist_ok=True)
            flat = _flatten(tree)
            np.savez(os.path.join(path, "state.npz"), **flat)
        if metrics and self.best_metric and self.best_metric in metrics:
            value = float(metrics[self.best_metric])
            better = (
                self._best_value is None
                or (value > self._best_value if self.maximize else value < self._best_value)
            )
            if better:
                self._best_value = value
                self.wait()
                best = os.path.join(self.directory, "best")
                if os.path.islink(best) or os.path.exists(best):
                    if os.path.islink(best):
                        os.unlink(best)
                    else:
                        shutil.rmtree(best)
                os.symlink(path, best)
                self._save_meta()
        self._rotate(in_flight=step)

    def wait(self):
        if self._checkpointer is not None:
            self._checkpointer.wait_until_finished()

    def _rotate(self, in_flight: Optional[int] = None):
        steps = self.all_steps()
        if in_flight is not None and in_flight not in steps:
            steps = sorted(steps + [in_flight])  # async write still finalizing
        if self.keep_last and len(steps) > self.keep_last:
            best_target = None
            best = os.path.join(self.directory, "best")
            if os.path.islink(best):
                best_target = os.path.realpath(best)
            self.wait()
            for s in steps[: -self.keep_last]:
                p = self._step_dir(s)
                if best_target and os.path.realpath(p) == best_target:
                    continue
                shutil.rmtree(p, ignore_errors=True)

    def restore(self, step: Optional[int] = None, template: Any = None) -> Tuple[Any, Dict]:
        step = step if step is not None else self.latest_step()
        assert step is not None, f"no checkpoints in {self.directory}"
        path = self._step_dir(step)
        if self._checkpointer is not None:
            tpl = {"state": _to_savable(template)} if template is not None else None
            restore_args = None
            tree = ocp.Checkpointer(ocp.PyTreeCheckpointHandler()).restore(path)
        else:
            data = np.load(os.path.join(path, "state.npz"), allow_pickle=True)
            tree = _unflatten({k: data[k] for k in data.files})
        state = tree["state"]
        extra = tree.get("extra", {})
        if template is not None:
            state = _restore_into(template, state)
        return state, extra


def _to_savable(state: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, state)


def _restore_into(template: Any, loaded: Any) -> Any:
    """Rebuild the template's pytree types (flax struct dataclasses, optax
    NamedTuple states, tuples) from orbax's dict/tuple-of-arrays restore.
    Leaves present in the template but missing from the checkpoint keep the
    template's (freshly-initialized) value — and are loudly logged, because a
    silent pad here means the run resumes with different optimizer state or
    hyperparameters than it was saved with."""
    missing: list = []
    out = _align(template, loaded, "", missing)
    if missing:
        logger.warning(
            "checkpoint restore: %d leaves missing from the checkpoint kept "
            "template values (config/optimizer mismatch?): %s%s",
            len(missing), ", ".join(missing[:8]),
            ", ..." if len(missing) > 8 else "",
        )
    return out


def _align(tpl: Any, val: Any, path: str = "", missing: Optional[list] = None) -> Any:
    if hasattr(tpl, "__dataclass_fields__"):  # flax.struct dataclass
        kwargs = {}
        for f in tpl.__dataclass_fields__:
            if f == "tx":
                continue
            sub = _get_child(val, f)
            kwargs[f] = _align(getattr(tpl, f), sub, f"{path}/{f}", missing)
        return tpl.replace(**kwargs)
    if isinstance(tpl, dict):
        return {
            k: _align(v, _get_child(val, k), f"{path}/{k}", missing)
            for k, v in tpl.items()
        }
    if isinstance(tpl, tuple) and hasattr(tpl, "_fields"):  # NamedTuple
        vals = [
            _align(getattr(tpl, f), _get_child(val, f, i), f"{path}/{f}", missing)
            for i, f in enumerate(tpl._fields)
        ]
        return type(tpl)(*vals)
    if isinstance(tpl, (tuple, list)):
        vals = [
            _align(t, _get_child(val, None, i), f"{path}/{i}", missing)
            for i, t in enumerate(tpl)
        ]
        return type(tpl)(vals) if isinstance(tpl, list) else tuple(vals)
    if val is None:
        if missing is not None and tpl is not None:
            missing.append(path or "/")
        return tpl
    return val


def _get_child(val: Any, name, index: int | None = None):
    if isinstance(val, dict):
        candidates = []
        if name is not None:
            candidates += [name, str(name)]
        if index is not None:
            candidates += [str(index), index]
        for key in candidates:
            if key in val:
                return val[key]
        return None
    if isinstance(val, (tuple, list)):
        if index is not None and index < len(val):
            return val[index]
        return None
    return val


def _as_dict(state):
    if hasattr(state, "__dataclass_fields__"):
        return {
            f: _as_dict(getattr(state, f))
            for f in state.__dataclass_fields__
            if f != "tx"
        }
    return state


def _from_dict(template, d):
    if hasattr(template, "__dataclass_fields__"):
        kwargs = {}
        for f in template.__dataclass_fields__:
            if f == "tx":
                continue
            kwargs[f] = _from_dict(getattr(template, f), d[f])
        return template.replace(**kwargs)
    return d


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif hasattr(tree, "__dataclass_fields__"):
        out.update(_flatten(_as_dict(tree), prefix))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    import flax.traverse_util as tu

    return tu.unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
