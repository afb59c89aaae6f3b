"""Train states: parameters + optimizer state + EMA teacher as one pytree.

The EMA teacher is *state*, not a module copy: a filtered fp32 subtree of the
student parameters updated as ``t = d*t + (1-d)*s`` each step, with decay
annealed per nn/data2vec2.py:386-410 / nn/modalities/base.py:492-497. This is
the functional equivalent of fairseq's EMAModule (nn/data2vec2.py:345-360)
with ema_fp32=True.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.struct
import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import optax

from animal2vec_tpu.config import ModelConfig
from animal2vec_tpu.models.data2vec2 import ema_param_label
from animal2vec_tpu.ops.stats import get_annealed_rate


def ema_subset(params: Any, ema_encoder_only: bool) -> Any:
    """Extract the teacher subtree (see models.data2vec2.ema_param_label)."""
    flat = tu.flatten_dict(params)
    # copy=True: the teacher must not alias the student buffers (aliased
    # leaves break XLA donation and would silently tie the trees)
    sub = {
        p: jnp.array(v, jnp.float32, copy=True)
        for p, v in flat.items()
        if ema_param_label(tuple(str(x) for x in p), ema_encoder_only)
    }
    return tu.unflatten_dict(sub)


def merge_params(params: Any, overlay: Any) -> Any:
    """Overlay the EMA subtree onto the full student tree (the teacher's
    missing frontend comes from the student, which is exactly the
    ema_local_encoder=False semantics of nn/data2vec2.py:779-818 where the
    teacher consumes the *student's* local features)."""
    flat = dict(tu.flatten_dict(params))
    for p, v in tu.flatten_dict(overlay).items():
        flat[p] = v
    return tu.unflatten_dict(flat)


def ema_step(ema: Any, params: Any, decay: jnp.ndarray) -> Any:
    flat_p = tu.flatten_dict(params)
    flat_e = tu.flatten_dict(ema)
    out = {
        p: decay * e + (1.0 - decay) * jnp.asarray(flat_p[p], jnp.float32)
        for p, e in flat_e.items()
    }
    return tu.unflatten_dict(out)


def ema_decay_at(cfg: ModelConfig, step) -> jnp.ndarray:
    if cfg.ema_decay == cfg.ema_end_decay:
        return jnp.asarray(cfg.ema_decay, jnp.float32)
    return get_annealed_rate(
        cfg.ema_decay, cfg.ema_end_decay, step, cfg.ema_anneal_end_step
    ).astype(jnp.float32)


class PretrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation, model_cfg: ModelConfig):
        return cls(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=ema_subset(params, model_cfg.ema_encoder_only),
            tx=tx,
        )

    def apply_gradients(self, grads: Any, model_cfg: ModelConfig) -> "PretrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_step = self.step + 1
        decay = ema_decay_at(model_cfg, new_step)
        new_ema = jax.lax.cond(
            decay < 1.0,
            lambda args: ema_step(*args),
            lambda args: args[0],
            (self.ema_params, ema_subset(new_params, model_cfg.ema_encoder_only), decay),
        )
        return self.replace(
            step=new_step, params=new_params, opt_state=new_opt, ema_params=new_ema
        )


class FinetuneState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation):
        return cls(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads: Any) -> "FinetuneState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt)
