"""int8 EMA-teacher target-corruption probe (VERDICT r4 item 5).

The EMA teacher is pure inference inside the pretrain step
(/root/reference/nn/data2vec2.py:779-844); serving-grade int8 there
trades target fidelity for step time. This probe quantifies the trade at
a2v-large dims on the real chip: run the SAME merged teacher params over
the SAME batch through the fp32/bf16 teacher and the int8 teacher
(model.teacher_matmul_impl=int8), and report

  * rel-RMS of the finished regression targets y (post top-k average +
    instance norm),
  * target_var both ways (the collapse-guard statistic),
  * d2v loss both ways at identical rng (same mask, same student).

Usage: python -m bench.teacher_int8   (PB=2 batch override)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from animal2vec_tpu.config import load_config, resolve
    from animal2vec_tpu.train.build import init_pretrain
    from animal2vec_tpu.train.pretrain import pretrain_loss
    from animal2vec_tpu.train.state import merge_params
    from animal2vec_tpu.models.data2vec2 import Data2VecMulti, finish_targets

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(here, "animal2vec_tpu/configs/a2v_large_pretrain_v5e.yaml"),
        overrides=["common.compute_dtype=bfloat16", "optimization.update_freq=1"],
    )
    batch = int(os.environ.get("PB", "2"))
    model, state = init_pretrain(
        cfg, jax.random.PRNGKey(0), example_wav_len=80_000, example_batch=1
    )
    rng_np = np.random.default_rng(0)
    src = jnp.asarray(rng_np.normal(size=(batch, 80_000)).astype(np.float32))

    cfg8 = resolve(dc.replace(cfg, model=dc.replace(
        cfg.model, teacher_matmul_impl="int8")))
    # derive from model.cfg, not cfg.model: keeps builder-applied deltas
    # (e.g. pipeline_stages), matching what train/pretrain.py builds
    model8 = Data2VecMulti(
        cfg=dc.replace(model.cfg, matmul_impl="int8"), dtype=model.dtype
    )

    teacher_vars = {"params": merge_params(state.params, state.ema_params)}

    def targets(m, tv, local):
        _, t_acc, _, _ = m.apply(
            tv, local, "AUDIO", None, False, None, None, True, True, True,
            method=Data2VecMulti.encode,
        )
        return finish_targets(t_acc / cfg.model.average_top_k_layers, cfg.model)

    local = jax.jit(
        lambda v, s: model.apply(v, s, "AUDIO", True, method=Data2VecMulti.local_features)
    )({"params": state.params}, src)

    y32 = np.asarray(jax.jit(lambda tv, l: targets(model, tv, l))(teacher_vars, local), np.float32)
    y8 = np.asarray(jax.jit(lambda tv, l: targets(model8, tv, l))(teacher_vars, local), np.float32)
    rel = np.sqrt(((y8 - y32) ** 2).mean()) / np.sqrt((y32 ** 2).mean())
    print(
        f"targets: rel-RMS int8 vs fp32 teacher = {rel:.4f}  "
        f"target_var fp32={y32.var(-1).mean():.4f} int8={y8.var(-1).mean():.4f}",
        flush=True,
    )

    # d2v loss at identical rng (same masks/mixup/student)
    for name, c in (("fp32", cfg), ("int8", cfg8)):
        loss, m = jax.jit(
            lambda p, e, c=c: pretrain_loss(
                p, e, {"source": src}, jax.random.PRNGKey(3), model, c
            )
        )(state.params, state.ema_params)
        print(
            f"d2v loss [{name} teacher]: {float(loss):.6f}  "
            f"target_var={float(m['target_var']):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
