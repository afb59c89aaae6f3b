"""Dev tool: where does the finetune/pretrain train step spend its time?

Variants (env PARTS, comma-separated):
  ft_full    — finetune train step as benched (remat per config)
  ft_noremat — same with model.remat=false
  ft_fwd     — loss forward only (no grad)
  pt_full    — pretrain train step as benched
  pt_noremat — pretrain with model.remat=false
Scan-chain harness: state is the carry; scalar loss fetched.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_step(name, step_fn, state, batch, rng, iters=6, clips=None):
    def body(c, i):
        s, _ = c
        s2, m = step_fn(s, batch, jax.random.fold_in(rng, i))
        return (s2, m["loss"].astype(jnp.float32)), None

    g = jax.jit(
        lambda s: jax.lax.scan(body, (s, jnp.float32(0.0)), jnp.arange(iters))[0][1]
    )
    t0 = time.perf_counter()
    l0 = float(np.asarray(g(state)))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    l1 = float(np.asarray(g(state)))
    l2 = float(np.asarray(g(state)))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(l1) and np.isfinite(l2), (name, l1, l2)
    extra = f"  {clips / dt:7.2f} clips/s" if clips else ""
    print(f"{name:34s} {dt * 1e3:9.2f} ms/step{extra}  (compile {t_compile:.0f}s)", flush=True)
    return dt


def finetune_pieces(remat: bool, fwd_only: bool = False):
    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.train.build import init_finetune
    from animal2vec_tpu.train.finetune_step import make_finetune_train_step

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(here, "animal2vec_tpu/configs/finetune_100.yaml"),
        overrides=[
            "finetune.w2v_path=", "common.compute_dtype=bfloat16",
            "optimization.update_freq=1", f"model.remat={str(remat).lower()}",
            "model.remat_scope=" + os.environ.get("REMAT", "mlp"),
        ],
    )
    batch = int(os.environ.get("B", "6"))
    wav_len = 80_000
    model, state = init_finetune(
        cfg, jax.random.PRNGKey(0), example_wav_len=wav_len, example_batch=1
    )
    from animal2vec_tpu.ops.conv_arith import label_frame_length

    t_feat = label_frame_length(wav_len, cfg.task.conv_layers())
    n_cls = len(cfg.task.labels())
    rng_np = np.random.default_rng(0)
    data = {
        "source": jnp.asarray(rng_np.normal(size=(1, batch, wav_len)).astype(np.float32)),
        "target": jnp.asarray((rng_np.random((1, batch, t_feat, n_cls)) < 0.1).astype(np.int64)),
    }
    step = make_finetune_train_step(model, cfg)
    return step, state, data, batch


def pretrain_pieces(remat: bool):
    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.train.build import init_pretrain
    from animal2vec_tpu.train.pretrain import make_pretrain_train_step

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(here, "animal2vec_tpu/configs/a2v_large_pretrain.yaml"),
        overrides=[
            "common.compute_dtype=bfloat16", "optimization.update_freq=1",
            f"model.remat={str(remat).lower()}",
        ],
    )
    batch = int(os.environ.get("PB", "4"))
    wav_len = 80_000
    model, state = init_pretrain(
        cfg, jax.random.PRNGKey(0), example_wav_len=wav_len, example_batch=1
    )
    rng_np = np.random.default_rng(0)
    data = {
        "source": jnp.asarray(rng_np.normal(size=(1, batch, wav_len)).astype(np.float32)),
    }
    step = make_pretrain_train_step(model, cfg)
    return step, state, data, batch


def timed_fwd(name, loss_fn, params, batch, rng, iters=6, clips=None):
    def body(c, i):
        l, _ = loss_fn(params, jax.tree_util.tree_map(lambda x: x[0], batch),
                       jax.random.fold_in(rng, i))
        return c + l.astype(jnp.float32), None

    g = jax.jit(lambda p: jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))[0])
    t0 = time.perf_counter()
    float(np.asarray(g(params)))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    l1 = float(np.asarray(g(params)))
    l2 = float(np.asarray(g(params)))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(l1) and np.isfinite(l2), (name, l1, l2)
    extra = f"  {clips / dt:7.2f} clips/s" if clips else ""
    print(f"{name:34s} {dt * 1e3:9.2f} ms/step{extra}  (compile {t_compile:.0f}s)", flush=True)
    return dt


def main():
    parts = set(os.environ.get("PARTS", "ft_full,ft_noremat").split(","))
    rng = jax.random.PRNGKey(7)
    if "ft_full" in parts:
        step, state, data, b = finetune_pieces(remat=True)
        timed_step("finetune step (remat)", step, state, data, rng, clips=b)
    if "ft_noremat" in parts:
        step, state, data, b = finetune_pieces(remat=False)
        timed_step("finetune step (no remat)", step, state, data, rng, clips=b)
    if "ft_fwd" in parts:
        from animal2vec_tpu.train.finetune_step import finetune_loss

        step, state, data, b = finetune_pieces(remat=True)
        model_cfg = None
        import animal2vec_tpu.train.finetune_step as fs

        # loss fwd only (train=True path, no grad)
        def loss_fn(params, mb, r, _model=step, _state=state):
            raise SystemExit  # replaced below

        # rebuild with the raw pieces for a clean closure
        from animal2vec_tpu.config import load_config
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = load_config(
            os.path.join(here, "animal2vec_tpu/configs/finetune_100.yaml"),
            overrides=["finetune.w2v_path=", "common.compute_dtype=bfloat16",
                       "optimization.update_freq=1"],
        )
        from animal2vec_tpu.train.build import build_finetune_model
        model = build_finetune_model(cfg)
        timed_fwd(
            "finetune loss fwd only",
            lambda p, mb, r: fs.finetune_loss(p, mb, r, state.step, model, cfg, True),
            state.params, data, rng, clips=b,
        )
    if "pt_full" in parts:
        step, state, data, b = pretrain_pieces(remat=True)
        timed_step("pretrain step (remat)", step, state, data, rng, clips=b)
    if "pt_noremat" in parts:
        step, state, data, b = pretrain_pieces(remat=False)
        timed_step("pretrain step (no remat)", step, state, data, rng, clips=b)


if __name__ == "__main__":
    main()
