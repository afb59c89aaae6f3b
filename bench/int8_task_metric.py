"""Task-metric (F1/mAP) delta of int8-MLP serving vs bf16 on a TRAINED model.

VERDICT r3 item 7: the int8 serving mode's logit delta (0.018 max-abs) is
far outside the 1e-3 parity budget, and bench/int8_error_split.py shows no
weight-side mitigation can close it (per-row activation quant alone is a
~1.3% rel-RMS wall). The remaining question: does that logit noise move the
metric the reference selects models by (frame F1, finetune_mixup_100.yaml:16)?

Protocol: overfit a small-but-real finetune model (lane-aligned dims so the
int8 kernels engage) on synthetic labeled clips until the train-set logits
are peaked, then evaluate the SAME params through the bf16 and int8-MLP
forwards and compare F1/mAP at the recipe threshold. Overfitting random
targets is deliberate: it produces the confident-logit regime where serving
runs, and generalization is irrelevant to a numerics comparison.

Run (CPU, ~5 min): JAX_PLATFORMS=cpu python -m bench.int8_task_metric
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json


def main():
    os.environ.setdefault("A2V_PALLAS_SERVE", "1")  # int8 kernels off-TPU
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animal2vec_tpu.config import (
        Config, CriterionConfig, FinetuneModelConfig, MixupConfig,
        OptimizationConfig, TaskConfig, resolve,
    )
    from animal2vec_tpu.train.build import build_finetune_model, init_finetune
    from animal2vec_tpu.train.finetune_step import make_finetune_train_step

    cfg = Config()
    cfg.task = TaskConfig(
        unique_labels="['a', 'b', 'c', 'focal']",
        conv_feature_layers="[(9, 7, 1)] + [(32, 4, 2)] + [(32, 3, 2)]",
        sample_rate=8000,
        with_labels=True,
    )
    cfg.model.depth = 4
    cfg.model.embed_dim = 256  # lane-aligned: int8/fused kernels engage
    cfg.model.num_heads = 4
    cfg.model.average_top_k_layers = 4
    cfg.model.supported_modality = "AUDIO"
    audio = cfg.model.modalities.audio
    audio.prenet_depth = 1
    audio.conv_pos_depth = 2
    audio.conv_pos_width = 10
    audio.conv_pos_groups = 2
    cfg.finetune = FinetuneModelConfig(
        freeze_finetune_updates=0, apply_mask=False,
        average_top_k_layers=4, mixup=MixupConfig(source_mixup=-1.0),
    )
    cfg.criterion = CriterionConfig(use_focal_loss=True)
    cfg.optimization = OptimizationConfig(
        lr=3e-4, max_update=1000, warmup_updates=20, update_freq=1,
        adam_eps=1e-6,
    )
    cfg = resolve(cfg)

    b, t = 8, 800
    t_feat, n_cls = 200, 4
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1, b, t)).astype(np.float32)
    tgt = (rng.random((1, b, t_feat, n_cls)) < 0.15).astype(np.float32)
    batch = {"source": jnp.asarray(src), "target": jnp.asarray(tgt)}

    model, state = init_finetune(cfg, jax.random.PRNGKey(0), example_wav_len=t)
    step = jax.jit(make_finetune_train_step(model, cfg))
    steps = int(os.environ.get("STEPS", "300"))
    for i in range(steps):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if i % 50 == 0:
            print(f"step {i}: loss {float(m['loss']):.5f}", flush=True)
    print(f"final loss {float(m['loss']):.5f}")

    def metrics(logits, thr):
        p = 1.0 / (1.0 + np.exp(-logits.reshape(-1, n_cls)))
        y = tgt.reshape(-1, n_cls)
        pred = p >= thr
        tp = float(np.sum(pred * y)); fp = float(np.sum(pred * (1 - y)))
        fn = float(np.sum((~pred) * y))
        prec = tp / max(tp + fp, 1e-9); rec = tp / max(tp + fn, 1e-9)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        # mAP (area under PR, per class, averaged)
        aps = []
        for c in range(n_cls):
            order = np.argsort(-p[:, c])
            yc = y[order, c]
            cum_tp = np.cumsum(yc)
            precs = cum_tp / (np.arange(len(yc)) + 1)
            aps.append(float(np.sum(precs * yc) / max(yc.sum(), 1)))
        return f1, float(np.mean(aps))

    out = {}
    for impl in ("bf16", "int8"):
        cfg_i = resolve(cfg)
        cfg_i.model.matmul_impl = impl if impl != "bf16" else "bf16"
        cfg_i = resolve(cfg_i)
        m_i = build_finetune_model(cfg_i)
        logits = np.asarray(
            jax.jit(
                lambda p, s: m_i.apply({"params": p}, s)["encoder_out"]
            )(state.params, jnp.asarray(src[0]))
        , dtype=np.float32)
        f1, ap = metrics(logits, thr=0.175)
        out[impl] = {"f1": round(f1, 6), "map": round(ap, 6)}
        print(impl, out[impl], flush=True)
        if impl == "bf16":
            ref_logits = logits
        else:
            d = np.abs(logits - ref_logits)
            out["logit_delta"] = {
                "max_abs": round(float(d.max()), 6),
                "rel_rms": round(
                    float(np.sqrt((d**2).mean()) / np.sqrt((ref_logits**2).mean())), 6
                ),
            }
    out["f1_delta"] = round(out["int8"]["f1"] - out["bf16"]["f1"], 6)
    out["map_delta"] = round(out["int8"]["map"] - out["bf16"]["map"], 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
