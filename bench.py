"""Benchmark: all three a2v-large workloads (10-s clips/sec/chip).

The default run emits FOUR JSON lines: the headline finetuned-inference
line FIRST (so it exists even if the caller timeboxes the run), then
pretrain train-step, then finetune train-step, then a byte-identical
REPEAT of the inference line LAST (drivers that parse the final JSON line
get the BASELINE metric; collectors that sum lines should dedupe
byte-equal lines). Each workload runs in its own subprocess
(A2V_BENCH_MODE=pretrain|finetune|infer) so a train-bench failure or HBM
fragmentation cannot take down the inference number; a failed mode prints
a JSON line with an "error" field instead.

Target (BASELINE.json): >= 2,000 clips/sec on a v5e-8 == 250 clips/sec/chip
aggregate inference. Note: at bf16 that target exceeds the chip's peak
FLOPs for this model (~1.7 TFLOP/clip x 250 clips/s/chip > v5e's ~197
TFLOP/s), so vs_baseline < 1 is expected — see BASELINE.md appendix.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PER_CHIP = 250.0  # 2000 clips/s on 8 chips


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.train.build import build_finetune_model

    here = os.path.dirname(os.path.abspath(__file__))
    overrides = ["finetune.w2v_path=", "common.compute_dtype=bfloat16"]
    if os.environ.get("A2V_BENCH_INT8", "") == "1":
        # serving int8 trunk matmuls (config flag; see models/modules.py
        # quantized_matmul for the numeric contract + accuracy tests)
        overrides.append("model.matmul_impl=int8")
    elif os.environ.get("A2V_BENCH_INT8", "") == "2":
        # int8 matmuls + int8 QK^T/PV flash attention
        overrides.append("model.matmul_impl=int8_attn")
    cfg = load_config(
        os.path.join(here, "animal2vec_tpu/configs/finetune_100.yaml"),
        overrides=overrides,
    )
    model = build_finetune_model(cfg)

    # shard the batch over every visible chip: on a v5e-8 host this measures
    # the aggregate BASELINE unit (2000 clips/s) out of the box and reports
    # it per chip; single-chip runs are unchanged
    n_dev = jax.device_count()
    batch_per_chip = int(os.environ.get("A2V_BENCH_BATCH", "32"))
    batch = batch_per_chip * n_dev
    wav_len = 80_000  # 10 s @ 8 kHz
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, wav_len)))
    if os.environ.get("A2V_BENCH_CAST", "bf16") == "bf16":
        # serving-style pre-cast (default): store matmul weights in bf16 so
        # the per-step fp32->bf16 casts disappear. Sinc frequency params
        # (conv_0) and alibi scales are consumed in fp32 and stay fp32;
        # 1-D norm/bias params are untouched by the ndim filter.
        def cast(path, x):
            names = [p.key if hasattr(p, "key") else str(p) for p in path]
            if any(n in ("conv_0", "alibi_scale") for n in names):
                return x
            if x.dtype == jnp.float32 and x.ndim >= 2:
                return x.astype(jnp.bfloat16)
            return x

        params = jax.tree_util.tree_map_with_path(cast, params)
    mesh = None
    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("data",))
        params = jax.device_put(params, NamedSharding(mesh, P()))
    else:
        params = jax.device_put(params)

    # enough scan iterations to amortize the remote-dispatch overhead
    iters = int(os.environ.get("A2V_BENCH_ITERS", "40"))

    # One jitted scan of `iters` forwards with a sequential data dependency:
    # prevents the runtime from eliding/deduplicating identical pure calls
    # and measures steady-state throughput in a single device program.
    @jax.jit
    def bench_fn(params, source):
        def body(s, _):
            out = model.apply(params, s)["encoder_out"]
            s = s + (out.mean() * 0.0).astype(s.dtype)
            return s, out[0, 0, 0]
        _, probe = jax.lax.scan(body, source, None, length=iters)
        return probe

    rng_np = np.random.default_rng(0)
    srcs = [
        jnp.asarray(rng_np.normal(size=(batch, wav_len)).astype(np.float32))
        for _ in range(3)
    ]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        srcs = [jax.device_put(s, NamedSharding(mesh, P("data"))) for s in srcs]
    else:
        srcs = [jax.device_put(s) for s in srcs]

    # warmup/compile on srcs[0]; time on fresh inputs (the remote runtime
    # memoizes identical pure calls, so repeated-same-input timing is bogus),
    # and materialize results on the host (block_until_ready alone does not
    # force execution through the remote relay)
    np.asarray(bench_fn(params, srcs[0]))
    t0 = time.perf_counter()
    p1 = np.asarray(bench_fn(params, srcs[1]))
    p2 = np.asarray(bench_fn(params, srcs[2]))
    dt = time.perf_counter() - t0
    assert np.isfinite(p1).all() and np.isfinite(p2).all()

    clips_per_sec = batch * iters * 2 / dt / n_dev  # per chip
    print(
        json.dumps(
            {
                "metric": "a2v-large finetuned inference throughput",
                "value": round(clips_per_sec, 2),
                "unit": "10s-clips/sec/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_PER_CHIP, 3),
                "devices": n_dev,
                "aggregate_clips_per_sec": round(clips_per_sec * n_dev, 2),
            }
        )
    )


def main_pretrain():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.train.build import build_pretrain_model, init_pretrain
    from animal2vec_tpu.train.pretrain import make_pretrain_train_step

    here = os.path.dirname(os.path.abspath(__file__))
    overrides = [
        "common.compute_dtype=bfloat16",
        "optimization.update_freq=1",
    ]
    # A2V_BENCH_REMAT=block selects full-block rematerialization — the
    # recipe that fits a2v-large pretraining on a 16 GB v5e at batch >= 4
    # (docs/PERF.md "training throughput")
    if os.environ.get("A2V_BENCH_REMAT"):
        overrides.append(f"model.remat_scope={os.environ['A2V_BENCH_REMAT']}")
    if os.environ.get("A2V_BENCH_REMAT_FRONTEND"):
        overrides.append("model.remat_frontend=true")
    if os.environ.get("A2V_BENCH_REMAT_DECODER"):
        overrides.append("model.remat_decoder=true")
    if os.environ.get("A2V_BENCH_TEACHER_INT8"):
        # quantize the EMA-teacher forward (accept/reject study, PERF.md r5)
        overrides.append("model.teacher_matmul_impl=int8")
    if os.environ.get("A2V_BENCH_DECODER_PACK"):
        overrides.append(
            "model.modalities.audio.decoder.lane_pack_max="
            f"{os.environ['A2V_BENCH_DECODER_PACK']}"
        )
    # the v5e-tuned recipe (batch 8 + block-scope remat) IS the shipped
    # config for this chip — benching the generic yaml at batch 4 understates
    # the real recipe by ~26% (docs/PERF.md training-SoL section)
    cfg = load_config(
        os.path.join(here, "animal2vec_tpu/configs/a2v_large_pretrain_v5e.yaml"),
        overrides=overrides,
    )
    batch = int(os.environ.get("A2V_BENCH_BATCH", "8"))
    wav_len = 80_000
    model, state = init_pretrain(
        cfg, jax.random.PRNGKey(0), example_wav_len=wav_len, example_batch=1
    )
    step_fn = make_pretrain_train_step(model, cfg)
    # pre-staged device batches + one scanned program (same shape as the
    # serving bench): keeps the per-step 2.5 MB host->device upload and the
    # per-step relay sync OFF the timed path — production's input pipeline
    # prefetches, so tunnel bandwidth is not part of step throughput
    iters = int(os.environ.get("A2V_BENCH_ITERS", "6"))
    rng_np = np.random.default_rng(0)
    data = jax.device_put(jnp.asarray(
        rng_np.normal(size=(iters, 1, batch, wav_len)).astype(np.float32)
    ))
    data2 = jax.device_put(jnp.asarray(
        rng_np.normal(size=(iters, 1, batch, wav_len)).astype(np.float32)
    ))
    keys = jax.random.split(jax.random.PRNGKey(1), iters)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, data, keys):
        def body(st, xs):
            src, k = xs
            st, m = step_fn(st, {"source": src}, k)
            return st, m["loss"]
        return jax.lax.scan(body, state, (data, keys))

    state, losses = run(state, data, keys)  # warm + compile
    assert np.isfinite(np.asarray(losses)).all()
    t0 = time.perf_counter()
    state, losses = run(state, data2, keys)
    assert np.isfinite(np.asarray(losses)).all()
    dt = time.perf_counter() - t0
    clips_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "a2v-large pretrain train-step throughput",
                "value": round(clips_per_sec, 2),
                "unit": "10s-clips/sec/chip",
                "vs_baseline": round(clips_per_sec / 25.0, 3),
                # reference: 1020 s audio/update on 4 GPUs => ~25 clips/s/gpu
                # assuming ~1 update/s (not published; coarse anchor)
            }
        )
    )


def main_finetune():
    """Finetune train-step throughput: full T=2048 sequences, masking-as-
    regularization, attention_dropout=0.2 (the reference finetune recipe) —
    the path that exercises the Pallas flash backward kernels."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.train.build import init_finetune
    from animal2vec_tpu.train.finetune_step import make_finetune_train_step

    here = os.path.dirname(os.path.abspath(__file__))
    overrides = [
        "finetune.w2v_path=",
        "common.compute_dtype=bfloat16",
        "optimization.update_freq=1",
    ]
    if os.environ.get("A2V_BENCH_REMAT"):
        overrides.append(f"model.remat_scope={os.environ['A2V_BENCH_REMAT']}")
    cfg = load_config(
        os.path.join(here, "animal2vec_tpu/configs/finetune_100.yaml"),
        overrides=overrides,
    )
    batch = int(os.environ.get("A2V_BENCH_BATCH", "4"))
    wav_len = 80_000
    model, state = init_finetune(
        cfg, jax.random.PRNGKey(0), example_wav_len=wav_len, example_batch=1
    )
    step_fn = make_finetune_train_step(model, cfg)
    rng_np = np.random.default_rng(0)
    from animal2vec_tpu.ops.conv_arith import label_frame_length

    t_feat = label_frame_length(wav_len, cfg.task.conv_layers())
    n_cls = len(cfg.task.labels())
    # pre-staged device batches + one scanned program (see main_pretrain)
    iters = int(os.environ.get("A2V_BENCH_ITERS", "6"))

    def stage():
        return jax.device_put({
            "source": jnp.asarray(
                rng_np.normal(size=(iters, 1, batch, wav_len)).astype(np.float32)
            ),
            "target": jnp.asarray(
                (rng_np.random((iters, 1, batch, t_feat, n_cls)) < 0.1).astype(
                    np.float32
                )
            ),
        })

    data, data2 = stage(), stage()
    keys = jax.random.split(jax.random.PRNGKey(1), iters)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, data, keys):
        def body(st, xs):
            b, k = xs
            st, m = step_fn(st, b, k)
            return st, m["loss"]
        return jax.lax.scan(body, state, (data, keys))

    state, losses = run(state, data, keys)  # warm + compile
    assert np.isfinite(np.asarray(losses)).all()
    t0 = time.perf_counter()
    state, losses = run(state, data2, keys)
    assert np.isfinite(np.asarray(losses)).all()
    dt = time.perf_counter() - t0
    clips_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "a2v-large finetune train-step throughput",
                "value": round(clips_per_sec, 2),
                "unit": "10s-clips/sec/chip",
                # reference: 1920 s audio/update on 4 GPUs (finetune_mixup_100
                # max_tokens*4*update_freq 9) => ~48 clips/s/gpu at 1 update/s
                "vs_baseline": round(clips_per_sec / 48.0, 3),
            }
        )
    )


def main_all():
    """Run every workload in its own subprocess. Inference (the BASELINE
    headline) runs FIRST so its number exists even if the caller timeboxes
    this process mid-run, and its line is re-emitted LAST so a
    parse-the-final-JSON-line driver still records the headline metric."""
    import subprocess

    timeout = int(os.environ.get("A2V_BENCH_MODE_TIMEOUT", "2400"))
    infer_line = None
    for mode in ("infer", "pretrain", "finetune"):
        env = dict(os.environ, A2V_BENCH_MODE=mode)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=timeout,
            )
            lines = [
                ln for ln in proc.stdout.splitlines() if ln.startswith("{")
            ]
            if proc.returncode == 0 and lines:
                print(lines[-1], flush=True)
                if mode == "infer":
                    infer_line = lines[-1]
            else:
                tail = (proc.stderr or proc.stdout or "").strip().splitlines()
                print(
                    json.dumps(
                        {
                            "metric": f"a2v-large {mode}",
                            "error": f"rc={proc.returncode}: "
                            + " | ".join(tail[-3:])[:500],
                        }
                    ),
                    flush=True,
                )
        except subprocess.TimeoutExpired:
            print(
                json.dumps(
                    {
                        "metric": f"a2v-large {mode}",
                        "error": f"timeout after {timeout}s",
                    }
                ),
                flush=True,
            )
    if infer_line is None:  # the BASELINE headline metric is non-optional
        sys.exit(1)
    print(infer_line, flush=True)  # headline last for last-line parsers


if __name__ == "__main__":
    mode = os.environ.get("A2V_BENCH_MODE", "all")
    if mode == "pretrain":
        main_pretrain()
    elif mode == "finetune":
        main_finetune()
    elif mode == "infer":
        main()
    else:
        main_all()
