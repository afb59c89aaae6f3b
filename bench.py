"""Benchmark: a2v-large finetuned inference throughput (10-s clips/sec/chip).

Target (BASELINE.json): >= 2,000 clips/sec on a v5e-8 == 250 clips/sec/chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

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
    cfg = load_config(
        os.path.join(here, "animal2vec_tpu/configs/finetune_100.yaml"),
        overrides=["finetune.w2v_path=", "common.compute_dtype=bfloat16"],
    )
    model = build_finetune_model(cfg)

    batch = int(os.environ.get("A2V_BENCH_BATCH", "32"))
    wav_len = 80_000  # 10 s @ 8 kHz
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, wav_len)))
    params = jax.device_put(params)

    @jax.jit
    def forward(params, source):
        return model.apply(params, source)["encoder_out"]

    src = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, wav_len)).astype(np.float32)
    )

    # warmup + compile
    forward(params, src).block_until_ready()
    forward(params, src).block_until_ready()

    iters = int(os.environ.get("A2V_BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, src)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "a2v-large finetuned inference throughput",
                "value": round(clips_per_sec, 2),
                "unit": "10s-clips/sec/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
