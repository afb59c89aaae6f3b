"""Logit-quality delta of the int8 serving modes vs bf16, full a2v-large.

Same init params, same inputs, three applies: bf16, int8 (MLP-only after the
round-3 placement study), int8_attn (uniform int8 + int8 flash). Reports
max-abs and relative-RMS deltas of the frame logits vs the bf16 forward —
the number that decides whether int8 can be a parity-respecting serving
default (BASELINE ≤1e-3 max abs) or stays an opt-in fast path.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(matmul_impl):
    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.train.build import build_finetune_model

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    overrides = ["finetune.w2v_path=", "common.compute_dtype=bfloat16"]
    if matmul_impl:
        overrides.append(f"model.matmul_impl={matmul_impl}")
    cfg = load_config(
        os.path.join(here, "animal2vec_tpu/configs/finetune_100.yaml"),
        overrides=overrides,
    )
    return build_finetune_model(cfg)


def main():
    batch = int(os.environ.get("B", "4"))
    wav_len = 80_000
    bf16 = build(None)
    params = bf16.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, wav_len)))

    def cast(path, x):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if any(n in ("conv_0", "alibi_scale") for n in names):
            return x
        if x.dtype == jnp.float32 and x.ndim >= 2:
            return x.astype(jnp.bfloat16)
        return x

    params = jax.device_put(jax.tree_util.tree_map_with_path(cast, params))
    src = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, wav_len)).astype(np.float32)
    )

    ref = None
    for impl in (None, "int8", "int8_attn"):
        model = bf16 if impl is None else build(impl)
        out = np.asarray(
            jax.jit(lambda p, s: model.apply(p, s)["encoder_out"])(params, src),
            dtype=np.float32,
        )
        if ref is None:
            ref = out
            print(f"bf16       logit range [{out.min():+.3f}, {out.max():+.3f}]")
            continue
        d = out - ref
        rel = np.sqrt((d ** 2).mean()) / np.sqrt((ref ** 2).mean())
        print(
            f"{impl:10s} max abs delta {np.abs(d).max():.4f}  "
            f"rel RMS {rel * 100:.2f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
