"""Dev tool: per-component inference timing on the real TPU.

Times the flagship finetuned model end-to-end and each stage in isolation
(conv frontend, transformer stack, attention kernel, MLP matmuls) so
optimization effort goes where the cycles are. Uses the same
scan-with-data-dependency trick as bench.py so the remote runtime cannot
memoize identical pure calls.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, x, iters=10, clips=None, flops=None):
    # scalar probe of the final scan carry: full compute is needed (mean over
    # every element) but only 4 bytes cross the remote relay; fresh inputs per
    # timed call because the remote runtime memoizes identical pure calls.
    f = jax.jit(
        lambda a0: jax.lax.scan(lambda c, _: (fn(c), None), a0, None, length=iters)[0]
        .astype(jnp.float32)
        .mean()
    )
    seeds = [x, x + jnp.asarray(1e-3, x.dtype), x + jnp.asarray(2e-3, x.dtype)]
    np.asarray(f(seeds[0]))  # compile+warmup
    t0 = time.perf_counter()
    p1 = np.asarray(f(seeds[1]))
    p2 = np.asarray(f(seeds[2]))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(p1) and np.isfinite(p2)
    extra = ""
    if clips:
        extra += f"  {clips / dt:9.1f} clips/s"
    if flops:
        extra += f"  {flops / dt / 1e12:6.1f} TFLOP/s"
    print(f"{name:28s} {dt * 1e3:8.2f} ms/iter{extra}", flush=True)
    return dt


def main():
    batch, wav_len = int(os.environ.get("B", "32")), 80_000
    parts = set(os.environ.get("PARTS", "frontend,encode,attn,matmul").split(","))

    def dep(s, out):
        return s + (out.astype(jnp.float32).mean() * 0.0).astype(s.dtype)

    needs_model = parts & {"full", "frontend", "encode"}
    if needs_model:
        from animal2vec_tpu.config import load_config
        from animal2vec_tpu.train.build import build_finetune_model

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = load_config(
            os.path.join(here, "animal2vec_tpu/configs/finetune_100.yaml"),
            overrides=["finetune.w2v_path=", "common.compute_dtype=bfloat16"],
        )
        model = build_finetune_model(cfg)
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng}, jnp.zeros((1, wav_len)))
        src = jnp.asarray(
            np.random.default_rng(0).normal(size=(batch, wav_len)).astype(np.float32)
        )

        if "full" in parts:
            def full(s):
                return dep(s, model.apply(params, s)["encoder_out"])

            timed("full model", full, src, clips=batch)

        from animal2vec_tpu.models.data2vec2 import Data2VecMulti

        enc_vars = {"params": params["params"]["encoder"]}
        enc = Data2VecMulti(cfg=model.encoder_cfg, dtype=jnp.bfloat16)

        if "frontend" in parts:
            def frontend(s):
                out = enc.apply(enc_vars, s, method=Data2VecMulti.local_features)
                return dep(s, out)

            timed("conv frontend (local_feat)", frontend, src, clips=batch)

        feat = (
            jnp.asarray(
                np.random.default_rng(1).normal(size=(batch, 2000, 1024)).astype(np.float32)
            ).astype(jnp.bfloat16)
        )

        if "encode" in parts:
            def stack(x):
                out, taps, _, _ = enc.apply(enc_vars, x, method=Data2VecMulti.encode)
                k = 16
                avg = taps[-k:].astype(jnp.float32).mean(axis=0)
                return dep(x, avg)

            timed("prenet+trunk+taps (encode)", stack, feat, clips=batch)

    if "frontend_detail" in parts:
        # per-layer conv frontend decomposition with standalone modules
        import flax.linen as nn_
        from animal2vec_tpu.models.frontend import SincConv
        from animal2vec_tpu.models.modules import Fp32LayerNorm, conv1d_same
        from animal2vec_tpu.ops.conv_arith import same_pad_1d, strided_pad_1d

        rng_np = np.random.default_rng(5)
        wav = jnp.asarray(rng_np.normal(size=(batch, 80_000)).astype(np.float32))
        sinc = SincConv(out_channels=127, kernel_size=63, sample_rate=8000, dtype=jnp.bfloat16)
        sparams = sinc.init(jax.random.PRNGKey(0), wav[:1])

        def sinc_fn(s):
            return dep(s, sinc.apply(sparams, s))

        timed("sinc conv (127,63)", sinc_fn, wav, clips=batch)

        shapes = [(127, 512, 10, 5, 16000), (512, 512, 3, 2, 8000),
                  (512, 512, 3, 2, 4000), (512, 512, 3, 2, 2000),
                  (512, 512, 3, 1, 2000), (512, 512, 2, 1, 2000),
                  (512, 512, 2, 1, 2000)]
        t_in = 80_000
        for i, (cin, cout, k, s_, t_out) in enumerate(shapes):
            xin = jnp.asarray(
                rng_np.normal(size=(batch, t_in, cin)).astype(np.float32)
            ).astype(jnp.bfloat16)
            kern = jnp.asarray(
                rng_np.normal(size=(k, cin, cout)).astype(np.float32) * 0.05
            ).astype(jnp.bfloat16)
            fl = 2 * batch * t_out * cin * cout * k

            def conv_fn(x, kern=kern, k=k, s_=s_):
                pad = same_pad_1d(k) if s_ == 1 else strided_pad_1d(s_)
                y = conv1d_same(x, kern, None, stride=s_, pad=pad)
                y = jax.nn.gelu(y, approximate=False)
                return dep(x, y)

            timed(f"conv{i+1} {cin}->{cout} k{k} s{s_}", conv_fn, xin, flops=fl)
            t_in = t_out

        # fp32 layernorm cost at the widest activation
        xin = jnp.asarray(
            rng_np.normal(size=(batch, 16000, 512)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ln = Fp32LayerNorm()
        lp = ln.init(jax.random.PRNGKey(0), xin[:1])

        def ln_fn(x):
            return dep(x, ln.apply(lp, x))

        timed("fp32 LN (B,16000,512)", ln_fn, xin, clips=batch)

    # attention kernel microbench: 24 layers' worth of flash attention
    from animal2vec_tpu.ops.pallas_attention import alibi_flash_attention_packed
    from animal2vec_tpu.ops.alibi import alibi_slopes

    h, t, d = 16, 2048, 64
    qkv = (
        jnp.asarray(
            np.random.default_rng(2).normal(size=(3, batch, h, t, d)).astype(np.float32)
        ).astype(jnp.bfloat16)
    )
    slopes = jnp.asarray(alibi_slopes(h), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (batch, t))
    attn_flops = 4 * batch * h * t * t * d  # qk + pv

    if "attn" in parts:
        def attn(q3):
            out = alibi_flash_attention_packed(q3, slopes, pos, None, False)
            return q3 + (out.astype(jnp.float32).mean() * 0.0).astype(q3.dtype)

        timed("flash attn (1 layer)", attn, qkv, clips=None, flops=attn_flops)

    # MLP matmul microbench: (B*T, 1024) @ (1024, 4096)
    xm = (
        jnp.asarray(
            np.random.default_rng(3).normal(size=(batch * 2000, 1024)).astype(np.float32)
        ).astype(jnp.bfloat16)
    )
    wm = (
        jnp.asarray(
            np.random.default_rng(4).normal(size=(1024, 4096)).astype(np.float32)
        ).astype(jnp.bfloat16)
    )
    mm_flops = 2 * xm.shape[0] * 1024 * 4096

    if "matmul" in parts:
        def mlp(x):
            return dep(x, x @ wm)

        timed("matmul 64k x 1024 x 4096", mlp, xm, flops=mm_flops)

    print("done")


if __name__ == "__main__":
    main()
