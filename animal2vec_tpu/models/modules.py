"""Transformer building blocks (flax.linen, feature-last layout).

Covers the reference's nn/modalities/modules.py: AltBlock/AltAttention
(:272-410), BlockEncoder (:74-108), Decoder1d/2d (:137-243), EncDec blocks
(:413-603). Differences from the reference are deliberate TPU choices:

* activations are (B, T, C) throughout (no NCHW/transpose dance),
* the N-layer student/teacher stacks are a single ``lax.scan`` over stacked
  per-layer params (one compiled block body instead of N unrolled blocks),
* softmax runs in fp32 regardless of the compute dtype (parity with
  modules.py:404), LayerNorm statistics in fp32,
* attention dispatches to a Pallas TPU flash kernel for long sequences
  (models/attention.py) and to plain XLA einsum attention otherwise.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from animal2vec_tpu.models.attention import multihead_attention

logger = logging.getLogger(__name__)
_pipeline_fallback_warned = set()


def _warn_pipeline_fallback(reason: str) -> None:
    """One-time warning when pipeline_stages > 1 is configured but the
    pipelined path declines at apply time — without it a config typo (e.g.
    a mesh whose 'stage' axis mismatches pipeline_parallel) silently runs
    the plain scan with stage-sharded params, wasting those devices."""
    if reason not in _pipeline_fallback_warned:
        _pipeline_fallback_warned.add(reason)
        logger.warning(
            "BlockStack: pipeline_stages > 1 but falling back to the plain "
            "layer scan: %s", reason,
        )


default_kernel_init = nn.initializers.xavier_uniform()


def pallas_serving_ok(*dims: int) -> bool:
    """Gate for the Pallas serving kernels (int8 dense / fused MLP):
    lane-aligned shapes on a real TPU backend. ``A2V_PALLAS_SERVE=0/1``
    forces off/on (tests force on to exercise interpret mode)."""
    import os

    force = os.environ.get("A2V_PALLAS_SERVE")
    if force == "0":
        return False
    if any(d % 128 for d in dims):
        return False
    if force == "1":
        return True
    return jax.default_backend() == "tpu"


def quantized_matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 matmul on the MXU (~2x the bf16 rate on v5e).

    Weights: per-output-channel symmetric scales; activations: per-token
    dynamic scales. Both quantizations are cheap VPU elementwise passes, and
    the weight half is loop-invariant — XLA hoists it out of scan/step loops
    so steady-state serving pays only the activation quant. Serving-only
    numeric (config: model.matmul_impl=int8); training stays bf16/fp32.

    Lane-aligned shapes on TPU route through the fused Pallas kernel
    (ops/int8_mm.int8_dense): slope-measured 301 vs 233 TFLOP/s for the
    XLA-composed chain at trunk shapes (bench/int8_sweep.py, 2026-08-19 —
    the round-2 "XLA ties Pallas at 167" was the relay-overhead artifact,
    docs/PERF.md round-3 correction).

    x: (..., K); kernel: (K, N) fp32/bf16. Returns (..., N) in x.dtype.
    """
    w32 = kernel.astype(jnp.float32)
    if pallas_serving_ok(kernel.shape[0], kernel.shape[1]):
        from animal2vec_tpu.ops.int8_mm import int8_dense, quantize_weight

        w_q, w_s = quantize_weight(w32)
        return int8_dense(x, w_q, w_s, block_n=256, block_m=2048)
    w_scale = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0  # (1, N)
    w_q = jnp.round(w32 / jnp.maximum(w_scale, 1e-12)).astype(jnp.int8)
    x32 = x.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0  # (..., 1)
    x_q = jnp.round(x32 / jnp.maximum(x_scale, 1e-12)).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * x_scale * w_scale).astype(x.dtype)


class Fp32LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, cast back to input dtype
    (fairseq Fp32LayerNorm semantics, consumed at nn/modalities/audio.py:86)."""

    epsilon: float = 1e-5
    use_affine: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = x32.var(axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
            y = y * scale + bias
        return y.astype(dtype)


def fp32_instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm over the time axis of (B, T, C), fp32 stats, no affine
    (torch F.instance_norm on BCT as used in nn/data2vec2.py:1041-1044)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=1, keepdims=True)
    var = x32.var(axis=1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def drop_path(
    rng: jax.Array, x: jnp.ndarray, rate, deterministic: bool
) -> jnp.ndarray:
    """Stochastic depth on the residual branch (timm DropPath semantics,
    consumed at nn/modalities/modules.py:309). ``rate`` may be a traced
    scalar (per-layer rate inside lax.scan); output dtype always matches x."""
    if deterministic or (isinstance(rate, float) and rate == 0.0):
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    inv_keep = jnp.asarray(1.0, x.dtype) / jnp.maximum(keep, 1e-6).astype(x.dtype)
    return jnp.where(mask, x * inv_keep, jnp.zeros_like(x))


class Int8Dense(nn.Module):
    """Dense layer routed through quantized_matmul; parameter tree identical
    to nn.Dense ("kernel"/"bias") so the same checkpoint serves both
    numerics."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", default_kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        y = quantized_matmul(x, kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class _NormParams(nn.Module):
    """Parameter-only stand-in for Fp32LayerNorm (same scale/bias tree);
    returns (None, None) when the norm has no affine params."""

    use_affine: bool = True

    @nn.compact
    def __call__(self, c: int):
        if not self.use_affine:
            return None, None
        s = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return s, b


class _DenseParams(nn.Module):
    """Parameter-only stand-in for nn.Dense: declares the identical
    kernel/bias tree (so checkpoints/converters are oblivious) and returns
    the raw leaves for kernels that consume both layers fused."""

    features: int

    @nn.compact
    def __call__(self, c_in: int):
        k = self.param("kernel", default_kernel_init, (c_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class _MlpParams(nn.Module):
    """Parameter-only stand-in for the whole Mlp module (fc1 + fc2 trees),
    for the fused block kernel that consumes the MLP *and* its surrounding
    norms in one pallas_call (ops/fused_mlp.fused_block_mlp)."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, c_in: int):
        k1, b1 = _DenseParams(self.hidden_dim, name="fc1")(c_in)
        k2, b2 = _DenseParams(self.out_dim, name="fc2")(self.hidden_dim)
        return k1, b1, k2, b2


class Mlp(nn.Module):
    """2-layer GELU MLP (timm Mlp, consumed at modules.py:312-317).

    Serving (deterministic, no activation dropout, lane-aligned dims on
    TPU) routes through the fused Pallas kernel (ops/fused_mlp.py), which
    keeps the (T, 4*dim) GELU intermediate in VMEM: slope-measured
    8.75 -> 6.97 ms (bf16) / 5.41 ms (int8) per a2v-large MLP pair
    (bench/fused_mlp.py 2026-08-19). GELU runs exact-erf in fp32 (A&S
    7.1.26, max abs err 1.5e-7) — inside the 1e-3 parity budget."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # deterministic makes both Dropouts identity, so the fused kernel is
        # exact regardless of self.dropout (the finetune configs carry
        # activation_dropout=0.1 — gating on it kept the kernel off in serving).
        # Training engages it too when self.dropout == 0.0 (the pretrain
        # recipe): flax Dropout at rate 0 is identity and consumes no rng, and
        # the bf16 kernel's custom_vjp recomputes through the XLA reference.
        # int8 stays serving-only (the int8 kernel has no vjp).
        fused = (
            deterministic or (self.dropout == 0.0 and not self.int8)
        ) and pallas_serving_ok(x.shape[-1], self.hidden_dim, self.out_dim)
        if fused:
            from animal2vec_tpu.ops.fused_mlp import fused_mlp

            k1, b1 = _DenseParams(self.hidden_dim, name="fc1")(x.shape[-1])
            k2, b2 = _DenseParams(self.out_dim, name="fc2")(self.hidden_dim)
            if self.int8:
                from animal2vec_tpu.ops.int8_mm import quantize_weight

                w1q, w1s = quantize_weight(k1)
                w2q, w2s = quantize_weight(k2)
                return fused_mlp(
                    x, w1q, w2q, b1, b2, w1s, w2s, block_n=512, block_m=1024
                )
            return fused_mlp(
                x, k1.astype(self.dtype), k2.astype(self.dtype), b1, b2,
                block_n=512, block_m=1024,
            )

        def dense(features, name):
            if self.int8:
                return Int8Dense(features, dtype=self.dtype, name=name)
            return nn.Dense(
                features, dtype=self.dtype, kernel_init=default_kernel_init, name=name
            )

        x = dense(self.hidden_dim, "fc1")(x)
        x = nn.gelu(x, approximate=False)
        # barrier: without it XLA fuses the exact-erf GELU into fc2's operand
        # read and recomputes it per MXU tile pass (profiled 2.4x fc2
        # slowdown on v5e)
        x = jax.lax.optimization_barrier(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = dense(self.out_dim, "fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class QKVProj(nn.Module):
    """Fused qkv projection with layout-aware output: classic (B, T, 3, H, E)
    or direct (3, B, H, T, E) via einsum so the flash kernel's native layout
    needs no transposes. Param tree matches nn.Dense ("kernel"/"bias")."""

    features: int  # 3 * C
    use_bias: bool = True
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x, heads: int, bhtd: bool = False, flat: bool = False):
        c_in = x.shape[-1]
        kernel = self.param("kernel", default_kernel_init, (c_in, self.features), jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        kernel = kernel.astype(self.dtype)
        e = self.features // (3 * heads)
        if flat:
            # fused (B, T, 3C) output — the training flash entry's
            # lane-dense residual layout (ops/pallas_attention.py:_fwd_btc)
            y = quantized_matmul(x, kernel) if self.int8 else x @ kernel
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y
        if bhtd:
            if self.int8:
                # int8 runs the plain (B, T, 3C) matmul, then transposes into
                # the kernel's packed layout (XLA fuses this into the dequant
                # epilogue) — keeps flash attention + int8 composable
                y = quantized_matmul(x, kernel)
                if bias is not None:
                    y = y + bias.astype(self.dtype)
                b, t = x.shape[0], x.shape[1]
                return jnp.transpose(y.reshape(b, t, 3, heads, e), (2, 0, 3, 1, 4))
            w = kernel.reshape(c_in, 3, heads, e)
            y = jnp.einsum("btd,dshe->sbhte", x, w)
            if bias is not None:
                y = y + bias.astype(self.dtype).reshape(3, 1, heads, 1, e)
            return y  # packed (3, B, H, T, E) — consumed whole by the kernel
        y = quantized_matmul(x, kernel) if self.int8 else x @ kernel
        if bias is not None:
            y = y + bias.astype(self.dtype)
        b, t = x.shape[0], x.shape[1]
        y = y.reshape(b, t, 3, heads, e)
        return y[:, :, 0], y[:, :, 1], y[:, :, 2]  # (B, T, H, E) each


class OutProj(nn.Module):
    """Attention output projection accepting either layout (param tree
    matches nn.Dense)."""

    features: int
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, out, bhtd: bool = False):
        if bhtd:
            b, h, t, e = out.shape
            c_in = h * e
        else:
            b, t, c_in = out.shape
        kernel = self.param("kernel", default_kernel_init, (c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        if bhtd and self.int8:
            y = quantized_matmul(
                jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, c_in), kernel
            )
        elif bhtd:
            w = kernel.reshape(h, e, self.features)
            y = jnp.einsum("bhte,hed->btd", out, w)
        elif self.int8:
            y = quantized_matmul(out, kernel)
        else:
            y = out @ kernel
        return y + bias.astype(self.dtype)


class AltAttention(nn.Module):
    """Multi-head self-attention with additive (ALiBi) bias
    (nn/modalities/modules.py:340-410). qkv fused; fp32 softmax. When the
    structured-ALiBi Pallas path applies, projections einsum directly
    into/out of the kernel's (B, H, T, E) layout — no per-layer transpose
    or head-slice copies."""

    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    qkv_bias: bool = True
    dtype: Any = jnp.float32
    impl: str = "auto"  # "xla" | "flash" | "auto"
    int8: bool = False  # serving-only int8 qkv/out projections
    int8_attn: bool = False  # serving-only int8 QK^T/PV flash kernel

    @nn.compact
    def __call__(
        self,
        x,
        padding_mask: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        from animal2vec_tpu.models.attention import pallas_eligible

        b, t, c = x.shape
        h = self.num_heads
        has_dropout = not deterministic and self.attn_drop > 0
        fast = pallas_eligible(bias, t, has_dropout, self.impl)
        qkv = QKVProj(
            3 * c, use_bias=self.qkv_bias, dtype=self.dtype, int8=self.int8,
            name="qkv",
        )
        proj = OutProj(c, dtype=self.dtype, int8=self.int8, name="proj")
        if fast and not deterministic:
            # training: (B, T, 3C) entry — residuals stay lane-dense, so
            # autodiff/remat stashes cost 1x their logical size
            from animal2vec_tpu.models.attention import dropout_seed
            from animal2vec_tpu.ops.pallas_attention import (
                alibi_flash_attention_btc,
            )

            qkv_btc = qkv(x, heads=h, flat=True)  # (B, T, 3C)
            out = alibi_flash_attention_btc(
                qkv_btc, h, bias.slopes, bias.positions, padding_mask,
                bias.has_sentinel,
                self.attn_drop if has_dropout else 0.0,
                dropout_seed(self.make_rng("dropout")) if has_dropout else None,
            )
            out = proj(out, bhtd=False)
        elif fast and self.int8_attn:
            # serving int8 attention: both MXU products int8 — doubles the
            # head_dim-64 structural floor (docs/PERF.md round 3)
            from animal2vec_tpu.ops.pallas_attention import (
                alibi_flash_attention_int8,
            )

            q, k, v = qkv(x, heads=h, bhtd=False)  # (B, T, H, E) each
            out = alibi_flash_attention_int8(
                q, k, v, bias.slopes, bias.positions, padding_mask,
                bias.has_sentinel,
            )
            out = proj(out.reshape(b, t, c), bhtd=False)
        elif fast:
            from animal2vec_tpu.ops.pallas_attention import (
                alibi_flash_attention_packed,
            )

            packed = qkv(x, heads=h, bhtd=True)  # (3, B, H, T, E)
            out = alibi_flash_attention_packed(
                packed, bias.slopes, bias.positions, padding_mask,
                bias.has_sentinel, 0.0, None,
            )
            out = proj(out, bhtd=True)
        else:
            q, k, v = qkv(x, heads=h, bhtd=False)
            dropout_rng = self.make_rng("dropout") if has_dropout else None
            out = multihead_attention(
                q, k, v,
                bias=bias,
                padding_mask=padding_mask,
                dropout_rate=self.attn_drop,
                dropout_rng=dropout_rng,
                impl=self.impl,
            )
            out = proj(out.reshape(b, t, c), bhtd=False)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    encoder_dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    post_mlp_drop: float = 0.0
    norm_eps: float = 1e-5
    norm_affine: bool = True
    layer_norm_first: bool = False
    ffn_targets: bool = True
    attn_impl: str = "auto"
    matmul_impl: str = "bf16"  # "bf16" | "int8" (serving-only weight+act quant)
    # remat granularity when the stack remats: "mlp" recomputes only the MLP
    # sub-block (attention residuals stay; cheaper), "block" recomputes the
    # whole block (smallest memory)
    remat_scope: str = "mlp"


class AltBlock(nn.Module):
    """Pre/post-LN transformer block returning (x, layer_tap)
    (nn/modalities/modules.py:272-337). The tap is the per-layer value the
    teacher averages: the MLP output when ffn_targets else the block output.

    remat_mlp: rematerialize only the MLP sub-block (fc1/GELU/fc2 + dropout
    masks — the dominant activation stash at 4x dim) during the backward,
    while the attention sub-block keeps its custom_vjp residuals (lane-dense
    via the btc flash entry). Cheaper than whole-block remat: the flash
    forward and qkv/out projections are never recomputed.

    remat_attn: additionally rematerialize the attention sub-block (qkv
    projection + flash forward + out projection). Combined with remat_mlp
    (whose fused-block custom_vjp already recomputes the MLP from the block
    inputs) this saves the same activations as whole-block remat to within
    one (B, T, C) stream per layer, but the backward recomputes each
    sub-block exactly ONCE — whole-block remat recomputes the fused MLP
    kernel a second time (remat recompute + the vjp's own internal
    recompute) before its grads run."""

    cfg: BlockConfig
    dtype: Any = jnp.float32
    remat_mlp: bool = False
    remat_attn: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        padding_mask=None,
        bias=None,
        drop_path_rate=0.0,
        deterministic: bool = True,
    ):
        c = self.cfg
        norm = lambda name: Fp32LayerNorm(epsilon=c.norm_eps, use_affine=c.norm_affine, name=name)
        # int8 placement is measured, not uniform (bench/block_probe.py,
        # docs/PERF.md round 3): the fused int8 MLP wins 1.5 ms/layer, but
        # int8 qkv/out projections LOSE ~3.5 ms/layer — the bf16 einsums
        # emit the flash kernel's packed layout from the matmul epilogue for
        # free, while a Pallas int8 producer forces explicit 400 MB/layer
        # transposes. "int8" therefore quantizes the MLP only; "int8_attn"
        # (the measured-and-rejected full-int8 mode) keeps int8 everywhere.
        attn_cls = AltAttention
        if self.remat_attn:
            # deterministic is static arg 4 (self=0); rng streams replay
            # identically in the recompute (flax remat semantics), so the
            # in-kernel attention dropout masks match between passes
            attn_cls = nn.remat(AltAttention, static_argnums=(4,), prevent_cse=False)
        attn = attn_cls(
            num_heads=c.num_heads,
            attn_drop=c.attention_dropout,
            proj_drop=c.encoder_dropout,
            dtype=self.dtype,
            impl=c.attn_impl,
            int8=c.matmul_impl == "int8_attn",
            int8_attn=c.matmul_impl == "int8_attn",
            name="attn",
        )
        def make_mlp():
            # constructed lazily: flax registers the "mlp" scope name at
            # construction, and the fused-block path claims it via _MlpParams
            mlp_cls = Mlp
            if self.remat_mlp:
                mlp_cls = nn.remat(Mlp, static_argnums=(2,), prevent_cse=False)
            return mlp_cls(
                hidden_dim=int(c.dim * c.mlp_ratio),
                out_dim=c.dim,
                dropout=c.activation_dropout,
                dtype=self.dtype,
                int8=c.matmul_impl in ("int8", "int8_attn"),
                name="mlp",
            )

        def dp(y):
            if deterministic:
                return y
            return drop_path(self.make_rng("dropout"), y, drop_path_rate, deterministic)

        post_drop = nn.Dropout(c.post_mlp_drop)

        if c.layer_norm_first:
            x = x + dp(attn(norm("norm1")(x), padding_mask, bias, deterministic))
            r = t = make_mlp()(norm("norm2")(x), deterministic)
            x = r + dp(post_drop(t, deterministic=deterministic))
            if not c.ffn_targets:
                t = x
        else:
            x = x + dp(attn(x, padding_mask, bias, deterministic))
            hidden = int(c.dim * c.mlp_ratio)
            # Serving: the whole post-LN MLP sub-block — LN1, fc1/GELU/fc2,
            # residual add, LN2 — runs as ONE Pallas kernel; r, t and z never
            # round-trip HBM (~0.8 GB/layer at a2v-large serving shapes).
            # deterministic makes every dropout in this branch identity, so
            # the fusion is exact. Param trees are unchanged (_NormParams /
            # _MlpParams mirror Fp32LayerNorm / Mlp).
            #
            # Training engages it too (the bf16 kernel's custom_vjp
            # recomputes through the XLA reference, which doubles as
            # mlp-scope remat — only the block inputs are saved):
            #  * all MLP-branch dropouts statically zero (pretrain recipe) —
            #    the kernel is exact; or
            #  * nonzero activation/post-mlp dropout with no drop-path (the
            #    finetune recipe: activation_dropout 0.1, drop_path 0.0 —
            #    /root/reference/configs/MeerKAT/finetune_mixup_100.yaml) —
            #    the kernel applies hash-counter dropout in VMEM with seeds
            #    drawn from the "dropout" rng (same sites as the XLA path:
            #    after GELU, after fc2, and on the residual branch; different
            #    mask realization, identical statistics).
            # int8 has no vjp and stays serving-only. A2V_FUSED_BLOCK_TRAIN=0
            # confines the kernel to deterministic calls.
            fused_train_ok = (
                isinstance(drop_path_rate, (int, float))
                and float(drop_path_rate) == 0.0
                and c.matmul_impl not in ("int8", "int8_attn")
                and os.environ.get("A2V_FUSED_BLOCK_TRAIN", "1") != "0"
            )
            branch_dropout_free = (
                c.activation_dropout == 0.0
                and c.post_mlp_drop == 0.0
                and fused_train_ok
            )
            fused_train_drop = (
                not deterministic
                and fused_train_ok
                and not branch_dropout_free
                and os.environ.get("A2V_FUSED_BLOCK_DROPOUT", "1") != "0"
            )
            fused_blk = (
                deterministic or branch_dropout_free or fused_train_drop
            ) and pallas_serving_ok(c.dim, hidden)
            if fused_blk:
                from animal2vec_tpu.ops.fused_mlp import fused_block_mlp

                l1s, l1b = _NormParams(use_affine=c.norm_affine, name="norm1")(c.dim)
                l2s, l2b = _NormParams(use_affine=c.norm_affine, name="norm2")(c.dim)
                k1, b1p, k2, b2p = _MlpParams(hidden, c.dim, name="mlp")(c.dim)
                if c.matmul_impl in ("int8", "int8_attn"):
                    from animal2vec_tpu.ops.int8_mm import quantize_weight

                    w1q, w1s = quantize_weight(k1)
                    w2q, w2s = quantize_weight(k2)
                    x, t = fused_block_mlp(
                        x, l1s, l1b, w1q, w2q, b1p, b2p, l2s, l2b,
                        c.norm_eps, w1s, w2s,
                    )
                else:
                    if fused_train_drop:
                        info = jnp.iinfo(jnp.int32)
                        seeds = jax.random.randint(
                            self.make_rng("dropout"), (3,),
                            minval=info.min, maxval=info.max, dtype=jnp.int32,
                        )
                        act_rate = float(c.activation_dropout)
                        post_rate = float(c.post_mlp_drop)
                    else:
                        seeds, act_rate, post_rate = None, 0.0, 0.0
                    x, t = fused_block_mlp(
                        x, l1s, l1b, k1.astype(self.dtype), k2.astype(self.dtype),
                        b1p, b2p, l2s, l2b, c.norm_eps,
                        seeds=seeds, act_rate=act_rate, post_rate=post_rate,
                    )
            else:
                r = norm("norm1")(x)
                t = make_mlp()(r, deterministic)
                # barrier: XLA otherwise fuses norm2's reduction into fc2's
                # epilogue, halving the fc2 matmul throughput (profiled on v5e)
                z = jax.lax.optimization_barrier(
                    r + dp(post_drop(t, deterministic=deterministic))
                )
                x = norm("norm2")(z)
            if not c.ffn_targets:
                t = x
        return x, t


class BlockStack(nn.Module):
    """N AltBlocks as one lax.scan over stacked params.

    Replaces the unrolled Python loops at nn/data2vec2.py:649-671 (student),
    :828-844 (teacher) and nn/modalities/modules.py:89-103 (prenet) with a
    single compiled block body. Returns (x, taps[N, B, T, C]).

    layerdrop (nn/data2vec2.py:650-655): when active, a dropped layer passes
    x through unchanged and its per-layer ``keep`` flag goes to 0. The
    reference drops the tap from ``layer_results`` entirely (shape-dynamic);
    this static variant returns all taps plus the (depth,) keep flags so
    consumers reproduce the exact "last k *kept* layers" average via
    ``top_k_tap_average``. Inference is identical (no drop, keeps=None).
    """

    depth: int
    cfg: BlockConfig
    start_drop_path: float = 0.0
    end_drop_path: float = 0.0
    layerdrop: float = 0.0
    remat: bool = False
    dtype: Any = jnp.float32
    # >1 splits the stack depth-wise over a "stage" mesh axis and runs a
    # GPipe microbatch schedule (parallel/pipeline.py). Takes effect only
    # under an active mesh with a matching "stage" axis; otherwise the
    # plain scan runs (identical numerics).
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0

    @nn.compact
    def __call__(
        self,
        x,
        padding_mask=None,
        bias=None,
        deterministic: bool = True,
        bias_scales: Optional[jnp.ndarray] = None,
        tap_reduce=None,
        tap_weights: Optional[jnp.ndarray] = None,
    ):
        """``tap_reduce`` streams the per-layer taps into a running fp32
        accumulator inside the scan instead of stacking them: carry gains a
        (B, T, C) fp32 sum of ``tap_weights[i] * tap_reduce(tap_i)`` and the
        (depth, B, T, C) taps tensor is never materialized. The EMA teacher
        uses this for its top-k layer-average targets — the stacked fp32
        taps are the second-largest pretrain HBM buffer (0.5 GB for
        a2v-large at batch 4). Returns (x, acc, keeps=None); teacher runs
        deterministic, so layerdrop cannot be active with tap_reduce."""
        import numpy as np

        # static zero when drop-path is off (the shipped configs): skips the
        # bernoulli + select entirely inside the scanned block
        no_dp = self.start_drop_path == 0.0 and self.end_drop_path == 0.0
        dpr = jnp.asarray(
            np.linspace(self.start_drop_path, self.end_drop_path, self.depth),
            dtype=jnp.float32,
        )
        if bias_scales is None:
            scales = jnp.ones((self.depth, 1, 1, 1, 1), dtype=jnp.float32)
        else:
            # (depth, 1, H, 1, 1) learned per-layer alibi scales
            # (nn/modalities/base.py:116-135)
            scales = bias_scales.reshape(self.depth, 1, -1, 1, 1)

        block_cls = AltBlock
        remat_mlp = False
        remat_attn = False
        if self.remat and self.cfg.remat_scope == "block":
            # drop_path_rate is static when drop-path is off (body passes
            # the literal 0.0): jax.checkpoint would otherwise trace it,
            # failing AltBlock's isinstance-float gate so the fused block
            # kernel silently never engaged under block remat
            block_cls = nn.remat(
                AltBlock,
                static_argnums=(4, 5) if no_dp else (5,),
                prevent_cse=False,
            )
        elif self.remat:
            # "mlp": rematerialize only the MLP sub-block;
            # "attn": MLP + attention sub-blocks (block-remat memory, one
            # recompute per sub-block instead of two for the fused MLP)
            remat_mlp = True
            remat_attn = self.cfg.remat_scope == "attn"

        from animal2vec_tpu.models.attention import AlibiSpec

        streaming = tap_reduce is not None
        if streaming:
            assert deterministic or self.layerdrop == 0.0, (
                "tap_reduce streaming cannot express layerdrop's "
                "kept-layers-only average; teacher runs deterministic"
            )
            if tap_weights is None:
                tap_weights = jnp.ones((self.depth,), jnp.float32)

        if self.pipeline_stages > 1 and not self.is_initializing():
            out = self._pipelined(
                x, padding_mask, bias, deterministic, dpr, scales,
                tap_reduce, tap_weights, no_dp,
            )
            if out is not None:
                return out

        def body(block, carry, layer_in):
            if streaming:
                x, acc = carry
                rate, scale, w = layer_in
            else:
                x = carry
                rate, scale = layer_in
            if no_dp:
                rate = 0.0
            if bias is None:
                ab = None
            elif isinstance(bias, AlibiSpec):
                ab = bias.scale_heads(scale.reshape(-1))
            else:
                ab = bias * scale.astype(bias.dtype)
            y, tap = block(x, padding_mask, ab, rate, deterministic)
            if streaming:
                acc = acc + w * tap_reduce(tap.astype(jnp.float32))
                return (y, acc), jnp.ones((), jnp.float32)
            if self.layerdrop > 0 and not deterministic:
                keep = jax.random.bernoulli(
                    block.make_rng("layerdrop"), 1.0 - self.layerdrop, ()
                )
                y = jnp.where(keep, y, x)
                tap = jnp.where(keep, tap, x)
                return y, (tap, keep.astype(jnp.float32))
            return y, (tap, jnp.ones((), jnp.float32))

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "layerdrop": True},
            in_axes=0,
            length=self.depth,
        )
        block = block_cls(
            cfg=self.cfg, dtype=self.dtype, remat_mlp=remat_mlp,
            remat_attn=remat_attn, name="block"
        )
        if streaming:
            acc0 = jnp.zeros(x.shape, jnp.float32)
            (x, acc), _ = scan(block, (x, acc0), (dpr, scales, tap_weights))
            return x, acc, None
        x, (taps, keeps) = scan(block, x, (dpr, scales))
        if not (self.layerdrop > 0 and not deterministic):
            keeps = None  # static: no layer can drop -> fast mean path
        return x, taps, keeps

    def _pipelined(
        self, x, padding_mask, bias, deterministic, dpr, scales,
        tap_reduce, tap_weights, no_dp,
    ):
        """GPipe the stack over the ambient mesh's "stage" axis; None when
        preconditions fail (no mesh / axis mismatch / dense bias / depth not
        divisible) so the caller falls back to the plain scan."""
        from animal2vec_tpu.models.attention import AlibiSpec
        from animal2vec_tpu.parallel.pipeline import active_mesh, pipeline_blocks

        mesh = active_mesh()
        reason = None
        if mesh is None or "stage" not in mesh.axis_names:
            reason = f"no ambient mesh with a 'stage' axis (mesh={mesh})"
        elif mesh.shape["stage"] != self.pipeline_stages:
            reason = (
                f"mesh stage={mesh.shape['stage']} != configured "
                f"pipeline_stages={self.pipeline_stages}"
            )
        elif self.depth % self.pipeline_stages != 0:
            reason = (
                f"depth {self.depth} not divisible by "
                f"{self.pipeline_stages} stages"
            )
        elif not (bias is None or isinstance(bias, AlibiSpec)):
            reason = "dense attention bias (only ALiBi-spec bias pipelines)"
        if reason is not None:
            _warn_pipeline_fallback(reason)
            return None
        stacked = self.get_variable("params", "block")
        if stacked is None:
            return None

        key_impl = [None]  # impl of the caller's rng streams (default: ambient)

        def key_array(name):
            if deterministic or not self.has_rng(name):
                return None
            k = self.make_rng(name)
            if jnp.issubdtype(k.dtype, jax.dtypes.prng_key):
                key_impl[0] = jax.random.key_impl(k)
                k = jax.random.key_data(k)
            keys = jax.vmap(
                lambda i: jax.random.fold_in(
                    jax.random.wrap_key_data(k, impl=key_impl[0]), i
                )
            )(jnp.arange(self.depth))
            return jax.random.key_data(keys)  # (depth, key_words) uint32

        c = self.cfg
        # AltBlock touches the "dropout" stream whenever it runs
        # non-deterministic (drop_path draws unconditionally), so provide
        # keys iff the stream exists; key_array returns None when it doesn't
        dropout_keys = key_array("dropout")
        layerdrop_keys = key_array("layerdrop") if self.layerdrop > 0 else None

        slopes_scaled = None
        positions = None
        has_sentinel = False
        if isinstance(bias, AlibiSpec):
            positions = bias.positions
            if positions.shape[0] == 1 and x.shape[0] > 1:
                # batch-uniform (1, T) layout: the pipeline reshapes
                # positions into (n_micro, mb, T) microbatches, so broadcast
                # to the real batch first
                positions = jnp.broadcast_to(
                    positions, (x.shape[0],) + positions.shape[1:]
                )
            has_sentinel = bias.has_sentinel
            slopes_scaled = (
                bias.slopes.astype(jnp.float32)[None, :]
                * scales.reshape(self.depth, -1)
            )  # (depth, H) via broadcast when scales are all-ones (H dim 1)
            slopes_scaled = jnp.broadcast_to(
                slopes_scaled, (self.depth, bias.slopes.shape[0])
            )

        remat_block = self.remat and c.remat_scope == "block"
        block_module = AltBlock(
            cfg=c, dtype=self.dtype,
            remat_mlp=self.remat and not remat_block,
            remat_attn=self.remat and not remat_block
            and c.remat_scope == "attn",
        )

        def block_apply_mb(p_l, xl, slope_l, pos_c, pm_c, rate, key):
            if no_dp:
                rate = 0.0
            ab = None
            if slope_l is not None:
                ab = AlibiSpec(
                    slopes=slope_l, positions=pos_c, has_sentinel=has_sentinel
                )
            rngs = {"dropout": key} if key is not None else None
            return block_module.apply(
                {"params": p_l}, xl, pm_c, ab, rate, deterministic, rngs=rngs
            )

        return pipeline_blocks(
            block_apply_mb,
            stacked,
            x,
            dpr,
            slopes_scaled,
            positions,
            padding_mask,
            mesh=mesh,
            n_micro=self.pipeline_microbatches,
            dropout_keys=dropout_keys,
            layerdrop_keys=layerdrop_keys,
            key_impl=key_impl[0],
            layerdrop=self.layerdrop if not deterministic else 0.0,
            tap_reduce=tap_reduce,
            tap_weights=tap_weights if tap_reduce is not None else None,
            remat=remat_block,
        )


def top_k_tap_average(taps, keeps, k: int):
    """fp32 mean of the last ``k`` *kept* layer taps.

    The reference appends a layer_result only for layers that survive
    layerdrop (nn/data2vec2.py:649-674), so ``layer_results[-k:]`` indexes
    kept layers. With static shapes we keep all ``depth`` taps and weight by
    ``keeps`` (1=kept): layer i contributes iff it is kept and at most k-1
    kept layers follow it. ``keeps=None`` (inference / layerdrop=0) is the
    fast path: a plain mean over the last k taps.

    taps: (depth, B, T, C); keeps: (depth,) float or None. Returns fp32
    (B, T, C).
    """
    if keeps is None:
        return taps[-k:].astype(jnp.float32).mean(axis=0)
    in_last_k = jnp.flip(jnp.cumsum(jnp.flip(keeps))) <= k
    w = keeps * in_last_k.astype(keeps.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    return jnp.tensordot(w, taps.astype(jnp.float32), axes=1) / denom


class PrenetEncoder(nn.Module):
    """BlockEncoder: optional pre/post norm + dropout + block stack
    (nn/modalities/modules.py:74-108). Taps are discarded."""

    depth: int
    cfg: BlockConfig
    prenet_dropout: float = 0.0
    layerdrop: float = 0.0
    start_drop_path: float = 0.0
    end_drop_path: float = 0.0
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        padding_mask=None,
        bias=None,
        deterministic: bool = True,
        bias_scales: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        if not c.layer_norm_first:
            x = Fp32LayerNorm(epsilon=c.norm_eps, use_affine=c.norm_affine, name="norm")(x)
        x = nn.Dropout(self.prenet_dropout)(x, deterministic=deterministic)
        x, _, _ = BlockStack(
            depth=self.depth,
            cfg=c,
            start_drop_path=self.start_drop_path,
            end_drop_path=self.end_drop_path,
            layerdrop=self.layerdrop,
            remat=self.remat,
            dtype=self.dtype,
            name="blocks",
        )(x, padding_mask, bias, deterministic, bias_scales=bias_scales)
        if c.layer_norm_first:
            x = Fp32LayerNorm(epsilon=c.norm_eps, use_affine=c.norm_affine, name="norm")(x)
        return x


def conv1d_same(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    groups: int = 1,
    pad: Optional[Tuple[int, int]] = None,
    lane_pack: bool = True,
    lane_pack_max: int = 2,
) -> jnp.ndarray:
    """Grouped 1-D conv on (B, T, C) with explicit padding.

    kernel: (K, C_in/groups, C_out). pad defaults to torch 'same' for
    stride 1 and ceil(stride/2) otherwise (ops/conv_arith.py).

    lane_pack: when the per-group channel width is 64 (half a TPU lane
    tile), fuse group pairs into 128-wide super-groups via a block-diagonal
    kernel — exact same result, but the activations XLA stores around the
    conv (and saves as autodiff residuals) lose their 2x lane padding
    (docs/PERF.md round-2 follow-ups). The parameter shape is unchanged.
    """
    from animal2vec_tpu.ops.conv_arith import (
        expand_grouped_kernel,
        lane_pack_factor,
        same_pad_1d,
        strided_pad_1d,
    )

    k = kernel.shape[0]
    if pad is None:
        pad = same_pad_1d(k) if stride == 1 else strided_pad_1d(stride)
    if lane_pack and groups > 1:
        p = lane_pack_factor(groups, kernel.shape[1], max_pack=lane_pack_max)
        if p > 1:
            kernel = expand_grouped_kernel(kernel, groups, p)
            groups = groups // p
    from animal2vec_tpu.ops.grouped_conv import _needs_safe_dw, grouped_conv1d

    if groups > 1 and _needs_safe_dw():
        # custom dW: XLA GSPMD over-reduces grouped-conv weight grads on
        # multi-axis meshes (ops/grouped_conv.py)
        out = grouped_conv1d(x, kernel, stride, pad, groups)
    else:
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride,),
            padding=[pad],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=groups,
        )
    if bias is not None:
        out = out + bias
    return out


class Conv1dBlockNorm(nn.Module):
    """conv -> LayerNorm(no affine, fp32) -> GELU, with optional residual —
    one Decoder1d block (nn/modalities/modules.py:141-157)."""

    out_dim: int
    kernel: int
    groups: int
    dtype: Any = jnp.float32
    # decoder groups are 48-wide (768/16): lane-exact packing needs 8x the
    # conv FLOPs (~+1.3 ms/layer on v5e) but stores activations/residuals
    # unpadded instead of 2.7x-padded — a net win under training HBM pressure
    lane_pack_max: int = 2

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kern = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.kernel, in_dim // self.groups, self.out_dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
        # torch Conv1d(padding=k//2) followed by SamePad(k) (trim last when k
        # even) == explicit (k//2, k//2 - (k even)) padding.
        k = self.kernel
        pad = (k // 2, k // 2 - (1 if k % 2 == 0 else 0))
        y = conv1d_same(
            x, kern.astype(self.dtype), bias.astype(self.dtype), 1, self.groups,
            pad=pad, lane_pack_max=self.lane_pack_max,
        )
        y = Fp32LayerNorm(use_affine=False, name="norm")(y)
        return nn.gelu(y, approximate=False)


class Decoder1d(nn.Module):
    """Grouped-conv decoder with residuals + linear projection
    (nn/modalities/modules.py:137-192)."""

    decoder_dim: int
    decoder_kernel: int
    decoder_groups: int
    decoder_layers: int
    out_dim: int
    decoder_residual: bool = True
    projection_layers: int = 1
    projection_ratio: float = 2.0
    lane_pack_max: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        for i in range(self.decoder_layers):
            y = Conv1dBlockNorm(
                out_dim=self.decoder_dim,
                kernel=self.decoder_kernel,
                groups=self.decoder_groups,
                dtype=self.dtype,
                lane_pack_max=self.lane_pack_max,
                name=f"blocks_{i}",
            )(x)
            if self.decoder_residual and residual.shape[-1] == y.shape[-1]:
                y = y + residual
            residual = y
            x = y
        # projection head (modules.py:166-177)
        curr = self.decoder_dim
        layer_idx = 0
        for i in range(self.projection_layers - 1):
            nxt = int(curr * self.projection_ratio) if i == 0 else curr
            x = nn.Dense(nxt, dtype=self.dtype, name=f"proj_{layer_idx}")(x)
            x = nn.gelu(x, approximate=False)
            curr = nxt
            layer_idx += 1
        x = nn.Dense(self.out_dim, dtype=self.dtype, name=f"proj_{layer_idx}" if layer_idx else "proj")(x)
        return x


class Conv2dBlockNorm(nn.Module):
    """2-D analogue of Conv1dBlockNorm (nn/modalities/modules.py:202-218)."""

    out_dim: int
    kernel: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        in_dim = x.shape[-1]
        kern = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.kernel, self.kernel, in_dim // self.groups, self.out_dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
        k = self.kernel
        pad = (k // 2, k // 2 - (1 if k % 2 == 0 else 0))
        from animal2vec_tpu.ops.grouped_conv import _needs_safe_dw, grouped_conv2d

        if self.groups > 1 and _needs_safe_dw():
            y = grouped_conv2d(x, kern.astype(self.dtype), pad, self.groups) + bias
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kern.astype(self.dtype),
                window_strides=(1, 1),
                padding=[pad, pad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            ) + bias
        y = Fp32LayerNorm(use_affine=False, name="norm")(y)
        return nn.gelu(y, approximate=False)


class Decoder2d(nn.Module):
    """2-D conv decoder for the image modality
    (nn/modalities/modules.py:195-243)."""

    decoder_dim: int
    decoder_kernel: int
    decoder_groups: int
    decoder_layers: int
    out_dim: int
    h_size: int
    w_size: int
    decoder_residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C), T = h*w
        b, t, c = x.shape
        x = x.reshape(b, self.h_size, self.w_size, c)
        residual = x
        for i in range(self.decoder_layers):
            y = Conv2dBlockNorm(
                out_dim=self.decoder_dim,
                kernel=self.decoder_kernel,
                groups=self.decoder_groups,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
            if self.decoder_residual and residual.shape[-1] == y.shape[-1]:
                y = y + residual
            residual = y
            x = y
        x = x.reshape(b, t, -1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)


class EncDecBlock(nn.Module):
    """Cross-attention decoder block (nn/modalities/modules.py:493-557)."""

    num_heads: int
    mlp_ratio: float = 4.0
    first_residual: bool = True
    layer_norm_first: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, kv, deterministic: bool = True):
        b, n, c = q.shape
        h = self.num_heads
        q_in = q
        r = q_in if self.first_residual else 0.0

        def cross_attn(qx, name_prefix=""):
            qq = nn.Dense(c, use_bias=True, dtype=self.dtype, name="q_proj")(qx)
            kkvv = nn.Dense(2 * c, use_bias=True, dtype=self.dtype, name="kv_proj")(kv)
            kk, vv = jnp.split(kkvv, 2, axis=-1)
            qq = qq.reshape(b, n, h, c // h)
            kk = kk.reshape(b, -1, h, c // h)
            vv = vv.reshape(b, -1, h, c // h)
            return multihead_attention(qq, kk, vv, impl="xla").reshape(b, n, c)

        norm1 = Fp32LayerNorm(name="norm1")
        norm2 = Fp32LayerNorm(name="norm2")
        mlp = Mlp(hidden_dim=int(c * self.mlp_ratio), out_dim=c, dtype=self.dtype, name="mlp")
        proj = nn.Dense(c, dtype=self.dtype, name="proj")

        if self.layer_norm_first:
            x = r + proj(cross_attn(norm1(q_in)))
            rr = x = mlp(norm2(x), deterministic)
            x = rr + x
        else:
            x = r + proj(cross_attn(q_in))
            rr = x = norm1(x)
            x = mlp(x, deterministic)
            x = norm2(rr + x)
        return x


class EncDecTransformerDecoder(nn.Module):
    """Cross-attention transformer decoder
    (nn/modalities/modules.py:560-603)."""

    decoder_dim: int
    decoder_layers: int
    out_dim: int
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kv, deterministic: bool = True):
        x = nn.Dense(self.decoder_dim, dtype=self.dtype, name="input_proj")(x)
        for i in range(self.decoder_layers):
            x = EncDecBlock(
                num_heads=self.num_heads,
                first_residual=i > 0,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, kv, deterministic)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)
