"""Direct kernel-level slope probe: bf16 inline-ALiBi flash vs the int8
QK^T/PV kernel at a2v-large serving shapes (B=32, T=2048, H=16, D=64).

Answers whether int8 in-kernel actually beats the bf16 kernel's 14.1
ms/layer (the D=64 structural-floor-doubling theory) or whether int8 MXU
tiling at D=64 wastes the advantage. Also times the pre-kernel
quantization + layout cost separately (quant_only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, H, D = 32, 2048, 16, 64


from bench.timing import chain_slope  # noqa: E402


def slope(name, make_chain, args, iter_counts=(2, 8)):
    return chain_slope(name, make_chain, args, iter_counts, unit='iter')
def main():
    from animal2vec_tpu.ops.pallas_attention import (
        alibi_flash_attention, alibi_flash_attention_int8,
    )
    from animal2vec_tpu.ops import alibi_slopes

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    slopes = jnp.asarray(alibi_slopes(H))
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    def mk_bf16(it):
        def f(q, k, v):
            def body(c, _):
                o = alibi_flash_attention(c, k, v, slopes, pos, None, True, False, 0.0, None)
                return c + o * jnp.bfloat16(1e-3), None
            return jax.lax.scan(body, q, None, length=it)[0].astype(jnp.float32).mean()
        return f

    def mk_int8(it):
        def f(q, k, v):
            def body(c, _):
                o = alibi_flash_attention_int8(c, k, v, slopes, pos, None, True)
                return c + o * jnp.bfloat16(1e-3), None
            return jax.lax.scan(body, q, None, length=it)[0].astype(jnp.float32).mean()
        return f

    def mk_quant_only(it):
        def f(q, k, v):
            def body(c, _):
                x32 = jnp.swapaxes(c, 1, 2).astype(jnp.float32)
                s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1) / 127.0, 1e-12)
                x8 = jnp.round(x32 / s[..., None]).astype(jnp.int8)
                probe = x8.astype(jnp.bfloat16).mean() * jnp.bfloat16(1e-6)
                return c + probe, None
            return jax.lax.scan(body, q, None, length=it)[0].astype(jnp.float32).mean()
        return f

    slope("bf16 flash (packed-free qkv)", mk_bf16, (q, k, v))
    slope("int8 flash", mk_int8, (q, k, v))
    slope("quant+swap one tensor", mk_quant_only, (q, k, v))


if __name__ == "__main__":
    main()
