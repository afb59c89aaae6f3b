"""Single-AltBlock serving probe: slope-time one full transformer block at
a2v-large serving shapes (32x2048x1024, deterministic, flash attention) in
bf16 vs int8 trunk modes, to localize the e2e int8 gap that per-kernel
probes (bench_int8_probe3.py) cannot see.

MODES env: comma list of bf16,int8 (default both).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, C, HEADS = 32, 2048, 1024, 16


from bench.timing import fns_slope  # noqa: E402


def slope(name, g, args, iter_counts=(2, 8)):
    return fns_slope(name, g, args, iter_counts, unit='layer', label_width=24)
def main():
    from animal2vec_tpu.models.modules import AltBlock, BlockConfig
    from animal2vec_tpu.models.attention import AlibiSpec
    from animal2vec_tpu.ops import alibi_slopes

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32)).astype(jnp.bfloat16)
    slopes = jnp.asarray(alibi_slopes(HEADS))
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    for impl in os.environ.get("MODES", "bf16,int8").split(","):
        cfg = BlockConfig(
            dim=C, num_heads=HEADS, mlp_ratio=4.0, layer_norm_first=False,
            matmul_impl=impl, attn_impl="auto",
        )
        block = AltBlock(cfg=cfg, dtype=jnp.bfloat16)
        spec = AlibiSpec(slopes, pos)
        params = block.init(
            {"params": jax.random.PRNGKey(0)}, x, None, spec, 0.0, True
        )
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.ndim >= 2 else a, params
        )

        def mk(it):
            def f(params, x):
                def body(c, _):
                    y, _tap = block.apply(params, c, None, spec, 0.0, True)
                    return y * jnp.bfloat16(0.999), None
                return jax.lax.scan(body, x, None, length=it)[0].astype(jnp.float32).mean()
            return jax.jit(f)

        slope(f"AltBlock {impl}", [mk(2), mk(8)], (params, x))


if __name__ == "__main__":
    main()
