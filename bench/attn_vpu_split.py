"""Split the bf16 flash kernel's per-layer cost into matmul vs VPU parts.

Slope-fit three variants at serving shapes (B=32, T=2048, H=16, D=64):
  full      — the shipped kernel (bias + online softmax)
  nobias    — _tile_bias patched to return zeros (isolates the ALiBi
              bias's per-element VPU cost)
  d128      — D=128 full kernel (2x matmul FLOPs; at the lane-padding
              structural floor D=64 and D=128 should cost the same MXU
              time, so the delta bounds how much of "full" is matmul)

Interprets: full - nobias = bias VPU; softmax VPU ~= nobias - matmul
(with matmul bounded by the d128 comparison).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, H = 32, 2048, 16


from bench.timing import chain_slope  # noqa: E402


def slope(name, make_chain, args, iter_counts=(2, 8)):
    return chain_slope(name, make_chain, args, iter_counts, unit='layer')
def run(d, patch_bias):
    import animal2vec_tpu.ops.pallas_attention as pa

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, d)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H, d)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H, d)).astype(np.float32)).astype(jnp.bfloat16)
    from animal2vec_tpu.ops import alibi_slopes

    slopes = jnp.asarray(alibi_slopes(H))
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    orig = pa._tile_bias
    if patch_bias:
        def zero_bias(slope_v, pos_q_ref, pos_k_ref, has_sentinel):
            bq = pos_q_ref.shape[-1]
            bk = pos_k_ref.shape[-1]
            z = jnp.zeros((bq, bk), jnp.float32)
            return z, z
        pa._tile_bias = zero_bias
    try:
        def make(it):
            # k/v/slopes/pos are runtime operands — closing over them bakes
            # 128 MB of constants into the module, which the remote-compile
            # transport rejects (HTTP 413)
            def g_impl(qq, kk, vv, ss, pp):
                def body(c, _):
                    o, _lse = pa._pallas_forward(
                        c, kk, vv, ss, pp, None,
                        has_sentinel=False, save_lse=False,
                    )
                    return o.astype(c.dtype), None

                return jax.lax.scan(body, qq, None, length=it)[0].astype(
                    jnp.float32
                ).mean()

            return g_impl

        name = f"d{d}" + ("_nobias" if patch_bias else "")
        return slope(name, make, (q, k, v, slopes, pos))
    finally:
        pa._tile_bias = orig


def main():
    full = run(64, False)
    nobias = run(64, True)
    d128 = run(128, False)
    print(
        f"bias VPU ~= {(full - nobias) * 1e3:.2f} ms/layer; "
        f"d128 vs d64 delta {(d128 - full) * 1e3:.2f} ms (0 => both at the "
        f"lane-padding matmul floor)"
    )


if __name__ == "__main__":
    main()
