"""Ring (sequence-parallel) flash attention vs single-device full attention
on the virtual 8-device CPU mesh (ops/ring_attention.py). The reference has
no cross-chunk context at all — long files are cut into independent windows
(nn/utils.py:1444-1475) — so the correctness bar here is our own exact
single-device attention over the full sequence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from animal2vec_tpu.ops import alibi_slopes
from animal2vec_tpu.ops.pallas_attention import _reference_attention
from animal2vec_tpu.ops.ring_attention import (
    _merge_partials,
    ring_attention_sharded,
)


def make_qkv(b, t, h, d, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
        for _ in range(3)
    )


def seq_mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.asarray(devs[:n]), ("seq",))


class TestMergePartials:
    def test_two_halves_equal_full_softmax(self):
        # splitting a softmax-weighted sum over keys and merging via lse must
        # reproduce the full-key result exactly
        rng = np.random.default_rng(0)
        b, t, h, d, tk = 1, 4, 2, 3, 10
        scores = rng.normal(size=(b, h, t, tk)).astype(np.float64)
        vals = rng.normal(size=(b, tk, h, d)).astype(np.float64)

        def softmax_block(s, vv):
            m = s.max(-1, keepdims=True)
            p = np.exp(s - m)
            out = np.einsum("bhqk,bkhd->bqhd", p / p.sum(-1, keepdims=True), vv)
            return out, (m[..., 0] + np.log(p.sum(-1)))

        full, _ = softmax_block(scores, vals)
        o1, l1 = softmax_block(scores[..., :6], vals[:, :6])
        o2, l2 = softmax_block(scores[..., 6:], vals[:, 6:])
        merged, _ = _merge_partials(
            jnp.asarray(o1), jnp.asarray(l1), jnp.asarray(o2), jnp.asarray(l2)
        )
        np.testing.assert_allclose(np.asarray(merged), full, rtol=1e-6, atol=1e-7)


class TestRingVsFull:
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_matches_full_attention(self, n_dev):
        mesh = seq_mesh(n_dev)
        b, h, d = 1, 4, 8
        t = 128 * n_dev  # each shard is one 128-lane tile
        q, k, v = make_qkv(b, t, h, d)
        slopes = jnp.asarray(alibi_slopes(h), jnp.float32) * 0.6
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

        want = _reference_attention(q, k, v, slopes, pos, None)
        got = ring_attention_sharded(q, k, v, slopes, pos, None, mesh, "seq")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
        )

    def test_with_padding(self):
        mesh = seq_mesh(2)
        b, h, d, t = 1, 2, 8, 256
        q, k, v = make_qkv(b, t, h, d, seed=3)
        slopes = jnp.asarray(alibi_slopes(h), jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        padding = jnp.arange(t)[None, :] >= 200  # last 56 keys padded

        want = _reference_attention(q, k, v, slopes, pos, padding)
        got = ring_attention_sharded(q, k, v, slopes, pos, padding, mesh, "seq")
        np.testing.assert_allclose(
            np.asarray(got)[:, :200], np.asarray(want)[:, :200], rtol=2e-3, atol=2e-3
        )
