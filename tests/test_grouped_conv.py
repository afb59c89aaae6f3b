"""Partition-correct grouped-conv gradients (ops/grouped_conv.py).

Regression for an XLA GSPMD defect: on a multi-axis mesh, the weight grad
of a feature_group_count>1 convolution with a batch-sharded input is
all-reduced over every mesh axis (dp4 x tp2 => exactly 2x). The fix keeps
the XLA conv forward and re-expresses dW as dot_generals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from animal2vec_tpu.ops.grouped_conv import grouped_conv1d, grouped_conv2d


def _plain_conv1d(x, w, stride, pad, groups):
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [pad],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups,
    )


class TestGroupedConv1d:
    @pytest.mark.parametrize(
        "stride,pad,t", [(1, (2, 2), 64), (2, (1, 1), 63), (3, (0, 0), 61)]
    )
    def test_grads_match_autodiff(self, rng, stride, pad, t):
        x = jnp.asarray(rng.normal(size=(2, t, 16)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(5, 4, 24)).astype(np.float32))

        def loss_ours(w, x):
            return (grouped_conv1d(x, w, stride, pad, 4) ** 2).sum()

        def loss_ref(w, x):
            return (_plain_conv1d(x, w, stride, pad, 4) ** 2).sum()

        np.testing.assert_allclose(
            float(loss_ours(w, x)), float(loss_ref(w, x)), rtol=1e-6
        )
        for arg in (0, 1):
            g_ours = jax.grad(loss_ours, arg)(w, x)
            g_ref = jax.grad(loss_ref, arg)(w, x)
            np.testing.assert_allclose(
                np.asarray(g_ours), np.asarray(g_ref), rtol=1e-4, atol=1e-3
            )

    def test_dw_correct_on_dp_tp_mesh(self, rng):
        """The actual bug: dp4 x tp2 mesh, batch-sharded x, replicated w —
        the plain conv's dW comes back exactly 2x; ours must not."""
        assert len(jax.devices()) == 8
        mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
        x = jnp.asarray(rng.normal(size=(8, 64, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(5, 8, 64)).astype(np.float32))

        def loss_ours(w, x):
            return (grouped_conv1d(x, w, 1, (2, 2), 8) ** 2).sum()

        def loss_plain(w, x):
            return (_plain_conv1d(x, w, 1, (2, 2), 8) ** 2).sum()

        g_ref = jax.grad(loss_ours)(w, x)
        w_sh = jax.device_put(w, NamedSharding(mesh, P()))
        x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
        with mesh:
            g_plain = jax.jit(jax.grad(loss_plain))(w_sh, x_sh)
            g_ours = jax.jit(jax.grad(loss_ours))(w_sh, x_sh)
        plain_ratio = float(jnp.median(g_plain / g_ref))
        if abs(plain_ratio - 1.0) < 0.5:
            pytest.skip(
                "XLA grouped-conv partitioner fixed upstream "
                f"(plain ratio {plain_ratio}); workaround is redundant here"
            )
        np.testing.assert_allclose(
            np.asarray(g_ours), np.asarray(g_ref), rtol=1e-4, atol=1e-3
        )

    def test_model_conv1d_same_uses_safe_path(self, rng):
        """conv1d_same (pos-conv / Decoder1d entry) under the dp x tp mesh,
        including the lane-packed kernel expansion."""
        from animal2vec_tpu.models.modules import conv1d_same

        mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
        x = jnp.asarray(rng.normal(size=(8, 40, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(5, 4, 64)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

        def loss(w, x):
            return (conv1d_same(x, w, b, 1, 16) ** 2).sum()

        g_ref = jax.grad(loss)(w, x)
        w_sh = jax.device_put(w, NamedSharding(mesh, P()))
        x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
        with mesh:
            g = jax.jit(jax.grad(loss))(w_sh, x_sh)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-3
        )

    def test_remat_compatible(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 4, 16)).astype(np.float32))

        def loss(w, x):
            f = jax.checkpoint(lambda w, x: grouped_conv1d(x, w, 1, (1, 1), 4))
            return (f(w, x) ** 2).sum()

        g = jax.grad(loss)(w, x)
        g_ref = jax.grad(
            lambda w, x: (_plain_conv1d(x, w, 1, (1, 1), 4) ** 2).sum()
        )(w, x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4)


class TestSafeDwGate:
    def test_gate_engages_only_on_multi_axis_meshes(self):
        from animal2vec_tpu.ops.grouped_conv import _needs_safe_dw

        assert _needs_safe_dw() is False  # no mesh: XLA's fused dW is correct
        devs = np.asarray(jax.devices())
        with Mesh(devs.reshape(8), ("data",)):
            assert _needs_safe_dw() is False  # 1-D data mesh: also correct
        with Mesh(devs.reshape(8, 1), ("data", "model")):
            assert _needs_safe_dw() is False  # size-1 axes are harmless
        with Mesh(devs.reshape(4, 2), ("data", "model")):
            assert _needs_safe_dw() is True
        with Mesh(devs.reshape(2, 2, 2), ("data", "stage", "model")):
            assert _needs_safe_dw() is True


class TestGroupedConv2d:
    def test_grads_match_autodiff(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 9, 11, 16)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 24)).astype(np.float32))

        def plain(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=4,
            )

        def loss_ours(w, x):
            return (grouped_conv2d(x, w, (1, 1), 4) ** 2).sum()

        def loss_ref(w, x):
            return (plain(x, w) ** 2).sum()

        np.testing.assert_allclose(
            float(loss_ours(w, x)), float(loss_ref(w, x)), rtol=1e-6
        )
        for arg in (0, 1):
            g_ours = jax.grad(loss_ours, arg)(w, x)
            g_ref = jax.grad(loss_ref, arg)(w, x)
            np.testing.assert_allclose(
                np.asarray(g_ours), np.asarray(g_ref), rtol=1e-4, atol=1e-3
            )

    def test_dw_correct_on_dp_tp_mesh(self, rng):
        mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
        x = jnp.asarray(rng.normal(size=(8, 8, 8, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 8, 32)).astype(np.float32))

        def loss(w, x):
            return (grouped_conv2d(x, w, (1, 1), 4) ** 2).sum()

        g_ref = jax.grad(loss)(w, x)
        w_sh = jax.device_put(w, NamedSharding(mesh, P()))
        x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
        with mesh:
            g = jax.jit(jax.grad(loss))(w_sh, x_sh)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-3
        )
