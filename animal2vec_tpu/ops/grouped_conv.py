"""Grouped convolutions with a partition-correct weight gradient.

Works around an XLA GSPMD defect observed on multi-axis meshes (jax 0.9,
8-device CPU mesh): the weight-grad transpose of a
``feature_group_count > 1`` convolution whose *input* is batch-sharded is
all-reduced over EVERY mesh axis instead of only the axes the operands are
actually sharded on. On a ``data x model`` mesh the grouped-conv weight
grads come back scaled by ``model`` (dp4 x tp2 -> exactly 2x; dp2 x tp4 ->
4x; dp2 x stage2 x tp2 -> 4x). Dense convolutions and ``dot_general`` are
partitioned correctly, as is the *input* grad of the grouped conv — only
grouped dW is wrong.

The fix keeps the XLA convolution for the forward and the input grad
(both correct and fast) and re-expresses dW as a ``lax.scan`` of
``dot_general`` contractions over the kernel taps — identical FLOPs, MXU
shapes (per-group (Cpg, B*T) @ (B*T, Opg)), and the standard dot_general
partitioner, which inserts the correct ``psum`` over only the
batch-sharded axes.

Affected model components (reference nn/modalities/audio.py:90-113 pos-conv
stack, nn/modalities/modules.py:137-243 Decoder1d/Decoder2d): under tensor
or pipeline parallelism their raw weight grads come back scaled. Adam's
elementwise scale invariance hides most of it (verified: a full tiny
pretrain step's updated params agree to 5e-3 either way), but the scaled
grads still pollute the global-norm clip shared by every parameter, break
any non-scale-invariant optimizer, and corrupt grad-based diagnostics.

The safe dW costs ~12% pretrain step throughput (v5e, batch 8), so it is
engaged only where the defect can manifest: ``_needs_safe_dw`` checks at
trace time for an active mesh with >= 2 axes of size > 1 (the train loop,
the pipeline path, and the multichip dryrun all trace under ``with mesh:``).
Single-chip and pure-DP runs keep XLA's fused conv dW, which is correct
there.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _needs_safe_dw() -> bool:
    """True when tracing under a mesh on which XLA's grouped-conv dW
    over-reduction can manifest: >= 2 mesh axes of size > 1 (a 1-D data
    mesh and the no-mesh single-chip case are unaffected — measured).

    Detects the mesh three ways: the ambient concrete mesh (``with mesh:``
    or ``jax.sharding.set_mesh``, via parallel.pipeline.active_mesh) and the
    abstract mesh jit propagates from explicit shardings
    (``jax.sharding.get_abstract_mesh``) — so steps built with explicit
    NamedSharding in/out_shardings and no mesh context manager still get the
    partition-correct dW. ``A2V_FORCE_SAFE_DW=1`` forces the safe path for
    callers whose mesh this cannot see. The requirement is also documented
    at the step builders (train/build.py)."""
    import os

    if os.environ.get("A2V_FORCE_SAFE_DW", "") == "1":
        return True

    def multi_axis(shape_items) -> bool:
        return sum(1 for _, s in shape_items if s > 1) >= 2

    try:
        from animal2vec_tpu.parallel.pipeline import active_mesh

        m = active_mesh()
        if m is not None and multi_axis(m.shape.items()):
            return True
    except Exception:
        return True  # fail safe: correctness over speed
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is not None and not am.empty and multi_axis(am.shape.items()):
            return True
    except Exception:
        return True
    return False


def _conv1d(x, kernel, stride, pad, groups):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[pad],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


def _dw_taps_1d(x, dy, k: int, stride: int, pad: Tuple[int, int], groups: int):
    """dW for a grouped 1-D conv as a scan of per-tap dot_generals.

    dw[t, c, o] = sum_{b, j} x_pad[b, j*stride + t, g(o)*Cpg + c] * dy[b, j, o]
    """
    b, t_in, c = x.shape
    t_out, o = dy.shape[1], dy.shape[2]
    xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
    # the last tap of the last output frame indexes (t_out-1)*stride + k - 1;
    # right-pad if the conv discarded a partial tail window
    need = (t_out - 1) * stride + k
    if xp.shape[1] < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1]), (0, 0)))
    xg = xp.reshape(b, xp.shape[1], groups, c // groups)
    dyg = dy.reshape(b, t_out, groups, o // groups)

    def tap(_, i):
        sl = jax.lax.dynamic_slice_in_dim(xg, i, (t_out - 1) * stride + 1, axis=1)
        if stride > 1:
            sl = sl[:, ::stride]
        dw_i = jnp.einsum(
            "btgc,btgo->gco", sl, dyg, preferred_element_type=jnp.float32
        )
        return None, dw_i

    _, dws = jax.lax.scan(tap, None, jnp.arange(k))
    # (k, g, cpg, opg) -> (k, cpg, g*opg): out channels are group-major
    dw = dws.transpose(0, 2, 1, 3).reshape(k, c // groups, o)
    return dw


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grouped_conv1d(x, kernel, stride: int, pad: Tuple[int, int], groups: int):
    """(B, T, C) x (K, C/groups, O) -> (B, T', O), XLA forward, safe dW."""
    return _conv1d(x, kernel, stride, pad, groups)


def _gc1_fwd(x, kernel, stride, pad, groups):
    return _conv1d(x, kernel, stride, pad, groups), (x, kernel)


def _gc1_bwd(stride, pad, groups, res, dy):
    x, kernel = res
    # the conv is linear in x: linear_transpose gives dx without re-running
    # the forward (jax.vjp would execute the primal conv at runtime)
    transpose = jax.linear_transpose(
        lambda xx: _conv1d(xx, kernel, stride, pad, groups), x
    )
    (dx,) = transpose(dy)
    dw = _dw_taps_1d(x, dy, kernel.shape[0], stride, pad, groups)
    return dx, dw.astype(kernel.dtype)


grouped_conv1d.defvjp(_gc1_fwd, _gc1_bwd)


def _conv2d(x, kernel, pad, groups):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _dw_taps_2d(x, dy, kh: int, kw: int, pad: Tuple[int, int], groups: int):
    b, h_in, w_in, c = x.shape
    h_out, w_out, o = dy.shape[1], dy.shape[2], dy.shape[3]
    xp = jnp.pad(x, ((0, 0), pad, pad, (0, 0)))
    xg = xp.reshape(b, xp.shape[1], xp.shape[2], groups, c // groups)
    dyg = dy.reshape(b, h_out, w_out, groups, o // groups)

    def tap(_, idx):
        i, j = idx // kw, idx % kw
        sl = jax.lax.dynamic_slice(
            xg,
            (0, i, j, 0, 0),
            (b, h_out, w_out, groups, c // groups),
        )
        dw_ij = jnp.einsum(
            "bhwgc,bhwgo->gco", sl, dyg, preferred_element_type=jnp.float32
        )
        return None, dw_ij

    _, dws = jax.lax.scan(tap, None, jnp.arange(kh * kw))
    dw = dws.reshape(kh, kw, groups, c // groups, o // groups)
    dw = dw.transpose(0, 1, 3, 2, 4).reshape(kh, kw, c // groups, o)
    return dw


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_conv2d(x, kernel, pad: Tuple[int, int], groups: int):
    """(B, H, W, C) x (Kh, Kw, C/groups, O) -> same-H/W out, safe dW."""
    return _conv2d(x, kernel, pad, groups)


def _gc2_fwd(x, kernel, pad, groups):
    return _conv2d(x, kernel, pad, groups), (x, kernel)


def _gc2_bwd(pad, groups, res, dy):
    x, kernel = res
    transpose = jax.linear_transpose(
        lambda xx: _conv2d(xx, kernel, pad, groups), x
    )
    (dx,) = transpose(dy)
    dw = _dw_taps_2d(x, dy, kernel.shape[0], kernel.shape[1], pad, groups)
    return dx, dw.astype(kernel.dtype)


grouped_conv2d.defvjp(_gc2_fwd, _gc2_bwd)
