"""GPipe-style pipeline parallelism over the scanned transformer trunk.

The reference has no pipeline parallelism (its largest model fits one GPU);
this is a beyond-parity TPU-native capability completing the mesh axes
(dp x pp x tp): the trunk's stacked block parameters (depth leading axis,
see models/modules.BlockStack) shard over a "stage" mesh axis, and the
forward becomes an SPMD tick loop — each device applies its depth-slice to
one microbatch per tick and `lax.ppermute`s the activation to the next
stage. Reverse-mode AD through `ppermute` yields the mirrored backward
pipeline automatically, so one `jax.grad` of the jitted step trains the
pipelined model with no hand-written schedule.

Schedule: plain GPipe over ``n_micro`` microbatches — ``n_micro + S - 1``
ticks, bubble fraction ``(S-1)/(n_micro+S-1)`` each direction. Bubble ticks
run the block on zeros (SPMD requires every device to execute every tick);
their results are masked out of the output buffers.

Cost model (when to use): pp pays off only when the trunk dominates and the
model does not fit (or does not scale) under dp x tp — the non-trunk parts
(frontend, decoders, losses) are replicated across "stage" and computed
redundantly. For a2v-large (0.3 B params) dp x tp is usually better; pp is
here for the scale path and for DCN-linked slices where ppermute's
point-to-point traffic beats tp's per-layer all-reduces.
"""

from __future__ import annotations

import logging
import warnings
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

logger = logging.getLogger(__name__)
_warned_no_mesh_api = False


def active_mesh() -> Optional[Mesh]:
    """The ambient concrete mesh, or None.

    Checks, in order: the legacy ``with mesh:`` context (thread_resources,
    reached through the still-public ``jax.interpreters.pxla`` shim before
    the private module) and the new ``jax.sharding.set_mesh``/``use_mesh``
    context (``jax.sharding.get_mesh``). If every accessor fails on a jax
    upgrade we log a loud one-time warning instead of silently disabling
    pipeline parallelism / forcing the slow safe-dW path everywhere.
    """
    global _warned_no_mesh_api
    m = None
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla

            m = pxla.thread_resources.env.physical_mesh
    except Exception:
        try:
            from jax._src import mesh as mesh_lib

            m = mesh_lib.thread_resources.env.physical_mesh
        except Exception:
            m = None
    if m is not None and not m.empty:
        return m
    try:
        m2 = jax.sharding.get_mesh()
        if m2 is not None and not m2.empty and isinstance(m2, Mesh):
            return m2
    except Exception:
        m2 = None
    if m is None and m2 is None and not _warned_no_mesh_api:
        _warned_no_mesh_api = True
        logger.warning(
            "animal2vec_tpu: no ambient-mesh accessor works on this jax "
            "version; pipeline parallelism is disabled and grouped-conv "
            "weight grads use the conservative safe path everywhere."
        )
    return None


def pick_microbatches(batch: int, stages: int, requested: int = 0) -> int:
    """Largest divisor of ``batch`` that is <= max(requested, 2*stages).

    2*stages halves the GPipe bubble vs. n_micro == stages while keeping
    per-tick work large; explicit ``requested`` raises/lowers the cap."""
    cap = requested if requested > 0 else 2 * stages
    cap = min(cap, batch)
    for m in range(cap, 0, -1):
        if batch % m == 0:
            return m
    return 1


def pipeline_blocks(
    block_apply_mb: Callable,
    stacked_params: Any,
    x: jnp.ndarray,
    dpr: jnp.ndarray,
    slopes_scaled: Optional[jnp.ndarray],
    positions: Optional[jnp.ndarray],
    padding_mask: Optional[jnp.ndarray],
    *,
    mesh: Mesh,
    axis: str = "stage",
    n_micro: int = 0,
    dropout_keys: Optional[jnp.ndarray] = None,
    layerdrop_keys: Optional[jnp.ndarray] = None,
    key_impl: Any = None,
    layerdrop: float = 0.0,
    tap_reduce: Optional[Callable] = None,
    tap_weights: Optional[jnp.ndarray] = None,
    remat: bool = False,
):
    """Pipelined equivalent of BlockStack's layer scan.

    block_apply_mb(params_one_layer, x_mb, slopes_one_layer, positions_mb,
    padding_mask_mb, rate, dropout_key) -> (y_mb, tap_mb) applies ONE block
    to ONE microbatch; this function supplies the schedule around it.

    Args mirror BlockStack internals: ``stacked_params`` leaves are
    (depth, ...), ``dpr``/``slopes_scaled``/key arrays are per-layer,
    ``positions``/``padding_mask`` are (B, T) batch-level side inputs.
    Returns (x_out, taps_or_acc, keeps):
      * taps (depth, B, T, C) sharded over ``axis`` on dim 0,
      * or the streamed fp32 (B, T, C) accumulator (replicated) when
        ``tap_reduce`` is given,
      * keeps (depth,) layerdrop survival flags or None.
    """
    stages = mesh.shape[axis]
    depth = dpr.shape[0]
    if depth % stages != 0:
        raise ValueError(f"depth {depth} not divisible by {stages} pipeline stages")
    b, t, c = x.shape
    n_micro = pick_microbatches(b, stages, n_micro)
    mb = b // n_micro
    streaming = tap_reduce is not None

    # microbatch the batch-level inputs; replicate everything over the other
    # mesh axes is the caller's concern (GSPMD handles resharding at entry)
    x_mb = x.reshape(n_micro, mb, t, c)
    pos_mb = None if positions is None else positions.reshape(n_micro, mb, t)
    pm_mb = (
        None if padding_mask is None else padding_mask.reshape(n_micro, mb, t)
    )
    if tap_weights is None:
        tap_weights = jnp.ones((depth,), jnp.float32)

    # per-layer leaves, sharded over the stage axis on dim 0
    has_slopes = slopes_scaled is not None
    slopes_in = (
        slopes_scaled if has_slopes else jnp.zeros((depth, 1), jnp.float32)
    )
    dk_in = (
        dropout_keys
        if dropout_keys is not None
        else jnp.zeros((depth, 2), jnp.uint32)
    )
    ldk_in = (
        layerdrop_keys
        if layerdrop_keys is not None
        else jnp.zeros((depth, 2), jnp.uint32)
    )
    has_dropout = dropout_keys is not None
    has_layerdrop = layerdrop_keys is not None and layerdrop > 0.0

    n_ticks = n_micro + stages - 1

    def stage_fn(p_local, x_mb, dpr_l, slopes_l, w_l, dk_l, ldk_l, pos_mb, pm_mb):
        stage = jax.lax.axis_index(axis)
        lc = dpr_l.shape[0]

        def apply_chunk(xc, m_idx):
            pos_c = None if pos_mb is None else jax.lax.dynamic_index_in_dim(
                pos_mb, m_idx, keepdims=False
            )
            pm_c = None if pm_mb is None else jax.lax.dynamic_index_in_dim(
                pm_mb, m_idx, keepdims=False
            )

            def block_apply(p_l, xl, slope_l, rate, key_l):
                # key_impl came from jax.random.key_impl on the caller's key
                # (None = ambient default impl) — never assume threefry:
                # under jax_default_prng_impl=rbg key data is 4 words wide
                key = (
                    jax.random.fold_in(
                        jax.random.wrap_key_data(key_l, impl=key_impl), m_idx
                    )
                    if has_dropout
                    else None
                )
                return block_apply_mb(
                    p_l, xl, slope_l if has_slopes else None, pos_c, pm_c, rate, key
                )

            ld_keys = None
            if has_layerdrop:
                ld_keys = jax.vmap(
                    lambda k: jax.random.wrap_key_data(k, impl=key_impl)
                )(ldk_l)
            chunk_in = (
                p_local,
                dpr_l,
                slopes_l,
                w_l,
                dk_l,
                ld_keys if ld_keys is not None else jnp.zeros((lc,), jnp.float32),
            )

            def body(carry, inp):
                xc_, acc = carry
                p_l, rate, slope_l, wl, key_l, ld_key_l = inp
                y, tap = block_apply(p_l, xc_, slope_l, rate, key_l)
                if streaming:
                    acc = acc + wl * tap_reduce(tap.astype(jnp.float32))
                    return (y, acc), jnp.zeros((), jnp.float32)
                if has_layerdrop:
                    keep = jax.random.bernoulli(ld_key_l, 1.0 - layerdrop, ())
                    y = jnp.where(keep, y, xc_)
                    tap = jnp.where(keep, tap, xc_)
                    return (y, acc), (tap, keep.astype(jnp.float32))
                return (y, acc), (tap, jnp.ones((), jnp.float32))

            body_fn = jax.checkpoint(body, prevent_cse=False) if remat else body
            acc0 = (
                jnp.zeros(xc.shape, jnp.float32)
                if streaming
                else jnp.zeros((), jnp.float32)
            )
            (y, acc), ys = jax.lax.scan(body_fn, (xc, acc0), chunk_in)
            return y, acc, ys

        out_buf = jnp.zeros((n_micro, mb, t, c), x_mb.dtype)
        acc_buf = (
            jnp.zeros((n_micro, mb, t, c), jnp.float32) if streaming else None
        )
        taps_buf = (
            None
            if streaming
            else jnp.zeros((lc, n_micro, mb, t, c), x_mb.dtype)
        )
        keeps_buf = None if streaming else jnp.zeros((lc,), jnp.float32)
        state = jnp.zeros((mb, t, c), x_mb.dtype)

        def tick(carry, tk):
            state, out_buf, acc_buf, taps_buf, keeps_buf = carry
            m_in = tk - stage
            active = jnp.logical_and(m_in >= 0, m_in < n_micro)
            m_idx = jnp.clip(m_in, 0, n_micro - 1)
            inject = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(tk, 0, n_micro - 1), keepdims=False
            )
            xin = jnp.where(stage == 0, inject, state)
            y, acc, ys = apply_chunk(xin, m_idx)

            if streaming:
                cur = jax.lax.dynamic_index_in_dim(acc_buf, m_idx, keepdims=False)
                acc_buf = jax.lax.dynamic_update_index_in_dim(
                    acc_buf, jnp.where(active, acc, cur), m_idx, axis=0
                )
            else:
                taps, keeps = ys
                cur = jax.lax.dynamic_index_in_dim(taps_buf, m_idx, 1, keepdims=False)
                taps_buf = jax.lax.dynamic_update_index_in_dim(
                    taps_buf, jnp.where(active, taps, cur), m_idx, axis=1
                )
                # keep flags are per layer (shared by all microbatches): take
                # them from the tick that processed microbatch 0
                keeps_buf = jnp.where(m_in == 0, keeps, keeps_buf)

            is_last = stage == stages - 1
            cur = jax.lax.dynamic_index_in_dim(out_buf, m_idx, keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf,
                jnp.where(jnp.logical_and(active, is_last), y, cur),
                m_idx,
                axis=0,
            )
            state = jax.lax.ppermute(
                y, axis, [(i, i + 1) for i in range(stages - 1)]
            )
            return (state, out_buf, acc_buf, taps_buf, keeps_buf), None

        (state, out_buf, acc_buf, taps_buf, keeps_buf), _ = jax.lax.scan(
            tick,
            (state, out_buf, acc_buf, taps_buf, keeps_buf),
            jnp.arange(n_ticks),
        )

        # the final outputs live on the last stage only; psum replicates them
        x_out = jax.lax.psum(out_buf, axis).reshape(b, t, c)
        if streaming:
            acc_out = jax.lax.psum(acc_buf, axis).reshape(b, t, c)
            return x_out, acc_out, jnp.zeros((lc,), jnp.float32)
        return x_out, taps_buf.reshape(lc, b, t, c), keeps_buf

    # everything except the per-layer leaves is replicated over the stage
    # axis; per-layer leaves split along dim 0
    lspec = P(axis)
    rspec = P()
    in_specs = (
        jax.tree_util.tree_map(lambda _: lspec, stacked_params),
        rspec,  # x_mb
        lspec,  # dpr
        lspec,  # slopes
        lspec,  # tap weights
        lspec,  # dropout keys
        lspec,  # layerdrop keys
        rspec,  # positions
        rspec,  # padding mask
    )
    out_specs = (rspec, rspec if streaming else lspec, lspec)

    # manual control over "stage" only (axis_names): data/model stay auto so
    # GSPMD keeps propagating dp batch / tp weight shardings inside
    fn = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        axis_names={axis},
        check_vma=False,
    )
    x_out, taps_or_acc, keeps = fn(
        stacked_params, x_mb, dpr, slopes_in, tap_weights, dk_in, ldk_in,
        pos_mb, pm_mb,
    )
    if streaming:
        return x_out, taps_or_acc, None
    return x_out, taps_or_acc, (keeps if has_layerdrop else None)
