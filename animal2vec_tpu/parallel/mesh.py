"""Device mesh + partition specs: all parallelism through one jax Mesh.

Replaces the reference's three separate runtimes — legacy_ddp (NCCL DP),
fairscale FSDP wrapping (nn/audio_train_routine.py:100-102), and
MegatronTrainer tensor parallel (:158-161) — with GSPMD sharding over a
single ("data", "model") mesh:

* DP: batch dim sharded over "data"; gradient reduction is inserted by XLA
  (riding ICI) — no NCCL translation.
* TP: attention qkv/out and MLP kernels sharded over "model" (Megatron
  layout: column-parallel then row-parallel, so XLA places one
  reduce-scatter/all-gather pair per block).
* FSDP/ZeRO: parameters and optimizer state additionally sharded over
  "data" on a non-TP axis; XLA gathers just-in-time.

Multi-host: `jax.distributed.initialize` + the same mesh over all processes
(DCN between slices handled by jax device order).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from animal2vec_tpu.config import DistributedConfig


def build_mesh(
    cfg: Optional[DistributedConfig] = None, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = cfg.model_parallel if cfg else 1
    pp = getattr(cfg, "pipeline_parallel", 1) if cfg else 1
    dp = cfg.data_parallel if cfg else -1
    if dp == -1:
        dp = n // (mp * pp)
    if dp * mp * pp > n:
        raise ValueError(
            f"mesh data={dp} x stage={pp} x model={mp} needs {dp * mp * pp} "
            f"devices but only "
            f"{n} are visible ({[getattr(d, 'platform', d) for d in devices[:4]]}...). "
            "On a single-chip host, force a virtual CPU mesh first: set "
            "JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "before jax initializes (see tests/conftest.py / __graft_entry__._force_virtual_cpu)."
        )
    if pp > 1:
        # "stage" between data and model: tp stays innermost (ICI-nearest),
        # pipeline ppermute traffic crosses the middle axis once per chunk
        arr = np.asarray(devices[: dp * pp * mp]).reshape(dp, pp, mp)
        return Mesh(arr, ("data", "stage", "model"))
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(x, axis: str = "data"):
    """Constrain an activation to batch-sharded (axis, None, ...) when a mesh
    is active; no-op otherwise. Used at layer seams to stop GSPMD from
    propagating FSDP weight shardings into the conv stacks (XLA's grouped
    convolution partitioner CHECK-fails on feature-sharded inputs)."""
    try:
        from jax._src import mesh as mesh_lib

        mesh = mesh_lib.thread_resources.env.physical_mesh
        if mesh.empty or axis not in mesh.axis_names:
            return x
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    except Exception:
        return x


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading batch dim over "data"."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


_TP_COL = {"qkv", "fc1"}  # column-parallel: shard output features
_TP_ROW = {"proj", "fc2"}  # row-parallel: shard input features

# Dense (matmul) layers eligible for FSDP weight sharding. Conv kernels are
# excluded: XLA's SPMD partitioner mishandles sharded grouped-convolution
# weights (CHECK failure in convolution_handler), and the conv frontend is a
# negligible fraction of total parameters anyway.
_FSDP_DENSE = {
    "qkv", "proj", "fc1", "fc2", "project_linear", "linear_eval_projection",
    "recon_proj", "q_proj", "kv_proj", "input_proj", "proj_0", "proj_1",
}


def param_partition_spec(
    path: Tuple[str, ...], shape: Tuple[int, ...], mesh: Mesh, fsdp: bool = False
) -> P:
    """Partition rule: path + shape -> PartitionSpec.

    Scanned block stacks carry a leading depth axis; kernels under them are
    (depth, in, out). Attention/MLP kernels follow the Megatron column/row
    layout over "model". With fsdp, the largest remaining axis is sharded
    over "data" when divisible.
    """
    mp = mesh.shape["model"]
    dp = mesh.shape["data"]
    pp = mesh.shape.get("stage", 1)
    spec: list = [None] * len(shape)

    # pipelined trunk: every stacked-block leaf (kernels, biases, norm
    # scales — all carry the depth axis) shards depth over "stage"
    if (
        pp > 1
        and "blocks" in path
        and "block" in path
        and shape
        and shape[0] % pp == 0
    ):
        spec[0] = "stage"

    is_kernel = path and path[-1] == "kernel" and len(shape) >= 2
    leaf_parent = path[-2] if len(path) >= 2 else ""
    if is_kernel and mp > 1:
        if leaf_parent in _TP_COL and shape[-1] % mp == 0:
            spec[-1] = "model"
        elif leaf_parent in _TP_ROW and shape[-2] % mp == 0:
            spec[-2] = "model"
    # biases of column-parallel layers follow the output sharding
    if path and path[-1] == "bias" and leaf_parent in _TP_COL and mp > 1:
        if shape and shape[-1] % mp == 0:
            spec[-1] = "model"

    if fsdp and dp > 1 and is_kernel and leaf_parent in _FSDP_DENSE:
        # shard the largest un-sharded axis over "data" (ZeRO-3 style)
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % dp == 0 and shape[i] >= dp:
                spec[i] = "data"
                break
    return P(*spec)


def param_sharding(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Build a NamedSharding pytree matching ``params``."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, keep_empty_nodes=True)
    out = {}
    for path, leaf in flat.items():
        if hasattr(leaf, "shape"):
            spec = param_partition_spec(tuple(path), tuple(leaf.shape), mesh, fsdp)
        else:
            spec = P()
        out[path] = NamedSharding(mesh, spec)
    return tu.unflatten_dict(out)
