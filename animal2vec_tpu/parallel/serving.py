"""Data-parallel serving/eval: shard inference batches over every chip.

The BASELINE throughput contract (>= 2,000 clips/s on a TPU v5e-8,
/root/repo/BASELINE.json) is an 8-chip AGGREGATE number. The reference's
batched manifest eval runs one process on one device
(/root/reference/get_results_for_single_manifest_split.py:219-235); the
TPU-native equivalent lays each batch out over a 1-D ``("data",)`` mesh
once and lets GSPMD run the identical jitted forward SPMD on every chip —
aggregate throughput = per-chip throughput x n_devices, with zero model
code changes and no collectives on the serving path (rows are
independent, so XLA partitions the whole program batch-wise).

Used by ``tools/export_cli.py`` and ``tools/infer_cli.py`` (the
``--data-parallel`` flag) and mirrored by the driver bench (bench.py) and
the multi-chip dryrun (__graft_entry__.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class DataParallelServing:
    """Replicate params, shard batches over a 1-D ("data",) device mesh.

    ``n_devices``: how many visible devices to use (None/-1 = all). With one
    device this degenerates to plain single-chip serving (same placement,
    same numerics), so callers can use it unconditionally.
    """

    def __init__(
        self,
        variables: Any,
        n_devices: Optional[int] = None,
        devices: Optional[Sequence[Any]] = None,
    ):
        devices = list(devices) if devices is not None else list(jax.devices())
        n = len(devices) if n_devices is None or n_devices < 0 else int(n_devices)
        if n == 0:
            raise ValueError(
                "n_devices=0: pass a positive device count, or -1/None for "
                "all visible devices"
            )
        if n > len(devices):
            raise ValueError(
                f"--data-parallel {n} but only {len(devices)} devices are "
                f"visible ({[getattr(d, 'platform', d) for d in devices[:4]]}...)"
            )
        self.n_devices = n
        self.mesh = Mesh(np.asarray(devices[:n]), ("data",))
        self.variables = jax.device_put(variables, NamedSharding(self.mesh, P()))

    def round_batch(self, batch_size: int) -> int:
        """Smallest multiple of n_devices >= batch_size (every device must
        hold the same number of rows for an even layout)."""
        n = self.n_devices
        return max(n, -(-int(batch_size) // n) * n)

    def floor_batch(self, batch_size: int) -> int:
        """Largest device multiple <= batch_size — for user-provided batch
        sizes that are MEMORY CAPS and must not be exceeded (still at
        least one row per device; below n_devices it has to grow to n)."""
        n = self.n_devices
        return max(n, int(batch_size) // n * n)

    def shard(self, x) -> jax.Array:
        """Place ``x`` with its leading (batch) dim sharded over "data".

        Host arrays go straight to their owning devices (device_put with a
        NamedSharding does per-shard H2D) — NOT through jnp.asarray, which
        would stage the full batch on the default device first and then
        scatter device-to-device, doubling transfer work per batch."""
        if not hasattr(x, "shape"):
            x = np.asarray(x)
        if x.shape[0] % self.n_devices:
            raise ValueError(
                f"batch dim {x.shape[0]} is not divisible by the "
                f"{self.n_devices}-device data axis; round the batch size "
                "with round_batch() or pad with pad_and_shard()"
            )
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def pad_and_shard(self, x) -> Tuple[jax.Array, int]:
        """Zero-pad the leading dim up to a device multiple, then shard.

        Returns (sharded, n_valid): callers drop rows >= n_valid from the
        outputs (used for the final partial batch of a chunked long file).
        """
        x = np.asarray(x)
        n_valid = x.shape[0]
        target = self.round_batch(n_valid)
        if target != n_valid:
            pad = np.zeros((target - n_valid,) + x.shape[1:], dtype=x.dtype)
            x = np.concatenate([x, pad], axis=0)
        return self.shard(x), n_valid
