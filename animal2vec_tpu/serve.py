"""AOT serving bundles: compile-once, serve-anywhere inference artifacts.

The reference has no serving story beyond "load the fairseq checkpoint in a
fresh python and forward it" (README.md:48-176) — every serving process pays
model-code import, tracing, and XLA compilation. TPU-native serving should
not: `jax.export` lowers the jitted finetuned forward to versioned
StableHLO once, and any later process (same platform) deserializes and
calls it without the model code, flax, or tracing — only jax + the bundle.

A bundle directory contains:

* ``forward.jaxexport`` — serialized `jax.export.Exported` of
  ``(params, source) -> frame logits`` at a fixed (batch, wav_len); the
  Pallas flash-attention kernel rides along as a Mosaic custom call on TPU.
* ``params.npz`` — the parameter pytree, flattened with ``/``-joined keys
  (weights are deliberately *not* baked into the HLO: one bundle can be
  refreshed with retrained weights of identical structure, and the npz is
  inspectable without deserializing HLO).
* ``meta.json`` — shapes, dtype policy, class labels, sample rate, and the
  serving config digest (for mismatch diagnostics at load time).

Batch size is static by design: serving at a fixed (B, T) is exactly the
one-compiled-program regime the rest of the framework enforces; callers pad
the final partial batch (ops/audio.chunk_and_normalize already yields
fixed 10-s windows).

Multi-chip deployment: bundles are single-device by design — run one
bundle process per chip (the standard serving topology; rows are
independent so processes need no coordination), or use the model path's
``--data-parallel`` (tools/export_cli.py, parallel/serving.py) to drive
all chips from one process. Aggregate throughput math: BASELINE.md.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np


def _flatten_params(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten_params(v, f"{prefix}{k}/"))
        return flat
    flat[prefix.rstrip("/")] = np.asarray(tree)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params_npz(path: str, variables: Any) -> None:
    """npz can only hold builtin numpy dtypes; bfloat16 leaves (the serving
    cast) are stored as uint16 bit patterns with their true dtype recorded
    in a ``__dtypes__`` sidecar entry."""
    flat = _flatten_params(variables)
    dtypes: Dict[str, str] = {}
    out: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if v.dtype.kind == "V" or v.dtype.name == "bfloat16":
            dtypes[k] = v.dtype.name
            v = v.view(np.uint16) if v.dtype.itemsize == 2 else v.view(np.uint8)
        out[k] = v
    out["__dtypes__"] = np.frombuffer(
        json.dumps(dtypes).encode(), dtype=np.uint8
    ).copy()
    np.savez(path, **out)


def load_params_npz(path: str) -> Any:
    import ml_dtypes

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    dtypes = json.loads(bytes(flat.pop("__dtypes__", np.array([], np.uint8))) or "{}")
    for k, name in dtypes.items():
        flat[k] = flat[k].view(np.dtype(getattr(ml_dtypes, name)))
    return _unflatten_params(flat)


def cast_serving_params(variables: Any, dtype=None) -> Any:
    """Serving-style weight cast: >=2-D fp32 matmul/conv weights to bf16 so
    the compiled program contains no per-call weight casts. Sinc frequency
    params (conv_0) and learned alibi scales are consumed in fp32 by the
    model and stay fp32; 1-D norm/bias params are untouched (bench.py uses
    the identical policy)."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16

    def cast(path, x):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if any(n in ("conv_0", "alibi_scale") for n in names):
            return x
        if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(cast, variables)


def export_serving(
    cfg,
    variables: Any,
    out_dir: str,
    batch_size: int = 16,
    wav_len: Optional[int] = None,
    cast_bf16: bool = True,
    platforms: Optional[Tuple[str, ...]] = None,
    shapes: Optional[Sequence[Tuple[int, int]]] = None,
) -> str:
    """Build + export the finetuned frame-logit forward as an AOT bundle.

    ``variables``: ``{"params": ...}`` for the finetune model of ``cfg``.
    ``shapes``: optional list of (batch_size, wav_len) pairs — one StableHLO
    entry per shape in the same bundle (e.g. native-length buckets for a
    short-clip corpus plus the 10-s default). When omitted, exports the
    single (batch_size, wav_len) entry. Returns ``out_dir``. Platform
    defaults to the current jax backend.
    """
    import jax
    import jax.numpy as jnp

    from animal2vec_tpu.train.build import build_finetune_model

    model = build_finetune_model(cfg)
    if wav_len is None:
        wav_len = int(cfg.task.max_sample_size or 10 * cfg.task.sample_rate)
    if shapes is None:
        shapes = [(batch_size, wav_len)]
    # dedupe (order-preserving): a repeated --shape equal to the first entry
    # would otherwise make ServingBundle look for a forward_BxW.jaxexport
    # that the i==0 branch below never wrote
    shapes = list(dict.fromkeys((int(b), int(t)) for b, t in shapes))
    if cast_bf16:
        variables = cast_serving_params(variables)

    def forward(params, source):
        return model.apply(params, source)["encoder_out"]

    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), variables
    )
    os.makedirs(out_dir, exist_ok=True)
    exported_platforms = None
    for bsz, wlen in shapes:
        source_spec = jax.ShapeDtypeStruct((bsz, wlen), jnp.float32)
        exported = jax.export.export(
            jax.jit(forward),
            platforms=list(platforms) if platforms else None,
        )(params_spec, source_spec)
        exported_platforms = list(exported.platforms)
        name = (
            "forward.jaxexport"
            if (bsz, wlen) == shapes[0]
            else f"forward_{bsz}x{wlen}.jaxexport"
        )
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exported.serialize())
    save_params_npz(os.path.join(out_dir, "params.npz"), variables)
    meta = {
        "batch_size": shapes[0][0],
        "wav_len": shapes[0][1],
        "shapes": [list(s) for s in shapes],
        "sample_rate": cfg.task.sample_rate,
        "labels": cfg.task.labels(),
        "cast_bf16": cast_bf16,
        "platforms": exported_platforms,
        "out_shape": [shapes[0][0], -1, len(cfg.task.labels())],
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ServingBundle:
    """A loaded AOT bundle: ``bundle(source)`` -> frame logits.

    Needs only jax + numpy — no model code, no flax, no tracing. The
    deserialized computation is compiled by XLA on first call (HLO-level
    compile, far cheaper than a python re-trace) and cached for the
    process lifetime.
    """

    def __init__(self, bundle_dir: str):
        import jax

        with open(os.path.join(bundle_dir, "meta.json")) as f:
            self.meta = json.load(f)
        backend = jax.default_backend()
        if backend not in self.meta["platforms"]:
            raise RuntimeError(
                f"serving bundle was exported for {self.meta['platforms']} "
                f"but this process runs on '{backend}'; re-export with "
                f"platforms=('{backend}',)"
            )
        self.shapes = [
            tuple(s)
            for s in self.meta.get(
                "shapes", [[self.meta["batch_size"], self.meta["wav_len"]]]
            )
        ]
        self._calls = {}
        for i, (bsz, wlen) in enumerate(self.shapes):
            name = (
                "forward.jaxexport"
                if i == 0
                else f"forward_{bsz}x{wlen}.jaxexport"
            )
            with open(os.path.join(bundle_dir, name), "rb") as f:
                exported = jax.export.deserialize(bytearray(f.read()))
            self._calls[(bsz, wlen)] = jax.jit(exported.call)
        self._params = load_params_npz(os.path.join(bundle_dir, "params.npz"))

    @property
    def batch_size(self) -> int:
        return int(self.meta["batch_size"])

    @property
    def wav_len(self) -> int:
        return int(self.meta["wav_len"])

    def __call__(self, source: np.ndarray) -> np.ndarray:
        """source: one of the bundle's (batch, wav_len) shapes float32 ->
        (B, T, C) logits."""
        key = tuple(source.shape)
        if key not in self._calls:
            raise ValueError(
                f"serving bundle expects source shape in {self.shapes}, got "
                f"{key}; pad the final partial batch"
            )
        return np.asarray(self._calls[key](self._params, source))

    def predict_probs(self, source: np.ndarray) -> np.ndarray:
        logits = self(source).astype(np.float32)
        return 1.0 / (1.0 + np.exp(-logits))
