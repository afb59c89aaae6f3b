"""Checkpoint converter CLI: fairseq animal2vec `.pt` <-> this framework.

Import (the BASELINE logit-parity path): load the released fairseq
checkpoint, map names/layouts onto our param trees, verify every parameter
against a freshly-initialized model, and write an orbax checkpoint that
train/infer/export consume directly.

Export: write a fairseq-style state dict (numpy npz with torch-layout
arrays) from one of our checkpoints, for interop with the reference tooling.

Usage:
  python -m animal2vec_tpu.tools.convert_cli import --pt model.pt \
      --config finetune_100.yaml --out ckpt_dir [--kind finetune|pretrain]
  python -m animal2vec_tpu.tools.convert_cli export --checkpoint ckpt_dir \
      --config a2v_large_pretrain.yaml --out state_dict.npz
"""

from __future__ import annotations

import argparse
import sys


def do_import(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.train.build import build_finetune_model, build_pretrain_model
    from animal2vec_tpu.train.checkpoint import CheckpointManager
    from animal2vec_tpu.train.convert import (
        convert_finetune,
        convert_pretrain,
        load_torch_checkpoint,
        state_dict_to_numpy,
        verify_tree_shapes,
    )

    cfg = load_config(args.config, ["finetune.w2v_path="] + args.overrides)
    state = load_torch_checkpoint(args.pt)
    sd = state_dict_to_numpy(state.get("model", state))
    kind = args.kind
    if kind == "auto":
        kind = "finetune" if any(k.startswith("w2v_encoder.") for k in sd) else "pretrain"
    print(f"loaded {len(sd)} tensors from {args.pt} (kind={kind})")

    if kind == "finetune":
        params = convert_finetune(sd, cfg.model)
        model = build_finetune_model(cfg)
        ref = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, args.example_len)))["params"]
    else:
        params, ema = convert_pretrain(sd, cfg.model)
        model = build_pretrain_model(cfg)
        ref = model.init(
            {"params": jax.random.PRNGKey(0), "mask_noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, args.example_len)),
        )["params"]
    missing, unexpected, mismatched = verify_tree_shapes(params, ref)
    for name, items in (("missing", missing), ("unexpected", unexpected), ("mismatched", mismatched)):
        if items:
            print(f"{name} ({len(items)}):")
            for p in items[:20]:
                print("   ", "/".join(map(str, p)))
    if args.strict and (missing or unexpected or mismatched):
        print("strict mode: conversion incomplete", file=sys.stderr)
        sys.exit(1)
    # fill anything missing from the fresh init so the tree is loadable
    import flax.traverse_util as tu

    flat = dict(tu.flatten_dict(ref))
    flat.update(
        {p: v for p, v in tu.flatten_dict(params).items() if p in flat}
    )
    full = tu.unflatten_dict(flat)
    mgr = CheckpointManager(args.out, keep_last=1)
    mgr.save(0, {"params": full})
    mgr.wait()
    print(f"wrote converted checkpoint to {args.out}")


def do_export(args):
    import numpy as np

    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.train.checkpoint import CheckpointManager
    from animal2vec_tpu.train.convert import export_pretrain

    cfg = load_config(args.config, args.overrides)
    state, _ = CheckpointManager(args.checkpoint).restore()
    params = state["params"] if isinstance(state, dict) else state.params
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    sd = export_pretrain(params, cfg.model)
    np.savez(args.out, **sd)
    print(f"exported {len(sd)} tensors to {args.out}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_imp = sub.add_parser("import")
    p_imp.add_argument("--pt", required=True)
    p_imp.add_argument("--config", required=True)
    p_imp.add_argument("--out", required=True)
    p_imp.add_argument("--kind", default="auto", choices=["auto", "pretrain", "finetune"])
    p_imp.add_argument(
        "--example-len", type=int, default=80_000,
        help="example waveform length for shape verification init",
    )
    p_imp.add_argument("--strict", action="store_true")
    p_imp.add_argument("overrides", nargs="*")
    p_exp = sub.add_parser("export")
    p_exp.add_argument("--checkpoint", required=True)
    p_exp.add_argument("--config", required=True)
    p_exp.add_argument("--out", required=True)
    p_exp.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    if args.cmd == "import":
        do_import(args)
    else:
        do_export(args)


if __name__ == "__main__":
    main()
