"""Training CLI (replaces animal2vec_train.py + hydra dispatch).

Usage:
  python -m animal2vec_tpu.tools.train_cli --config <yaml> [key=value ...]

The mode (pretrain vs finetune) follows the config: a ``finetune`` section
selects finetuning. Crash suppression (`--suppress-crashes`) mirrors
animal2vec_train.py:60-64; profiling wraps the run in a jax profiler trace
(the reference's NVTX wrap, :54-56).
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--max-steps", type=int, default=None, help="debug cap")
    parser.add_argument(
        "--patience", type=int, default=None,
        help="override checkpoint.patience (early-stop validations)",
    )
    parser.add_argument(
        "--pretrained", default="", help="checkpoint dir or fairseq .pt to warm-start finetuning"
    )
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(message)s"
    )
    from animal2vec_tpu.config import load_config

    cfg = load_config(args.config, args.overrides)

    import os

    import jax

    # multi-host (pod / multi-slice): the reference spawns NCCL process
    # groups (distributed_utils.call_main); here each host just joins the
    # jax runtime — mesh + GSPMD do the rest over ICI/DCN.
    if os.environ.get("A2V_MULTIHOST") or os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    from animal2vec_tpu.train.loop import run_finetune, run_pretrain

    def _run():
        if cfg.common.profile:
            jax.profiler.start_trace(cfg.common.tensorboard_logdir or "trace")
        try:
            if cfg.finetune is not None:
                pre = _load_pretrained(args.pretrained, cfg) if args.pretrained else None
                return run_finetune(
                    cfg, pretrained_params=pre, max_steps=args.max_steps,
                    patience=args.patience,
                )
            return run_pretrain(cfg, max_steps=args.max_steps)
        finally:
            if cfg.common.profile:
                jax.profiler.stop_trace()

    if cfg.common.suppress_crashes:
        try:
            return _run()
        except Exception:  # noqa: BLE001 - explicit opt-in crash suppression
            logging.getLogger("animal2vec_tpu").exception("run crashed (suppressed)")
            return None
    return _run()


def _load_pretrained(path: str, cfg):
    """Load pretrained encoder params from a fairseq .pt or our checkpoint."""
    if path.endswith(".pt"):
        from animal2vec_tpu.train.convert import (
            convert_pretrain,
            load_torch_checkpoint,
            state_dict_to_numpy,
        )

        state = load_torch_checkpoint(path)
        sd = state_dict_to_numpy(state.get("model", state))
        if cfg.finetune.load_ema and any(k.startswith("_ema.") for k in sd):
            # use EMA weights as the encoder (nn/wav2vec2.py:187-192)
            for k in list(sd):
                if k.startswith("_ema."):
                    sd[k[len("_ema."):]] = sd[k]
        params, _ = convert_pretrain(sd, cfg.model)
        return params
    from animal2vec_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(path)
    state, _ = mgr.restore()
    return state["params"] if isinstance(state, dict) else state.params


if __name__ == "__main__":
    main()
