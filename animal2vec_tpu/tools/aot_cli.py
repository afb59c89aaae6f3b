"""AOT serving-bundle CLI: checkpoint -> compile-once inference artifact.

Exports the finetuned frame-logit forward (at a fixed batch x wav_len) as a
`jax.export` StableHLO bundle + npz weights (see serve.py). A serving
process then needs only jax and the bundle directory — no model code:

  python -m animal2vec_tpu.tools.aot_cli \
      --checkpoint ckpt_dir_or_fairseq.pt \
      --config animal2vec_tpu/configs/finetune_100.yaml \
      --out bundle_dir [--batch 16] [--seconds 10] [--no-bf16]

  # later, anywhere with the same accelerator platform:
  from animal2vec_tpu.serve import ServingBundle
  probs = ServingBundle("bundle_dir").predict_probs(batch)

The reference has no AOT path: its inference scripts re-import fairseq and
re-build the model per process (get_results_for_single_manifest_split.py:212).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument(
        "--seconds", type=float, default=None,
        help="clip length in seconds (default: task.max_sample_size)",
    )
    parser.add_argument("--no-bf16", action="store_true",
                        help="keep weights fp32 in the bundle")
    parser.add_argument(
        "--shape", action="append", default=None, metavar="BATCHxSECONDS",
        help="extra (batch x seconds) entries, repeatable — one StableHLO "
        "program per shape in the same bundle (e.g. --shape 16x10 --shape "
        "32x5 for native-length buckets)",
    )
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.serve import export_serving
    from animal2vec_tpu.tools.infer_cli import load_finetuned

    cfg = load_config(args.config, overrides=["finetune.w2v_path="] + args.overrides)
    _, variables = load_finetuned(args.checkpoint, cfg)
    wav_len = (
        int(args.seconds * cfg.task.sample_rate) if args.seconds else None
    )
    shapes = None
    if args.shape:
        base = wav_len or int(
            cfg.task.max_sample_size or 10 * cfg.task.sample_rate
        )
        shapes = [(args.batch, base)]
        for s in args.shape:
            b, sec = s.lower().split("x")
            shapes.append((int(b), int(float(sec) * cfg.task.sample_rate)))
    out = export_serving(
        cfg,
        variables,
        args.out,
        batch_size=args.batch,
        wav_len=wav_len,
        cast_bf16=not args.no_bf16,
        shapes=shapes,
    )
    print(f"serving bundle written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
