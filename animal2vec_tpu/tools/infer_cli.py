"""Long-file inference CLI: wav -> per-class [onset, offset, likelihood].

Mirrors the README inference snippet (/root/reference/README.md:48-176):
chunk an arbitrarily long recording into 10-s windows, batched jitted
forward, sigmoid frame probabilities, fuse into events with absolute
timestamps via the batch multiplier.

Usage:
  python -m animal2vec_tpu.tools.infer_cli --wav rec.wav \
      --checkpoint ckpt_dir_or_fairseq.pt --config finetune_100.yaml \
      [--method avg --threshold 0.175 --out events.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_finetuned(checkpoint: str, cfg):
    """Finetuned weights from a fairseq .pt or our checkpoint dir."""
    from animal2vec_tpu.train.build import build_finetune_model

    model = build_finetune_model(cfg)
    if checkpoint.endswith(".pt"):
        from animal2vec_tpu.train.convert import (
            convert_finetune,
            load_torch_checkpoint,
            state_dict_to_numpy,
        )

        state = load_torch_checkpoint(checkpoint)
        sd = state_dict_to_numpy(state.get("model", state))
        params = convert_finetune(sd, cfg.model)
    else:
        from animal2vec_tpu.train.checkpoint import CheckpointManager

        st, _ = CheckpointManager(checkpoint).restore()
        params = st["params"] if isinstance(st, dict) else st.params
    return model, {"params": params}


def infer_long_file(
    wav_path: str,
    model,
    variables,
    cfg,
    method: str = "avg",
    threshold: float | None = None,
    max_batch_size: int = 16,
    segment_length: float | None = None,
    data_parallel: int = 1,
):
    """``data_parallel``: shard each chunk batch over this many devices
    (-1 = all visible; parallel/serving.py). The final partial batch is
    zero-padded to a device multiple and its padded rows dropped before
    event fusing, so results are device-count independent."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animal2vec_tpu.parallel.serving import DataParallelServing

    if segment_length is None:
        sr_cfg = cfg.task.sample_rate
        segment_length = (
            cfg.task.max_sample_size / sr_cfg if cfg.task.max_sample_size else 10.0
        )

    from animal2vec_tpu.data.wavio import read_wav
    from animal2vec_tpu.evalx.segmentation import fuse_predict
    from animal2vec_tpu.ops.audio import chunk_and_normalize

    dp = DataParallelServing(variables, n_devices=data_parallel)
    variables = dp.variables
    # floor, not ceil: --max-batch-size is a per-host memory cap the user
    # tuned; only the final partial batch is padded (pad_and_shard below)
    max_batch_size = dp.floor_batch(max_batch_size)

    wav, sr = read_wav(wav_path)
    if wav.ndim > 1:
        wav = wav[:, 0]
    assert sr == cfg.task.sample_rate, f"resample {wav_path} to {cfg.task.sample_rate} Hz first"
    batches = chunk_and_normalize(
        wav, segment_length, sr, cfg.task.normalize, max_batch_size
    )

    @jax.jit
    def forward(variables, source):
        return jax.nn.sigmoid(
            model.apply(variables, source)["encoder_out"].astype(jnp.float32)
        )

    md = {
        "sigma_s": cfg.criterion.sigma_s,
        "metric_threshold": threshold if threshold is not None else cfg.criterion.metric_threshold,
        "maxfilt_s": cfg.criterion.maxfilt_s,
        "max_duration_s": cfg.criterion.max_duration_s,
        "lowP": cfg.criterion.lowP,
        "iou_threshold": cfg.criterion.iou_threshold,
    }
    labels = cfg.task.labels()
    sample_size = round(segment_length * sr)
    events = {name: [] for name in labels}
    first_bs = batches[0].shape[0]
    for bi, batch in enumerate(batches):
        src, n_valid = dp.pad_and_shard(batch)
        probs = np.asarray(forward(variables, src))[:n_valid]
        ti, ii, li = fuse_predict(
            sample_size, probs, md, sr, method=method, multiplier=bi, bs=first_bs
        )
        for b in range(len(ti)):
            for ci, name in enumerate(labels):
                for (on, off), like in zip(ti[b][ci], li[b][ci]):
                    events[name].append(
                        {"onset_s": round(on, 4), "offset_s": round(off, 4),
                         "likelihood": round(like, 4)}
                    )
    return events


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--wav", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--method", default="avg", choices=["avg", "max", "canny"])
    parser.add_argument("--threshold", type=float, default=None)
    parser.add_argument("--max-batch-size", type=int, default=16)
    parser.add_argument(
        "--data-parallel", type=int, default=-1,
        help="shard each chunk batch over this many devices "
        "(default -1 = all visible; 1 = single-device)",
    )
    parser.add_argument("--out", default="")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from animal2vec_tpu.config import load_config

    cfg = load_config(args.config, ["finetune.w2v_path="] + args.overrides)
    model, variables = load_finetuned(args.checkpoint, cfg)
    events = infer_long_file(
        args.wav, model, variables, cfg,
        method=args.method, threshold=args.threshold,
        max_batch_size=args.max_batch_size,
        data_parallel=args.data_parallel,
    )
    payload = json.dumps(events, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
        total = sum(len(v) for v in events.values())
        print(f"wrote {total} events to {args.out}")
    else:
        print(payload)


if __name__ == "__main__":
    main()
