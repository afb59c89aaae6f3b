"""Batch eval + embedding/prediction export over a manifest split.

Mirrors get_results_for_single_manifest_split.py: run the model over every
clip of a split, export per-clip likelihoods / segmented likelihoods /
targets and layer-averaged embeddings into HDF5 groups keyed by clip index,
with the source filename recorded.

The forward is data-parallel over every visible chip by default
(``--data-parallel N`` to restrict; see parallel/serving.py): params are
replicated over a 1-D ("data",) mesh, each batch is laid out batch-sharded,
and the jitted forward runs SPMD — the journey the BASELINE aggregate
throughput target (>= 2,000 clips/s on a v5e-8) is denominated in. An
``aggregate clips/s`` line (model forward only, excluding host-side
segmentation) is printed at the end.

Usage:
  python -m animal2vec_tpu.tools.export_cli --manifest-path dir --split valid_0 \
      --checkpoint ckpt --config finetune_100.yaml --out-path out \
      [--export-embeddings] [--export-predictions] [--data-parallel -1] \
      [--average-start-k-layers 0 --average-end-k-layers 16]
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--manifest-path", required=True)
    parser.add_argument("--split", default="valid_0")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--out-path", required=True)
    parser.add_argument("--batch-size", type=int, default=12)
    parser.add_argument("--export-embeddings", action="store_true")
    parser.add_argument("--export-predictions", action="store_true")
    parser.add_argument("--average-start-k-layers", type=int, default=0)
    parser.add_argument("--average-end-k-layers", type=int, default=16)
    parser.add_argument("--method", default="avg")
    parser.add_argument("--use-softmax", action="store_true")
    parser.add_argument(
        "--data-parallel", type=int, default=-1,
        help="shard each batch over this many devices (-1 = all visible); "
        "--batch-size is treated as a memory cap and floored to a device "
        "multiple (it grows only when below one row per device)",
    )
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import h5py
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.data.dataset import AudioLabelDataset, BatchLoader
    from animal2vec_tpu.evalx.segmentation import (
        intervals_from_binary,
        segmented_probs_and_targets,
    )
    from animal2vec_tpu.tools.infer_cli import load_finetuned

    from animal2vec_tpu.parallel.serving import DataParallelServing

    cfg = load_config(args.config, ["finetune.w2v_path="] + args.overrides)
    model, variables = load_finetuned(args.checkpoint, cfg)
    os.makedirs(args.out_path, exist_ok=True)

    dp = DataParallelServing(variables, n_devices=args.data_parallel)
    variables = dp.variables
    # floor, not ceil: --batch-size is a memory cap; it only grows when
    # it is below one row per device
    batch_size = dp.floor_batch(args.batch_size)
    if batch_size != args.batch_size:
        print(
            f"batch size {args.batch_size} -> {batch_size} "
            f"({dp.n_devices}-device data-parallel layout"
            + (
                ", minimum one row per device"
                if batch_size > args.batch_size
                else ""
            )
            + ")"
        )

    ds = AudioLabelDataset(
        os.path.join(args.manifest_path, f"{args.split}.tsv"),
        sample_rate=cfg.task.sample_rate,
        min_sample_size=1612,
        normalize=cfg.task.normalize,
        return_labels=True,
        unique_labels=cfg.task.labels(),
        use_focal_loss=cfg.criterion.use_focal_loss,
        conv_layers=cfg.task.conv_layers(),
    )
    # pad/crop length follows the task config (reference uses the dataset's
    # max_sample_size, nn/audio_tasks.py:392-394); default 10 s
    target_len = cfg.task.max_sample_size or 10 * cfg.task.sample_rate
    loader = BatchLoader(
        ds, target_len=target_len, batch_size=batch_size,
        shuffle=False, train=False, drop_last=False, num_workers=2,
        batch_multiple=dp.n_devices,
    )

    @jax.jit
    def forward(variables, source):
        out = model.apply(variables, source)
        return out["encoder_out"], out["layer_results"]

    md = {
        "sigma_s": cfg.criterion.sigma_s,
        "metric_threshold": cfg.criterion.metric_threshold,
        "maxfilt_s": cfg.criterion.maxfilt_s,
        "max_duration_s": cfg.criterion.max_duration_s,
        "lowP": cfg.criterion.lowP,
        "iou_threshold": cfg.criterion.iou_threshold,
    }
    tag = "{}_{}_{}_{}".format(
        args.average_start_k_layers, args.average_end_k_layers, args.split,
        os.path.basename(os.path.normpath(args.checkpoint)),
    )
    pred_file = os.path.join(args.out_path, f"predictions_FinetuneModel_{tag}.h5")
    emb_file = os.path.join(args.out_path, f"embeddings_FinetuneModel_{tag}.h5")
    f_pred = h5py.File(pred_file, "w") if args.export_predictions else None
    f_emb = h5py.File(emb_file, "w") if args.export_embeddings else None

    n_written = 0
    n_clips_timed = 0
    fwd_seconds = 0.0
    for n_batch, batch in enumerate(loader):
        t0 = time.perf_counter()
        logits, taps = forward(variables, dp.shard(batch["source"]))
        if args.use_softmax:
            probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), axis=-1))
        else:
            probs = np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))
        # true item count: the loader pads the final short group by
        # repeating items (data/dataset.py) — padded rows must not be
        # exported (their ids duplicate real rows) nor counted as
        # evaluated clips in the throughput line
        n_valid = int(batch.get("n_valid", probs.shape[0]))
        if n_batch > 0:  # first batch pays XLA compilation; don't count it
            fwd_seconds += time.perf_counter() - t0
            n_clips_timed += n_valid
        targets = batch["target"]
        if f_pred is not None:
            if not args.use_softmax:
                seg_idx = [
                    [intervals_from_binary(targets[b, :, c]) for c in range(targets.shape[-1])]
                    for b in range(targets.shape[0])
                ]
                pr, ta, *_ = segmented_probs_and_targets(
                    targets, seg_idx, probs, md, cfg.task.sample_rate, target_len,
                    method=args.method,
                )
                bs, tdim = probs.shape[0], probs.shape[1]
                seg_like = pr.reshape(bs, tdim, -1)
                seg_tar = ta.reshape(bs, tdim, -1)
            else:
                seg_like, seg_tar = probs.copy(), targets.copy()
            assert probs.shape == targets.shape == seg_like.shape == seg_tar.shape
            for i, idx in enumerate(batch["id"].ravel()[:n_valid]):
                grp = f_pred.create_group(f"{int(idx):06.0f}")
                grp.create_dataset("fname", data=ds.names[int(idx)])
                grp.create_dataset("likelihood", data=probs[i], dtype=np.float32)
                if not args.use_softmax:
                    grp.create_dataset("segmented_likelihood", data=seg_like[i], dtype=np.float32)
                    grp.create_dataset("segmented_target", data=seg_tar[i], dtype=np.float32)
                grp.create_dataset("target", data=targets[i], dtype=np.float32)
                n_written += 1
        if f_emb is not None:
            sel = np.asarray(taps)[args.average_start_k_layers: args.average_end_k_layers]
            emb = sel.astype(np.float32).mean(axis=0)
            assert emb.shape[:2] == targets.shape[:2]
            for i, idx in enumerate(batch["id"].ravel()[:n_valid]):
                grp = f_emb.create_group(f"{int(idx):06.0f}")
                grp.create_dataset("fname", data=ds.names[int(idx)])
                grp.create_dataset("embedding", data=emb[i], dtype=np.float32)
                grp.create_dataset("target", data=targets[i], dtype=np.float32)
    for f in (f_pred, f_emb):
        if f is not None:
            f.close()
    print(f"exported {n_written} clips to {args.out_path}")
    if fwd_seconds > 0:
        # end-to-end batch rate (host->device transfer + forward + sigmoid
        # + device->host), real clips only (padding rows excluded) — the
        # conservative side of the BASELINE aggregate number
        agg = n_clips_timed / fwd_seconds
        print(
            f"aggregate eval throughput (transfer+forward+sigmoid): "
            f"{agg:.1f} clips/s over "
            f"{dp.n_devices} device(s) ({agg / dp.n_devices:.1f} clips/s/chip)"
        )
        import json

        print(json.dumps({
            "metric": "manifest eval aggregate throughput",
            "clips_per_sec": round(agg, 2),
            "devices": dp.n_devices,
            "clips_per_sec_per_chip": round(agg / dp.n_devices, 2),
            "clips_timed": n_clips_timed,
        }))


if __name__ == "__main__":
    main()
