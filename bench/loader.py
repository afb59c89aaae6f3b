"""Host-side input-pipeline throughput: sustained clips/s of the labeled
loader (manifest read -> C++ batch WAV decode -> normalize -> label
rasterize -> pad/crop collate -> thread prefetch), measured against the
device-side demand it must out-feed (serving ~60 clips/s/chip, pretrain
~8.6): ``python -m bench.loader``.

Pure host probe — no jax/TPU involvement; run anywhere. The dataset is the
synthetic MeerKAT-layout generator (10-s 8 kHz clips, chirp events, h5
labels), so decode + rasterize cost matches the real corpus shape.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONV = [(127, 63, 1), (512, 10, 5)] + [(512, 3, 2)] * 3 + [(512, 3, 1)] + [(512, 2, 1)] * 2
LABELS = ["beep", "synch", "sn", "cc", "ld", "oth", "mo", "al", "soc", "agg",
          "eating", "focal"]


def main():
    import numpy as np

    from animal2vec_tpu.data.dataset import AudioLabelDataset, BatchLoader
    from animal2vec_tpu.data.synthetic import generate

    n_clips = int(os.environ.get("N_CLIPS", "256"))
    batch = int(os.environ.get("B", "32"))
    workers = int(os.environ.get("W", str(os.cpu_count() or 4)))

    with tempfile.TemporaryDirectory() as root:
        generate(root, n_clips=n_clips, clip_seconds=10.0, seed=0)
        ds = AudioLabelDataset(
            manifest_path=os.path.join(root, "train_0.tsv"),
            sample_rate=8_000,
            max_sample_size=80_000,
            normalize=True,
            return_labels=True,
            unique_labels=LABELS,
            conv_layers=CONV,
        )
        loader = BatchLoader(ds, target_len=80_000, batch_size=batch,
                             num_workers=workers, seed=0, drop_last=True)
        for label, epochs in (("cold (first epoch, page-cache fill)", 1),
                              ("warm (3 epochs)", 3)):
            clips = 0
            t0 = time.perf_counter()
            for _ in range(epochs):
                for b in loader:
                    src = b["source"]  # train batches are (accum, B, T)
                    assert np.isfinite(src).all()
                    clips += src.shape[0] * src.shape[1]
                loader.epoch += 1
            dt = time.perf_counter() - t0
            print(f"{label:36s} {clips / dt:9.1f} clips/s "
                  f"({clips} clips, {workers} workers, batch {batch})",
                  flush=True)
        print("demand anchors: serving 60.3 clips/s/chip (482 on v5e-8); "
              "pretrain 8.6/chip", flush=True)


if __name__ == "__main__":
    main()
