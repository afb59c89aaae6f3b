"""End-to-end slice tests (SURVEY §7 minimum slices): synthetic dataset ->
manifest CLI -> short finetune run through the real training loop ->
long-file inference CLI -> export CLI. Everything drives the same entry
points a user would."""

import json
import os

import numpy as np
import pytest

from animal2vec_tpu.config import (
    CheckpointConfig,
    Config,
    CriterionConfig,
    DatasetConfig,
    FinetuneModelConfig,
    MixupConfig,
    OptimizationConfig,
    TaskConfig,
    resolve,
)
from animal2vec_tpu.data.synthetic import generate
from tests.test_models import tiny_model_cfg

TINY_CONV = "[(9, 7, 1)] + [(16, 4, 2)] + [(16, 3, 2)]"
LABELS_STR = "['beep', 'synch', 'sn', 'cc', 'ld', 'oth', 'mo', 'al', 'soc', 'agg', 'eating', 'focal']"


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    # 1-s clips: with TINY_CONV (stride 4) that is T=2000 feature frames.
    # On the CPU test backend attention densifies to (B, H, T, T), so clip
    # length dominates e2e runtime — 2-s clips made this file take >1 h.
    generate(root, n_clips=8, clip_seconds=1.0, seed=1)
    return root


def e2e_config(data_root, ckpt_dir):
    from animal2vec_tpu.config import DistributedConfig

    cfg = Config()
    # single-device mesh: the test VM has 1 CPU core, so multi-device CPU
    # collectives serialize pathologically; sharded-step correctness is
    # covered by test_train.TestShardedStep and __graft_entry__ dryrun.
    cfg.distributed = DistributedConfig(data_parallel=1, model_parallel=1)
    cfg.task = TaskConfig(
        data=data_root,
        unique_labels=LABELS_STR,
        conv_feature_layers=TINY_CONV,
        with_labels=True,
        sample_rate=8000,
        max_sample_size=8_000,
        verbose_tensorboard_logging=True,
    )
    cfg.dataset = DatasetConfig(
        batch_size=2, max_tokens=None, num_workers=1,
        train_subset="train_0", valid_subset="valid_0",
        validate_interval_updates=4, validate_after_updates=0,
    )
    cfg.model = tiny_model_cfg()
    cfg.model.unique_labels = LABELS_STR
    cfg.criterion = CriterionConfig(
        use_focal_loss=True, metric_threshold=0.2, segmentation_metrics=True,
        report_accuracy=True,
    )
    cfg.optimization = OptimizationConfig(
        lr=1e-3, max_update=6, warmup_updates=2, update_freq=1,
        weight_decay=0.0, adam_eps=1e-8,
    )
    cfg.checkpoint = CheckpointConfig(save_dir=ckpt_dir, save_interval_updates=3, keep_last=2)
    cfg.common.log_interval = 2
    cfg.finetune = FinetuneModelConfig(
        apply_mask=True, mask_prob=0.5, mask_length=2,
        average_top_k_layers=2, mixup=MixupConfig(source_mixup=0.5, mixup_prob=1.0, target_mixup=True),
    )
    return resolve(cfg)


class TestManifestCLI:
    def test_generate_manifests(self, data_root, tmp_path):
        from animal2vec_tpu.tools.manifest_cli import main

        dest = str(tmp_path / "manifests")
        main([
            "--root", data_root, "--dest", dest,
            "--valid-percent", "0.25", "--n-split", "1", "--few-shot",
        ])
        files = sorted(os.listdir(dest))
        assert "pretrain.tsv" in files
        assert "train_0.tsv" in files and "valid_0.tsv" in files
        assert "train_0_few_0.tsv" in files and "train_0_few_4.tsv" in files
        from animal2vec_tpu.data.manifest import read_manifest

        _, tr = read_manifest(os.path.join(dest, "train_0.tsv"))
        _, va = read_manifest(os.path.join(dest, "valid_0.tsv"))
        assert len(tr) + len(va) == 8
        assert 1 <= len(va) <= 3  # ~25% of 8, stratified rounding


@pytest.fixture(scope="module")
def trained_ckpt(data_root, tmp_path_factory):
    """One short finetune run shared by the loop/infer/export tests — the
    expensive jit compile happens once on the 1-core test VM."""
    from animal2vec_tpu.train.loop import run_finetune

    ckpt = str(tmp_path_factory.mktemp("shared") / "ckpt")
    cfg = e2e_config(data_root, ckpt)
    out = run_finetune(cfg, max_steps=4)
    return ckpt, cfg, out


class TestFinetuneLoop:
    def test_run_validated_and_checkpointed(self, trained_ckpt):
        from animal2vec_tpu.train.checkpoint import CheckpointManager

        ckpt, cfg, out = trained_ckpt
        assert out, "no metrics returned"
        # validation produced derived metrics + mAP
        assert any("f1" in k or "mAP" in k for k in out), out.keys()
        assert CheckpointManager(ckpt).latest_step() == 4

    def test_resume_from_checkpoint(self, trained_ckpt):
        from animal2vec_tpu.train.loop import run_finetune
        from animal2vec_tpu.train.checkpoint import CheckpointManager

        ckpt, cfg, _ = trained_ckpt
        run_finetune(cfg, max_steps=6)  # restores at 4, continues to 6
        assert CheckpointManager(ckpt).latest_step() == 6


class TestPretrainLoop:
    def test_short_pretrain_run_with_validation(self, data_root, tmp_path):
        from animal2vec_tpu.train.loop import run_pretrain

        cfg = e2e_config(data_root, str(tmp_path / "pre"))
        cfg.task.with_labels = False
        cfg.dataset.train_subset = "pretrain"
        cfg.dataset.disable_validation = False
        cfg.dataset.validate_interval_updates = 4
        cfg.model.clone_batch = 2
        cfg = resolve(cfg)
        out = run_pretrain(cfg, max_steps=4)
        assert "train/loss" in out
        assert np.isfinite(out["train/loss"])
        assert out["train/target_var"] > 0.01


class TestInferCLI:
    def test_long_file_events(self, data_root, trained_ckpt, tmp_path):
        from animal2vec_tpu.tools import infer_cli
        from animal2vec_tpu.data.wavio import read_wav, write_wav
        from animal2vec_tpu.config import save_config

        ckpt, cfg, _ = trained_ckpt
        wav0, sr = read_wav(os.path.join(data_root, "wav/08000Hz/clip_0000.wav"))
        long_wav = np.tile(wav0, 5)
        wav_path = str(tmp_path / "long.wav")
        write_wav(wav_path, long_wav, sr)
        cfg_path = str(tmp_path / "cfg.yaml")
        save_config(cfg, cfg_path)
        out_path = str(tmp_path / "events.json")
        infer_cli.main([
            "--wav", wav_path, "--checkpoint", ckpt, "--config", cfg_path,
            "--threshold", "0.05", "--out", out_path,
            "--max-batch-size", "2",
            "task.max_sample_size=8000",
        ])
        events = json.load(open(out_path))
        assert set(events) == set(cfg.task.labels())
        all_ev = [e for v in events.values() for e in v]
        # untrained-ish model: just require structural sanity + absolute times
        for ev in all_ev:
            assert 0 <= ev["onset_s"] <= ev["offset_s"] <= 10.1
            assert 0 <= ev["likelihood"] <= 1

    def test_data_parallel_events_identical(self, data_root, trained_ckpt, tmp_path):
        """--data-parallel -1 (8 virtual devices) produces the same events
        as single-device at the same batch geometry, to within float-drift
        tolerance: the 8-way-partitioned XLA program may differ from the
        single-device one at the ~1e-5 probs level, which can move a
        thresholded event BOUNDARY by a sample or two after the wav-rate
        interpolation. Event count, class structure, and likelihoods must
        match exactly; boundaries within 5 ms. (Changing --max-batch-size
        itself moves boundaries similarly — batch-size sensitivity, not a
        device-count effect.)"""
        from animal2vec_tpu.tools import infer_cli
        from animal2vec_tpu.data.wavio import read_wav, write_wav
        from animal2vec_tpu.config import save_config

        ckpt, cfg, _ = trained_ckpt
        wav0, sr = read_wav(os.path.join(data_root, "wav/08000Hz/clip_0000.wav"))
        wav_path = str(tmp_path / "long.wav")
        write_wav(wav_path, np.tile(wav0, 5), sr)
        cfg_path = str(tmp_path / "cfg.yaml")
        save_config(cfg, cfg_path)
        events = {}
        for dp in (1, -1):
            out_path = str(tmp_path / f"events_dp{dp}.json")
            infer_cli.main([
                "--wav", wav_path, "--checkpoint", ckpt, "--config", cfg_path,
                "--threshold", "0.05", "--out", out_path,
                "--max-batch-size", "8", "--data-parallel", str(dp),
                "task.max_sample_size=8000",
            ])
            events[dp] = json.load(open(out_path))
        assert set(events[1]) == set(events[-1])
        for cls in events[1]:
            a, b = events[1][cls], events[-1][cls]
            assert len(a) == len(b), cls
            for ev1, ev8 in zip(a, b):
                assert abs(ev1["onset_s"] - ev8["onset_s"]) <= 0.005, (cls, ev1, ev8)
                assert abs(ev1["offset_s"] - ev8["offset_s"]) <= 0.005, (cls, ev1, ev8)
                assert abs(ev1["likelihood"] - ev8["likelihood"]) <= 1e-3, (cls, ev1, ev8)


class TestAotCLI:
    def test_bundle_export_and_serve(self, trained_ckpt, tmp_path):
        from animal2vec_tpu.config import save_config
        from animal2vec_tpu.serve import ServingBundle
        from animal2vec_tpu.tools import aot_cli

        ckpt, cfg, _ = trained_ckpt
        cfg_path = str(tmp_path / "cfg.yaml")
        save_config(cfg, cfg_path)
        out_dir = str(tmp_path / "bundle")
        rc = aot_cli.main([
            "--checkpoint", ckpt, "--config", cfg_path, "--out", out_dir,
            "--batch", "2", "--seconds", "1.0", "--no-bf16",
            "finetune.w2v_path=",
        ])
        assert rc == 0
        sb = ServingBundle(out_dir)
        batch = np.random.default_rng(0).normal(size=(2, 8000)).astype(np.float32)
        probs = np.asarray(sb.predict_probs(batch))
        n_cls = len(cfg.task.labels())
        assert probs.shape[0] == 2 and probs.shape[-1] == n_cls
        assert np.isfinite(probs).all() and (probs >= 0).all() and (probs <= 1).all()


class TestExportCLI:
    def test_export_predictions_and_embeddings(self, data_root, trained_ckpt, tmp_path):
        import h5py

        from animal2vec_tpu.tools import export_cli
        from animal2vec_tpu.config import save_config

        ckpt, cfg, _ = trained_ckpt
        cfg_path = str(tmp_path / "cfg.yaml")
        save_config(cfg, cfg_path)
        out_dir = str(tmp_path / "export")
        export_cli.main([
            "--manifest-path", data_root, "--split", "valid_0",
            "--checkpoint", ckpt, "--config", cfg_path, "--out-path", out_dir,
            "--export-predictions", "--export-embeddings",
            "--batch-size", "2", "--average-end-k-layers", "2",
            "task.max_sample_size=8000",
        ])
        files = os.listdir(out_dir)
        pred = [f for f in files if f.startswith("predictions")]
        emb = [f for f in files if f.startswith("embeddings")]
        assert pred and emb
        with h5py.File(os.path.join(out_dir, pred[0])) as f:
            keys = list(f.keys())
            assert len(keys) == 2
            grp = f[keys[0]]
            assert grp["likelihood"].shape == grp["target"].shape
            assert "segmented_likelihood" in grp
        with h5py.File(os.path.join(out_dir, emb[0])) as f:
            grp = f[list(f.keys())[0]]
            assert grp["embedding"].shape[-1] == 32

    def test_data_parallel_device_count_invariance(
        self, data_root, trained_ckpt, tmp_path
    ):
        """--data-parallel -1 (8 virtual devices; batch 2 rounds up to 8,
        so the 2-clip split also exercises the repeated-row padding + n_valid
        trim) writes byte-identical predictions to --data-parallel 1."""
        import h5py
        import jax

        from animal2vec_tpu.tools import export_cli
        from animal2vec_tpu.config import save_config

        ckpt, cfg, _ = trained_ckpt
        cfg_path = str(tmp_path / "cfg.yaml")
        save_config(cfg, cfg_path)
        outs = {}
        for dp in (1, -1):
            out_dir = str(tmp_path / f"export_dp{dp}")
            export_cli.main([
                "--manifest-path", data_root, "--split", "valid_0",
                "--checkpoint", ckpt, "--config", cfg_path,
                "--out-path", out_dir, "--export-predictions",
                "--batch-size", "2", "--data-parallel", str(dp),
                "task.max_sample_size=8000",
            ])
            pred = [f for f in os.listdir(out_dir) if f.startswith("predictions")]
            with h5py.File(os.path.join(out_dir, pred[0])) as f:
                outs[dp] = {
                    k: np.asarray(f[k]["likelihood"]) for k in f.keys()
                }
        assert len(jax.devices()) == 8  # conftest virtual mesh
        assert set(outs[1]) == set(outs[-1]) and len(outs[1]) == 2
        for k in outs[1]:
            np.testing.assert_allclose(
                outs[-1][k], outs[1][k], atol=2e-5, rtol=1e-5,
                err_msg=f"clip {k} likelihood drifted under data-parallel",
            )


class TestPatienceAndGather:
    def test_patience_read_from_config(self, data_root, tmp_path, monkeypatch):
        """checkpoint.patience reaches the EarlyStopper (reference knob
        nn/audio_train_routine.py:233-258); CLI arg overrides it."""
        from animal2vec_tpu.train import loop

        captured = {}
        real = loop.EarlyStopper

        def spy(patience, maximize):
            captured["patience"] = patience
            captured["maximize"] = maximize
            return real(patience, maximize)

        monkeypatch.setattr(loop, "EarlyStopper", spy)
        cfg = e2e_config(data_root, str(tmp_path / "ck"))
        cfg.checkpoint.patience = 3
        loop.run_finetune(cfg, max_steps=0)
        assert captured == {"patience": 3, "maximize": True}
        loop.run_finetune(cfg, max_steps=0, patience=7)
        assert captured["patience"] == 7

    def test_allgather_uneven_single_process(self):
        """Pass-through on one host; empty-host path returns a 0-row array
        instead of skipping the collective (deadlock fix)."""
        from animal2vec_tpu.train.loop import _allgather_uneven

        x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        out = _allgather_uneven(x, np.float32)
        np.testing.assert_array_equal(out, x)
        empty = _allgather_uneven(None, np.float32)
        assert empty.shape[0] == 0


class TestNips4BplusTransfer:
    """NIPS4Bplus-style transfer (BASELINE.json configs[4]): a second sample
    rate, offline resampling through prepare_data_cli, variable-length clips
    (pad/crop + padding-mask path), few-shot manifest subset, no focal class,
    and static length-bucketed training batches (dataset.bucket_lengths —
    the TPU replacement for the reference's length-sorted max_tokens
    batching; one compiled step per bucket)."""

    SR = 16_000
    CONV = "[(9, 7, 1)] + [(16, 4, 2)] + [(16, 3, 2)] + [(16, 2, 2)]"  # /16
    BIRDS = "['chiffchaff', 'wren', 'robin']"

    def _prepare(self, tmp_path):
        import csv

        from animal2vec_tpu.data.wavio import write_wav
        from animal2vec_tpu.data.synthetic import generate
        from animal2vec_tpu.tools import manifest_cli, prepare_data_cli

        rng = np.random.default_rng(5)
        raw = tmp_path / "raw"
        raw.mkdir()
        # two long 22.05 kHz field recordings -> resample + segment to 0.5 s
        rows = []
        for i, secs in enumerate((1.6, 1.1)):
            sr0 = 22_050
            n = int(secs * sr0)
            wav = 0.05 * rng.standard_normal(n).astype(np.float32)
            name = f"rec_{i}.wav"
            write_wav(str(raw / name), wav, sr0)
            rows.append({"AudioFile": name, "StartRelative": 0.1,
                         "EndRelative": 0.35, "Name": "wren", "Focal": ""})
        labels_csv = str(tmp_path / "labels.csv")
        with open(labels_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)

        prep = str(tmp_path / "ds")
        prepare_data_cli.main([
            "--input-folder", str(raw), "--output-folder", prep,
            "--labels", labels_csv, "--unique-labels", self.BIRDS,
            "--segment-length", "0.5", "--resample-rate", str(self.SR),
            "--workers", "1",
        ])
        # prepare nests its output under <base_name>_<len>s (reference layout)
        root = os.path.join(prep, os.listdir(prep)[0])
        segs = os.listdir(os.path.join(root, "wav", f"{self.SR:05d}Hz"))
        assert len(segs) == 5  # 1.6s -> 3 + 1.1s -> 2 segments of 0.5 s

        # variable-length clips straight at 16 kHz (0.2-0.6 s): shorter than
        # max_sample_size -> right-padded with a padding mask
        generate(
            root, n_clips=9, clip_seconds=(0.2, 0.6), sample_rate=self.SR,
            labels=["chiffchaff", "wren", "robin"], events_per_clip=1,
            seed=9, splits=False,
        )

        dest = str(tmp_path / "manifests")
        manifest_cli.main([
            "--root", root, "--dest", dest, "--valid-percent", "0.3",
            "--n-split", "1", "--few-shot",
        ])
        return dest

    def test_few_shot_finetune_at_16khz(self, tmp_path):
        from animal2vec_tpu.config import DistributedConfig
        from animal2vec_tpu.train.loop import run_finetune

        dest = self._prepare(tmp_path)
        cfg = Config()
        cfg.distributed = DistributedConfig(data_parallel=1, model_parallel=1)
        cfg.task = TaskConfig(
            data=dest,
            unique_labels=self.BIRDS,
            conv_feature_layers=self.CONV,
            with_labels=True,
            sample_rate=self.SR,
            max_sample_size=8_000,  # 0.5 s at 16 kHz
            min_sample_size=100,
            do_focal_prediction=False,
        )
        cfg.dataset = DatasetConfig(
            batch_size=2, max_tokens=None, num_workers=1,
            train_subset="train_0_few_3",  # few-shot subset (50%)
            valid_subset="valid_0",
            validate_interval_updates=3, validate_after_updates=0,
            # 0.25 s + 0.5 s buckets: short clips train at their own compiled
            # shape instead of padding to max_sample_size
            bucket_lengths="[4000]",
        )
        cfg.model = tiny_model_cfg()
        cfg.model.unique_labels = self.BIRDS
        cfg.model.conv_feature_layers = self.CONV
        cfg.model.modalities.audio.conv_feature_layers = self.CONV
        cfg.model.modalities.audio.sample_rate = self.SR
        cfg.criterion = CriterionConfig(
            use_focal_loss=True, metric_threshold=0.2, report_accuracy=True,
        )
        cfg.optimization = OptimizationConfig(
            lr=1e-3, max_update=3, warmup_updates=1, update_freq=1,
            weight_decay=0.0, adam_eps=1e-8,
        )
        cfg.checkpoint = CheckpointConfig(
            save_dir=str(tmp_path / "ckpt"), save_interval_updates=0, keep_last=1,
        )
        cfg.common.log_interval = 1
        cfg.task.verbose_tensorboard_logging = True
        cfg.finetune = FinetuneModelConfig(
            apply_mask=True, mask_prob=0.5, mask_length=2,
            average_top_k_layers=2,
            mixup=MixupConfig(source_mixup=0.5, mixup_prob=1.0, target_mixup=True),
        )
        cfg = resolve(cfg)
        out = run_finetune(cfg, max_steps=3)
        assert out and any("f1" in k for k in out), out.keys()

    def test_empty_train_split_raises(self, data_root, tmp_path):
        """A train subset smaller than one batch group must raise, not spin
        the epoch loop forever (regression: few-shot subsets)."""
        from animal2vec_tpu.train.loop import run_finetune

        cfg = e2e_config(data_root, str(tmp_path / "ck"))
        cfg.dataset.batch_size = 64  # > dataset size -> zero full groups
        with pytest.raises(ValueError, match="0 batches"):
            run_finetune(cfg, max_steps=1)
