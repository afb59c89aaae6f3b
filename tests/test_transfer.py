"""The science claim: pretraining HELPS downstream detection.

The entire point of the reference (README.md:12 — SOTA few-shot call
detection via self-supervised pretraining) is that the data2vec objective
(/root/reference/nn/data2vec2.py:779-858) produces representations that
transfer. Mechanics tests (loss decreases, EMA/masking/target parity vs
the torch mirror) cannot catch whole-objective bugs — e.g. a wrong
target-layer ordering still trains. This test can: pretrain on synthetic
structured audio, then compare a frozen-encoder linear probe initialized
from the pretrained encoder against the identical probe on the randomly
initialized encoder, at equal finetune steps and equal data.

Corpus design: three call classes are band-limited tone bursts at
separated carriers (600 / 1600 / 2800 Hz at 8 kHz) over white noise — a
structure the sinc/conv frontend + trunk can represent, so d2v masked
prediction must learn spectral content to predict teacher targets.
Protocol: the probe (classifier head only; freeze_finetune_updates >> M,
the reference's freeze-then-unfreeze gate nn/wav2vec2.py:442) isolates
FEATURE quality — both arms train the same linear head on the same
labeled clips, so the only difference is the encoder weights. The metric
is threshold-free mean average precision over the three classes
(thresholded F1 at a fixed 0.5 adds calibration noise the focal loss
does not control for).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animal2vec_tpu.train.build import init_finetune, init_pretrain
from animal2vec_tpu.train.finetune_step import (
    make_finetune_eval_step,
    make_finetune_train_step,
)
from animal2vec_tpu.train.pretrain import make_pretrain_train_step
from tests.test_train import tiny_config

SR = 8_000
T = 800
T_FEAT = 200
BANDS = (600.0, 1600.0, 2800.0)  # class-dependent carriers


def make_clips(rng: np.random.Generator, n: int):
    """n clips: white noise + one band-limited tone burst of a random
    class; frame-rate multi-hot targets mark the burst extent."""
    src = np.zeros((n, T), np.float32)
    tgt = np.zeros((n, T_FEAT, 4), np.float32)
    for i in range(n):
        src[i] = 0.05 * rng.standard_normal(T)
        cls = int(rng.integers(0, 3))
        dur = int(rng.integers(T // 4, T // 2))
        s = int(rng.integers(0, T - dur))
        f0 = BANDS[cls] * rng.uniform(0.92, 1.08)
        tt = np.arange(dur) / SR
        src[i, s:s + dur] += 0.5 * np.sin(
            2 * np.pi * f0 * tt + rng.uniform(0, 2 * np.pi)
        )
        fs, fe = s * T_FEAT // T, (s + dur) * T_FEAT // T
        tgt[i, fs:fe, cls] = 1.0
    return src, tgt


def mean_ap(probs: np.ndarray, tgt: np.ndarray) -> float:
    from sklearn.metrics import average_precision_score

    return float(
        np.mean(
            [
                average_precision_score(
                    (tgt[..., c] >= 0.5).ravel(), probs[..., c].ravel()
                )
                for c in range(3)
            ]
        )
    )


def _configs():
    cfg = tiny_config(with_labels=True, finetune=True)
    cfg.finetune.freeze_finetune_updates = 10**6  # pure linear probe
    cfg.finetune.apply_mask = False
    import copy

    probe_cfg = copy.deepcopy(cfg)
    probe_cfg.optimization.lr = 5e-3
    probe_cfg.optimization.max_update = 10**6  # flat lr after warmup
    return cfg, probe_cfg


def _pretrain(cfg, seed: int, steps: int):
    rng = np.random.default_rng(seed)
    model, state = init_pretrain(cfg, jax.random.PRNGKey(seed), example_wav_len=T)
    step = jax.jit(make_pretrain_train_step(model, cfg))
    key = jax.random.PRNGKey(seed + 1)
    first = last = None
    for i in range(steps):
        src, _ = make_clips(rng, 8)
        key, k = jax.random.split(key)
        state, m = step(state, {"source": jnp.asarray(src[None])}, k)
        loss = float(m["loss"])
        first = loss if first is None else first
        last = loss
    return state.params, first, last


def _probe(probe_cfg, seed: int, steps: int, pretrained_params, n_labeled=16):
    probe_src, probe_tgt = make_clips(np.random.default_rng(seed + 100), n_labeled)
    eval_src, eval_tgt = make_clips(np.random.default_rng(seed + 200), 64)
    model, state = init_finetune(
        probe_cfg, jax.random.PRNGKey(seed + 2), example_wav_len=T,
        pretrained_params=pretrained_params,
    )
    step = jax.jit(make_finetune_train_step(model, probe_cfg))
    eval_fn = jax.jit(make_finetune_eval_step(model, probe_cfg))
    key = jax.random.PRNGKey(seed + 3)
    for i in range(steps):
        idx = np.random.default_rng((seed, i)).integers(0, n_labeled, 8)
        batch = {
            "source": jnp.asarray(probe_src[idx][None]),
            "target": jnp.asarray(probe_tgt[idx][None]),
        }
        key, k = jax.random.split(key)
        state, _ = step(state, batch, k)
    ev = eval_fn(
        state,
        {"source": jnp.asarray(eval_src), "target": jnp.asarray(eval_tgt)},
        jax.random.PRNGKey(0),
    )
    return mean_ap(np.asarray(ev["_predictions"]), eval_tgt)


class TestPretrainingTransfers:
    def test_pretrained_features_beat_scratch(self):
        """Across seeds: d2v loss decreases during pretraining AND the
        pretrained-encoder probe scores higher mAP than the same probe on
        the random encoder."""
        gaps = []
        for seed in (0, 1):
            cfg, probe_cfg = _configs()
            params, first, last = _pretrain(cfg, seed, steps=150)
            assert last < 0.6 * first, (
                f"d2v pretraining did not learn (loss {first:.2f}->{last:.2f})"
            )
            ap_pre = _probe(probe_cfg, seed, 200, params)
            ap_scratch = _probe(probe_cfg, seed, 200, None)
            gaps.append(ap_pre - ap_scratch)
            assert ap_pre > ap_scratch, (
                f"seed {seed}: pretrained probe mAP {ap_pre:.3f} <= "
                f"from-scratch {ap_scratch:.3f}"
            )
        assert np.mean(gaps) > 0.03, (
            f"pretraining advantage too small to be signal: gaps={gaps}"
        )
