"""Event-segmentation suite tests with hand-constructed golden cases
(SURVEY §4a: interval fusing, canny, IoU/splits/mergers)."""

import numpy as np
import pytest

from animal2vec_tpu.evalx import (
    avg_pool_intervals,
    canny_intervals,
    fuse_predict,
    fuse_to_segmented_predictions,
    intervals_from_binary,
    max_pool_intervals,
    segmented_probs_and_targets,
    threshold_otsu,
)
from animal2vec_tpu.evalx.reports import derived_prf


class TestIntervals:
    def test_basic_runs(self):
        assert intervals_from_binary([0, 1, 1, 0, 1, 0]) == [(1, 2), (4, 4)]
        assert intervals_from_binary([1, 1, 1]) == [(0, 2)]
        assert intervals_from_binary([0, 0]) == []
        assert intervals_from_binary([]) == []

    def test_shift_and_clip(self):
        # end clipped to len-1 after shifting (reference semantics)
        assert intervals_from_binary([0, 0, 1, 1], shift=2) == [(4, 3)]


class TestPooled:
    def test_avg_pool_detects_block(self):
        preds = np.zeros(100)
        preds[30:60] = 0.9
        iv = avg_pool_intervals(preds, fe_sample_rate=10, sigma_s=0.4, threshold=0.5)
        assert len(iv) == 1
        s, e = iv[0]
        assert 28 <= s <= 34 and 55 <= e <= 62

    def test_max_pool_wider_than_avg(self):
        preds = np.zeros(100)
        preds[40:45] = 1.0
        a = avg_pool_intervals(preds, 10, 0.8, 0.5)
        m = max_pool_intervals(preds, 10, 0.8, 0.5)
        len_a = sum(e - s for s, e in a) if a else 0
        len_m = sum(e - s for s, e in m)
        assert len_m >= len_a
        assert len(m) == 1

    def test_short_input(self):
        assert avg_pool_intervals(np.ones(3), 10, 1.0, 0.5) == []


class TestOtsu:
    def test_bimodal(self):
        x = np.concatenate([np.random.default_rng(0).normal(0, 0.1, 500),
                            np.random.default_rng(1).normal(5, 0.1, 500)])
        t = threshold_otsu(x)
        # any threshold separating the two modes is a valid Otsu optimum
        # (between-class variance is flat across the empty valley)
        assert 0.2 < t < 4.8
        assert ((x < t).sum(), (x >= t).sum()) == (500, 500)

    def test_constant(self):
        assert threshold_otsu(np.ones(10)) == 1.0


class TestCanny:
    def test_detects_bumps(self):
        t = np.arange(0, 20, 0.005)  # 200 Hz
        sig = np.zeros_like(t)
        for center in (4.0, 9.0, 14.0):
            sig += 0.9 * np.exp(-((t - center) ** 2) / (2 * 0.05**2))
        iv = canny_intervals(t, sig, sigma_s=0.1, maxfilt_s=0.1,
                             max_duration_s=0.5, lowP=0.125)
        assert 2 <= len(iv) <= 4
        centers = [(a + b) / 2 * 0.005 for a, b in iv]
        for expect in (4.0, 9.0, 14.0):
            assert any(abs(c - expect) < 0.5 for c in centers), (expect, centers)

    def test_flat_signal_no_detections(self):
        t = np.arange(0, 5, 0.005)
        iv = canny_intervals(t, np.full_like(t, 0.01), 0.1, 0.1, 0.5, 0.125)
        assert len(iv) == 0


class TestFusePredict:
    def test_time_offsets_absolute(self):
        # 2 chunks of 10 s at 8 kHz, 200 Hz features
        probs = np.zeros((2, 2000, 1))
        probs[0, 400:600, 0] = 0.9   # 2-3 s absolute
        probs[1, 1000:1200, 0] = 0.9  # 15-16 s absolute
        md = {"sigma_s": 0.1, "metric_threshold": 0.5, "iou_threshold": 0.0,
              "maxfilt_s": 0.1, "max_duration_s": 0.5, "lowP": 0.125}
        ti, ii, li = fuse_predict(80_000, probs, md, 8000, method="avg")
        assert len(ti) == 2
        (on0, off0) = ti[0][0][0]
        assert 1.8 < on0 < 2.3 and 2.8 < off0 < 3.3
        (on1, off1) = ti[1][0][0]
        assert 14.8 < on1 < 15.3 and 15.8 < off1 < 16.3
        # likelihoods are mean prob over the event
        assert 0.5 < li[1][0][0] <= 0.91

    def test_multiplier_shifts_batches(self):
        probs = np.zeros((1, 2000, 1))
        probs[0, 0:200, 0] = 1.0
        md = {"sigma_s": 0.1, "metric_threshold": 0.5}
        ti0, _, _ = fuse_predict(80_000, probs, md, 8000, method="avg", multiplier=0)
        ti3, _, _ = fuse_predict(80_000, probs, md, 8000, method="avg", multiplier=3)
        assert abs(ti3[0][0][0][0] - (ti0[0][0][0][0] + 30.0)) < 0.2


class TestSegmentedMetrics:
    def _md(self, iou=0.0):
        return {"sigma_s": 0.1, "metric_threshold": 0.5, "iou_threshold": iou,
                "maxfilt_s": 0.1, "max_duration_s": 0.5, "lowP": 0.125}

    def test_perfect_prediction(self):
        t, c = 2000, 2
        targets = np.zeros((1, t, c), dtype=np.int64)
        targets[0, 500:700, 0] = 1
        probs = np.zeros((1, t, c), dtype=np.float32)
        probs[0, 500:700, 0] = 0.95
        seg_idx = [[[(500, 699)], []]]
        pr, ta, iou, sp, me = segmented_probs_and_targets(
            targets, seg_idx, probs, self._md(), 8000, 80_000
        )
        # one matched event: target 1 with high mean prob
        matched = ta[:, 0] == 1
        assert matched.sum() == 1
        assert pr[matched, 0][0] > 0.5
        assert iou.max() > 0.5
        assert sp.sum() == 0 and me.sum() == 0

    def test_missed_event_is_false_negative(self):
        t, c = 2000, 1
        targets = np.zeros((1, t, c), dtype=np.int64)
        targets[0, 100:300, 0] = 1
        probs = np.zeros((1, t, c), dtype=np.float32)  # silent model
        seg_idx = [[[(100, 299)]]]
        pr, ta, iou, sp, me = segmented_probs_and_targets(
            targets, seg_idx, probs, self._md(), 8000, 80_000
        )
        assert ta[:, 0].sum() == 1  # one FN slot
        assert pr[ta[:, 0] == 1, 0][0] < 0.5

    def test_split_counting(self):
        t, c = 2000, 1
        targets = np.zeros((1, t, c), dtype=np.int64)
        targets[0, 400:1000, 0] = 1
        probs = np.zeros((1, t, c), dtype=np.float32)
        probs[0, 420:600, 0] = 0.9  # two predictions inside one truth
        probs[0, 750:950, 0] = 0.9
        seg_idx = [[[(400, 999)]]]
        pr, ta, iou, sp, me = segmented_probs_and_targets(
            targets, seg_idx, probs, self._md(), 8000, 80_000
        )
        assert sp.sum() == 2  # one split with 2 valid overlaps
        assert ta[:, 0].sum() == 2  # both overlaps are TP slots

    def test_merge_counting(self):
        t, c = 2000, 1
        targets = np.zeros((1, t, c), dtype=np.int64)
        targets[0, 400:500, 0] = 1
        targets[0, 600:700, 0] = 1
        probs = np.zeros((1, t, c), dtype=np.float32)
        probs[0, 380:720, 0] = 0.9  # one prediction spans both truths
        seg_idx = [[[(400, 499), (600, 699)]]]
        pr, ta, iou, sp, me = segmented_probs_and_targets(
            targets, seg_idx, probs, self._md(), 8000, 80_000
        )
        assert me.sum() == 2  # one merger covering 2 truths

    def test_spurious_prediction_is_false_positive(self):
        t, c = 2000, 1
        targets = np.zeros((1, t, c), dtype=np.int64)
        probs = np.zeros((1, t, c), dtype=np.float32)
        probs[0, 1000:1200, 0] = 0.9
        seg_idx = [[[]]]
        pr, ta, iou, sp, me = segmented_probs_and_targets(
            targets, seg_idx, probs, self._md(), 8000, 80_000
        )
        fp = (ta[:, 0] == 0) & (pr[:, 0] > 0.5)
        assert fp.sum() == 1


class TestDerived:
    def test_prf(self):
        out = derived_prf(tp=8, fp=2, tn=88, fn=2)
        assert out["precision"] == 80.0
        assert out["recall"] == 80.0
        assert out["f1"] == 80.0
        assert out["accuracy"] == 96.0

    def test_nan_on_empty(self):
        out = derived_prf(0, 0, 10, 0)
        assert np.isnan(out["precision"])
