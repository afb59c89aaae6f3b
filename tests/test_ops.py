"""Unit tests for animal2vec_tpu.ops with golden values.

Where the reference semantics are defined by torch ops (focal loss, hann
window, A-weighting), we cross-check against torch computed independently at
test time; everything else has analytically-derived goldens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animal2vec_tpu import ops
from animal2vec_tpu.ops.masking import make_mask_info_static


MEERKAT_CONV = [(127, 63, 1), (512, 10, 5)] + [(512, 3, 2)] * 3 + [
    (512, 3, 1),
    (512, 2, 1),
    (512, 2, 1),
]


class TestConvArith:
    def test_meerkat_stack_10s(self):
        # 10 s @ 8 kHz -> 200 Hz feature rate (a2v_large_pretrain_best.yaml:21-22)
        assert ops.feature_extractor_out_length(80_000, MEERKAT_CONV) == 2000

    def test_label_length_matches_runtime_length(self):
        for t in [80_000, 8_000, 12_345, 79_999]:
            assert ops.label_frame_length(t, MEERKAT_CONV) == (
                ops.feature_extractor_out_length(t, MEERKAT_CONV)
            )

    def test_against_torch_conv(self):
        torch = pytest.importorskip("torch")
        t = 4231
        x = torch.zeros(1, 1, t)
        length = t
        for dim, k, s in MEERKAT_CONV:
            if s == 1:
                conv = torch.nn.Conv1d(1, 1, k, stride=1, padding="same")
            else:
                conv = torch.nn.Conv1d(1, 1, k, stride=s, padding=int(np.ceil(s / 2)))
            x = conv(x)
            pad = ops.same_pad_1d(k) if s == 1 else ops.strided_pad_1d(s)
            length = ops.conv_out_length(length, k, s, pad)
            assert x.shape[-1] == length


class TestSinc:
    def test_filter_shape_and_symmetry(self):
        low, band = ops.mel_init_filterbank(127, 63, 8000)
        filt = np.asarray(ops.sinc_filters(jnp.asarray(low), jnp.asarray(band), 63, 8000))
        assert filt.shape == (127, 63)
        # band-pass filters are symmetric
        np.testing.assert_allclose(filt, filt[:, ::-1], rtol=1e-5, atol=1e-6)

    def test_center_amplitude(self):
        # center tap = 2*band / (2*band) = 1 exactly (nn/sinc.py:207,218)
        low, band = ops.mel_init_filterbank(16, 33, 8000)
        filt = np.asarray(ops.sinc_filters(jnp.asarray(low), jnp.asarray(band), 33, 8000))
        np.testing.assert_allclose(filt[:, 16], 1.0, atol=1e-6)

    def test_against_torch_reference_math(self):
        """Independent torch re-derivation of the band-pass formula."""
        torch = pytest.importorskip("torch")
        import math

        k, c, sr, min_low = 33, 8, 8000, 50.0
        min_band = int(np.ceil(sr / k))
        low_np, band_np = ops.mel_init_filterbank(c, k, sr)
        low_t = torch.tensor(low_np)
        band_t = torch.tensor(band_np)
        low = min_low + torch.abs(low_t)
        high = torch.clamp(low + min_band + torch.abs(band_t), min_low, sr / 2)
        band = (high - low)[:, 0]
        n_lin = torch.linspace(0, (k / 2) - 1, steps=int(k / 2))
        window = 0.53836 - 0.46164 * torch.cos(2 * math.pi * n_lin / k)
        n = 2 * math.pi * torch.arange(-(k - 1) / 2.0, 0).view(1, -1) / sr
        f_lo = torch.matmul(low, n)
        f_hi = torch.matmul(high, n)
        left = (torch.sin(f_hi) - torch.sin(f_lo)) / n * 2 * window
        center = 2 * band.view(-1, 1)
        flt = torch.cat([left, center, torch.flip(left, dims=[1])], dim=1)
        flt = flt / (2 * band[:, None])
        ours = np.asarray(ops.sinc_filters(jnp.asarray(low_np), jnp.asarray(band_np), k, sr))
        np.testing.assert_allclose(ours, flt.numpy(), rtol=1e-5, atol=1e-6)


class TestAlibi:
    def test_slopes_16_heads(self):
        s = ops.alibi_slopes(16)
        # start = 2^(-0.5); geometric ratio 2^(-0.5)
        expect = 2.0 ** (-0.5 * np.arange(1, 17))
        np.testing.assert_allclose(s, expect, rtol=1e-6)

    def test_bias_diag_zero_symmetric(self):
        b = np.asarray(ops.alibi_bias_1d(32, 4))
        assert b.shape == (4, 32, 32)
        np.testing.assert_allclose(np.diagonal(b, axis1=1, axis2=2), 0.0)
        np.testing.assert_allclose(b, np.swapaxes(b, 1, 2))
        assert b[0, 0, 1] == -ops.alibi_slopes(4)[0]

    def test_nonpow2_heads(self):
        s = ops.alibi_slopes(6)
        assert len(s) == 6 and np.all(s > 0)

    def test_2d_manhattan(self):
        b = np.asarray(ops.alibi_bias_2d(16, 2))
        assert b.shape == (2, 16, 16)
        # dist between (0,0) and (3,3) = 6
        np.testing.assert_allclose(b[0, 0, 15], -6 * ops.alibi_slopes(2)[0], rtol=1e-6)


class TestFocalLoss:
    def test_against_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(64, 12)).astype(np.float32)
        targets = (rng.random((64, 12)) < 0.3).astype(np.float32)
        lt = torch.tensor(logits)
        tt = torch.tensor(targets)
        p = torch.sigmoid(lt)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(lt, tt, reduction="none")
        p_t = p * tt + (1 - p) * (1 - tt)
        ref = ce * (1 - p_t) ** 2
        alpha_t = 0.25 * tt + 0.75 * (1 - tt)
        ref = alpha_t * ref
        ours = np.asarray(ops.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_reductions(self):
        x = jnp.ones((4, 3))
        t = jnp.zeros((4, 3))
        full = ops.sigmoid_focal_loss(x, t)
        assert np.isclose(
            float(ops.sigmoid_focal_loss(x, t, reduction="sum")), float(full.sum())
        )


class TestD2vLoss:
    def test_mse_scaling(self):
        x = jnp.asarray(np.ones((5, 16), np.float32))
        y = jnp.zeros((5, 16))
        loss = ops.d2v_regression_loss(x, y)
        np.testing.assert_allclose(np.asarray(loss), 1.0 / 4.0, rtol=1e-6)  # 1/sqrt(16)

    def test_smooth_l1(self):
        x = jnp.asarray(np.full((2, 4), 3.0, np.float32))
        y = jnp.zeros((2, 4))
        loss = ops.d2v_regression_loss(x, y, loss_beta=1.0, loss_scale=1.0)
        np.testing.assert_allclose(np.asarray(loss), 2.5, rtol=1e-6)


class TestMasking:
    def test_span_mask_static_count(self):
        rng = jax.random.PRNGKey(0)
        mask = ops.span_mask(rng, 8, 2000, 1.5, 2)
        counts = np.asarray(mask.sum(axis=1))
        assert np.all(counts == counts[0])
        frac = counts[0] / 2000
        # ~93% masked for the MeerKAT pretrain config (SURVEY §6)
        assert 0.90 < frac < 0.96

    def test_span_structure(self):
        # with moderate prob, masked tokens should mostly come in >=L runs
        rng = jax.random.PRNGKey(1)
        mask = np.asarray(ops.span_mask(rng, 4, 500, 0.3, 5))
        runs = []
        for row in mask:
            n = 0
            for v in row:
                if v:
                    n += 1
                elif n:
                    runs.append(n)
                    n = 0
            if n:
                runs.append(n)
        assert np.median(runs) >= 3

    def test_mask_info_roundtrip(self):
        rng = jax.random.PRNGKey(2)
        b, t, d = 3, 64, 8
        mask = ops.span_mask(rng, b, t, 0.5, 4)
        m = int(np.asarray(mask[0]).sum())
        info = make_mask_info_static(mask, m)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(b, t, d)).astype(np.float32))
        kept = ops.gather_keep(x, info)
        assert kept.shape == (b, t - m, d)
        # kept tokens are exactly the unmasked ones, in original order
        for bi in range(b):
            expect = np.asarray(x[bi])[np.asarray(info.mask[bi]) == 0]
            np.testing.assert_allclose(np.asarray(kept[bi]), expect)
        # ids_restore inverts ids_shuffle
        shuffled = jnp.take_along_axis(x, info.ids_shuffle[..., None], axis=1)
        restored = jnp.take_along_axis(shuffled, info.ids_restore[..., None], axis=1)
        np.testing.assert_allclose(np.asarray(restored), np.asarray(x))

    def test_apply_mask_zero(self):
        rng = jax.random.PRNGKey(3)
        mask = ops.span_mask(rng, 2, 32, 0.5, 2)
        m = int(np.asarray(mask[0]).sum())
        info = make_mask_info_static(mask, m)
        x = jnp.ones((2, 32, 4))
        out = np.asarray(ops.apply_mask(x, info, zero_mask=True))
        np.testing.assert_allclose(out.sum(axis=(1, 2)), 4 * (32 - m))

    def test_scatter_mask_tokens_restores_positions(self):
        from animal2vec_tpu.ops.masking import scatter_with_mask_tokens

        rng = jax.random.PRNGKey(4)
        b, t, d = 2, 16, 4
        mask = ops.span_mask(rng, b, t, 0.4, 2)
        m = int(np.asarray(mask[0]).sum())
        info = make_mask_info_static(mask, m)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(b, t, d)).astype(np.float32))
        kept = ops.gather_keep(x, info)
        full = scatter_with_mask_tokens(kept, info, jax.random.PRNGKey(5), noise_std=0.0)
        full = np.asarray(full)
        for bi in range(b):
            keep_pos = np.asarray(info.mask[bi]) == 0
            np.testing.assert_allclose(full[bi][keep_pos], np.asarray(x[bi])[keep_pos])
            np.testing.assert_allclose(full[bi][~keep_pos], 0.0)

    def test_random_masking_ratio(self):
        info = ops.random_masking(jax.random.PRNGKey(0), 4, 100, 0.75)
        assert info.ids_keep.shape == (4, 25)
        assert np.all(np.asarray(info.mask.sum(axis=1)) == 75)

    def test_masked_alibi_gather(self):
        rng = jax.random.PRNGKey(6)
        b, h, t = 2, 2, 16
        mask = ops.span_mask(rng, b, t, 0.5, 2)
        m = int(np.asarray(mask[0]).sum())
        info = make_mask_info_static(mask, m)
        bias = jnp.broadcast_to(ops.alibi_bias_1d(t, h)[None], (b, h, t, t))
        small = np.asarray(ops.masked_alibi(bias, info))
        assert small.shape == (b, h, t - m, t - m)
        ik = np.asarray(info.ids_keep)
        for bi in range(b):
            np.testing.assert_allclose(
                small[bi, 0], np.asarray(bias[bi, 0])[np.ix_(ik[bi], ik[bi])]
            )

    def test_block_mask_2d(self):
        mask = np.asarray(ops.block_mask_2d(jax.random.PRNGKey(0), 4, 196, 0.7, 3))
        counts = mask.sum(axis=1)
        assert np.all(counts == counts[0])
        assert abs(counts[0] - int(196 * 0.7)) <= 1

    def test_jit_static_shapes(self):
        @jax.jit
        def f(key):
            mask = ops.span_mask(key, 4, 256, 1.5, 2)
            m = ops.expected_span_mask_tokens(256, 1.5, 2)
            info = make_mask_info_static(mask, m)
            return info.ids_keep

        out = f(jax.random.PRNGKey(0))
        m = ops.expected_span_mask_tokens(256, 1.5, 2)
        assert out.shape == (4, 256 - m)


class TestMixup:
    def test_gain_against_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        snd = rng.normal(size=(3, 8000)).astype(np.float32)
        fs, wl = 8000, 0.1
        n_fft = round(fs * wl)
        st = torch.tensor(snd).unfold(-1, n_fft, n_fft // 2)
        w = torch.hann_window(n_fft) * st
        spec = torch.fft.rfft(w)
        power = spec.abs() ** 2
        aw = torch.tensor(ops.a_weighting_table(fs, n_fft))
        g = (power * aw).sum(-1)
        g = torch.maximum(g, torch.tensor(10 ** (-80.0 / 10)))
        ref = 10 * torch.log10(g)
        ours = np.asarray(ops.compute_gain(jnp.asarray(snd), fs=fs, wl=wl))
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-4)

    def test_mixup_energy_preserving(self):
        rng = np.random.default_rng(3)
        src = rng.normal(size=(8, 4000)).astype(np.float32)
        mixed, _ = ops.bc_mixup(
            jax.random.PRNGKey(0),
            jnp.asarray(src),
            None,
            source_mixup=0.5,
            mixup_prob=1.0,
            same_mixup=True,
            gain_mode="A_weighting",
            sample_rate=8000,
            mixing_window_length=0.05,
            target_mixup=False,
        )
        mixed = np.asarray(mixed)
        assert mixed.shape == src.shape
        assert not np.allclose(mixed, src)
        # power roughly preserved by the 1/sqrt(p^2+(1-p)^2) normalization
        assert 0.5 < mixed.var() / src.var() < 2.0

    def test_mixup_disabled(self):
        src = jnp.ones((2, 100))
        out, _ = ops.bc_mixup(
            jax.random.PRNGKey(0), src, None, -1.0, 1.0, True, "A_weighting", 8000, 0.1, False
        )
        assert out is src

    def test_target_mixup(self):
        rng = np.random.default_rng(4)
        src = rng.normal(size=(4, 800)).astype(np.float32)
        tgt = (rng.random((4, 10, 3)) < 0.5).astype(np.float32)
        _, t2 = ops.bc_mixup(
            jax.random.PRNGKey(1),
            jnp.asarray(src),
            jnp.asarray(tgt),
            0.5,
            1.0,
            True,
            "none",
            8000,
            0.1,
            True,
        )
        t2 = np.asarray(t2)
        assert t2.shape == tgt.shape
        assert t2.max() <= 1.0 + 1e-6 and t2.min() >= -1e-6


class TestStats:
    def test_confusion(self):
        preds = jnp.asarray([[1, 0, 1], [0, 0, 1]])
        tgts = jnp.asarray([[1, 1, 0], [0, 0, 1]])
        tp, fp, tn, fn = ops.confusion_counts(preds, tgts)
        assert (int(tp), int(fp), int(tn), int(fn)) == (2, 1, 2, 1)

    def test_compute_var(self):
        y = np.random.default_rng(0).normal(size=(100, 8)).astype(np.float32)
        ours = float(ops.compute_var(jnp.asarray(y)))
        ref = float(np.sqrt(y.var(axis=0, ddof=1) + 1e-6).mean())
        assert np.isclose(ours, ref, rtol=1e-5)

    def test_annealed_rate(self):
        assert float(ops.get_annealed_rate(0.9997, 1.0, 0, 300_000)) == pytest.approx(0.9997)
        assert float(ops.get_annealed_rate(0.9997, 1.0, 300_000, 300_000)) == 1.0
        assert float(ops.get_annealed_rate(0.9997, 1.0, 150_000, 300_000)) == pytest.approx(
            (0.9997 + 1.0) / 2
        )


class TestFrames:
    def test_fast_path_matches_reference_path(self):
        wav_len = 80_000
        starts, ends, cats = [100, 4000, 40_000], [900, 12_000, 41_000], [0, 3, 11]
        focal = [1, 0, 1]
        slow = ops.rasterize_labels(wav_len, 12, starts, ends, cats, focal)
        slow_ds = ops.downsample_targets(slow, wav_len, MEERKAT_CONV)
        from animal2vec_tpu.ops.frames import frame_targets

        fast = frame_targets(wav_len, 12, starts, ends, cats, MEERKAT_CONV, focal)
        np.testing.assert_array_equal(slow_ds, fast)
        assert fast.shape == (2000, 12)
        assert fast[:, 0].sum() > 0 and fast[:, 11].sum() > 0

    def test_ce_path(self):
        from animal2vec_tpu.ops.frames import frame_targets

        out = frame_targets(8000, 12, [0], [4000], [2], MEERKAT_CONV, multilabel=False)
        assert out.ndim == 1
        assert set(np.unique(out)) == {0, 3}


class TestChunking:
    def test_chunk_long_file(self):
        wav = np.random.default_rng(0).normal(size=(257_000,)).astype(np.float32)
        batches = ops.chunk_and_normalize(wav, 10.0, 8000, True, 2)
        assert sum(b.shape[0] for b in batches) == 4  # ceil(257000/80000)
        assert all(b.shape[1] == 80_000 for b in batches)
        assert batches[0].shape[0] == 2
        # normalized per segment
        np.testing.assert_allclose(batches[0][0].mean(), 0.0, atol=1e-4)
        np.testing.assert_allclose(batches[0][0].std(), 1.0, atol=1e-3)

    def test_short_file(self):
        wav = np.ones(4000, np.float32)
        batches = ops.chunk_and_normalize(wav, 10.0, 8000, False, 4)
        assert len(batches) == 1 and batches[0].shape == (1, 4000)


class TestConvMM:
    """conv1d_mm (stride-grouped matmul decomposition) must match
    lax.conv_general_dilated bit-for-... well, to fp32 tolerance, including
    lengths where (t+pads-k) % stride exceeds n_taps*stride-k (the
    negative-pad regression: t=13,k=5,s=3,pad=(0,0))."""

    @pytest.mark.parametrize(
        "t,k,s,pad",
        [
            (13, 5, 3, (0, 0)),     # regression: need < t + pad[0]
            (800, 10, 5, (3, 3)),   # MeerKAT L1 shape class
            (200, 3, 2, (1, 1)),    # strided small kernel
            (50, 3, 1, (1, 1)),     # stride-1 'same'
            (50, 2, 1, (0, 1)),     # even kernel torch-'same' split
            (17, 4, 3, (2, 2)),     # k > s, non-divisible tail
            (16, 7, 4, (2, 2)),     # n_taps rounding up
        ],
    )
    def test_matches_xla_conv(self, t, k, s, pad, rng):
        import jax
        from animal2vec_tpu.ops.conv_mm import conv1d_mm

        c_in, c_out, b = 6, 8, 2
        x = jnp.asarray(rng.normal(size=(b, t, c_in)).astype(np.float32))
        kern = jnp.asarray(rng.normal(size=(k, c_in, c_out)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(c_out,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, kern, window_strides=(s,), padding=[pad],
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + bias
        got = conv1d_mm(x, kern, bias, s, pad)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


class TestLanePackedGroupedConv:
    """lane_pack fuses 64-wide conv groups into 128-wide super-groups via a
    block-diagonal kernel (ops/conv_arith.expand_grouped_kernel) — must be
    numerically identical to the plain grouped conv for every shipped shape
    (pos-conv 1024/16, decoder 768/16, tiny test configs)."""

    @pytest.mark.parametrize(
        "groups,cin_g,cout,k,stride",
        [
            (16, 64, 1024, 19, 1),   # a2v-large pos conv (packs 2 -> G=8)
            (16, 48, 768, 7, 1),     # decoder (48*2 % 128 != 0 -> no pack)
            (2, 64, 128, 3, 1),      # tiny config pos conv
            (8, 64, 512, 5, 1),
        ],
    )
    def test_matches_plain_grouped_conv(self, groups, cin_g, cout, k, stride):
        from animal2vec_tpu.models.modules import conv1d_same

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 41, groups * cin_g)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, cin_g, cout)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        y0 = conv1d_same(x, w, b, stride, groups, lane_pack=False)
        y1 = conv1d_same(x, w, b, stride, groups, lane_pack=True)
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), rtol=2e-6, atol=2e-4
        )

    def test_pack_factor_policy(self):
        from animal2vec_tpu.ops.conv_arith import lane_pack_factor

        assert lane_pack_factor(16, 64) == 2     # 64 * 2 = 128
        assert lane_pack_factor(16, 48) == 1     # 96 not a lane multiple
        assert lane_pack_factor(16, 128) == 1    # already dense
        assert lane_pack_factor(1, 64) == 1      # dense conv untouched
        assert lane_pack_factor(3, 64) == 1      # 2 does not divide 3
        # decoder opt-in (DecoderConfig.lane_pack_max): 48 * 8 = 384 = 3*128
        assert lane_pack_factor(16, 48, max_pack=16) == 8

    def test_decoder_pack8_matches_plain(self):
        from animal2vec_tpu.models.modules import conv1d_same

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 41, 768)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(7, 48, 768)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(768,)).astype(np.float32))
        y0 = conv1d_same(x, w, b, 1, 16, lane_pack=False)
        y8 = conv1d_same(x, w, b, 1, 16, lane_pack=True, lane_pack_max=16)
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y8), rtol=2e-6, atol=2e-4
        )

    def test_expand_kernel_block_structure(self):
        from animal2vec_tpu.ops.conv_arith import expand_grouped_kernel

        k = jnp.asarray(np.random.default_rng(1).normal(size=(3, 64, 256)))
        e = expand_grouped_kernel(k, groups=4, pack=2)
        assert e.shape == (3, 128, 256)
        # group 0 (out 0:64) reads rows 0:64; group 1 (out 64:128) rows 64:128
        np.testing.assert_array_equal(np.asarray(e[:, :64, :64]), np.asarray(k[:, :, :64]))
        assert not np.asarray(e[:, 64:, :64]).any()
        np.testing.assert_array_equal(np.asarray(e[:, 64:, 64:128]), np.asarray(k[:, :, 64:128]))
        assert not np.asarray(e[:, :64, 64:128]).any()
