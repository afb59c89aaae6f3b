"""Native C++ batch loader tests: builds the shared library with g++ and
compares against the pure-Python wav path."""

import os

import numpy as np
import pytest

from animal2vec_tpu.data.synthetic import generate
from animal2vec_tpu.data.wavio import read_wav, write_wav
from animal2vec_tpu.ops.audio import layer_norm_1d

runtime = pytest.importorskip("animal2vec_tpu.runtime")
if not runtime.native_available():
    pytest.skip("g++/native runtime unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native"))
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([16_000, 8_000, 20_000]):
        wav = rng.uniform(-0.5, 0.5, n).astype(np.float32)
        p = os.path.join(root, f"w{i}.wav")
        write_wav(p, wav, 8000)
        paths.append(p)
    return paths


class TestNative:
    def test_wav_info(self, wavs):
        frames, sr = runtime.wav_info_native(wavs[0])
        assert (frames, sr) == (16_000, 8000)

    def test_decode_matches_python(self, wavs):
        out, valid, starts = runtime.decode_batch(
            wavs, target_len=16_000, normalize=False, train=False, expected_sr=8000
        )
        assert out.shape == (3, 16_000)
        ref0, _ = read_wav(wavs[0])
        np.testing.assert_allclose(out[0], ref0, atol=1e-6)
        # short file: right-padded, valid_len recorded
        assert valid[1] == 8_000
        np.testing.assert_allclose(out[1, 8_000:], 0.0)
        # long file: center crop at eval
        assert valid[2] == 16_000 and starts[2] == 2_000

    def test_normalization_matches(self, wavs):
        out, _, _ = runtime.decode_batch(
            [wavs[0]], target_len=16_000, normalize=True, train=False
        )
        ref, _ = read_wav(wavs[0])
        np.testing.assert_allclose(out[0], layer_norm_1d(ref), atol=2e-4)

    def test_train_crop_deterministic_per_seed(self, wavs):
        a1, _, s1 = runtime.decode_batch([wavs[2]], 8_000, False, True, seed=7)
        a2, _, s2 = runtime.decode_batch([wavs[2]], 8_000, False, True, seed=7)
        b, _, s3 = runtime.decode_batch([wavs[2]], 8_000, False, True, seed=8)
        np.testing.assert_array_equal(a1, a2)
        assert s1[0] == s2[0]
        assert 0 <= s1[0] <= 12_000

    def test_bad_file_raises(self, wavs, tmp_path):
        bad = str(tmp_path / "bad.wav")
        open(bad, "wb").write(b"not audio at all")
        with pytest.raises(ValueError):
            runtime.decode_batch([bad], 8_000, False, False)

    def test_sample_rate_mismatch(self, wavs, tmp_path):
        p = str(tmp_path / "sr.wav")
        write_wav(p, np.zeros(100, np.float32), 16_000)
        with pytest.raises(ValueError):
            runtime.decode_batch([p], 8_000, False, False, expected_sr=8000)


class TestLoaderIntegration:
    def test_native_loader_matches_python(self, tmp_path_factory):
        from animal2vec_tpu.data import AudioLabelDataset, BatchLoader
        from tests.test_data import LABELS, MEERKAT_CONV

        root = str(tmp_path_factory.mktemp("nat_loader"))
        generate(root, n_clips=4, clip_seconds=2.0, seed=5)
        ds = AudioLabelDataset(
            os.path.join(root, "pretrain.tsv"),
            return_labels=True,
            unique_labels=LABELS,
            conv_layers=MEERKAT_CONV,
        )
        kw = dict(
            target_len=16_000, batch_size=2, shuffle=False, num_workers=1,
            train=False, drop_last=False,
        )
        nat = list(BatchLoader(ds, use_native=True, **kw))
        py = list(BatchLoader(ds, use_native=False, **kw))
        assert len(nat) == len(py)
        for a, b in zip(nat, py):
            np.testing.assert_allclose(a["source"], b["source"], atol=2e-4)
            np.testing.assert_array_equal(a["target"], b["target"])
