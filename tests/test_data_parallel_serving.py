"""Data-parallel serving (parallel/serving.py): the user-facing multi-chip
aggregate path behind export_cli/infer_cli --data-parallel and bench.py.

The BASELINE inference target (>= 2,000 clips/s, BASELINE.json) is an
8-chip aggregate; these tests prove on the virtual 8-device CPU mesh that
the sharded forward is device-count invariant (1 vs 8 devices produce the
same probabilities) and actually lays the batch out over the "data" axis,
so per-chip throughput multiplies by n_devices on real hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animal2vec_tpu.parallel.serving import DataParallelServing
from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def ft_model_and_vars():
    from animal2vec_tpu.train.build import init_finetune

    cfg = tiny_config(with_labels=True, finetune=True)
    model, state = init_finetune(cfg, jax.random.PRNGKey(0), example_wav_len=800)
    return model, {"params": state.params}


class TestHelpers:
    def test_round_batch(self):
        dp = DataParallelServing({"w": np.zeros((2, 2))}, n_devices=4)
        assert dp.round_batch(1) == 4
        assert dp.round_batch(4) == 4
        assert dp.round_batch(5) == 8
        assert dp.round_batch(12) == 12

    def test_pad_and_shard(self):
        dp = DataParallelServing({"w": np.zeros((2, 2))}, n_devices=4)
        x = np.arange(6 * 3, dtype=np.float32).reshape(6, 3)
        sharded, n_valid = dp.pad_and_shard(x)
        assert n_valid == 6 and sharded.shape == (8, 3)
        out = np.asarray(sharded)
        np.testing.assert_array_equal(out[:6], x)
        assert (out[6:] == 0).all()

    def test_shard_rejects_indivisible(self):
        dp = DataParallelServing({"w": np.zeros((2, 2))}, n_devices=4)
        with pytest.raises(ValueError, match="not divisible"):
            dp.shard(np.zeros((6, 3), np.float32))

    def test_floor_batch(self):
        """User batch sizes are MEMORY CAPS: floored to a device multiple,
        never exceeded (except the one-row-per-device minimum)."""
        dp = DataParallelServing({"w": np.zeros((2, 2))}, n_devices=4)
        assert dp.floor_batch(12) == 12
        assert dp.floor_batch(13) == 12
        assert dp.floor_batch(7) == 4
        assert dp.floor_batch(2) == 4  # minimum one row per device

    def test_too_many_devices(self):
        with pytest.raises(ValueError, match="visible"):
            DataParallelServing({}, n_devices=len(jax.devices()) + 1)

    def test_zero_devices_rejected(self):
        with pytest.raises(ValueError, match="n_devices=0"):
            DataParallelServing({}, n_devices=0)


class TestDeviceCountInvariance:
    def _probs(self, model, variables, n_devices, src):
        dp = DataParallelServing(variables, n_devices=n_devices)

        @jax.jit
        def forward(v, s):
            return jax.nn.sigmoid(
                model.apply(v, s)["encoder_out"].astype(jnp.float32)
            )

        out = forward(dp.variables, dp.shard(src))
        return out, dp

    def test_probs_match_across_device_counts(self, ft_model_and_vars):
        model, variables = ft_model_and_vars
        src = np.random.default_rng(3).normal(size=(8, 800)).astype(np.float32)
        p1, _ = self._probs(model, variables, 1, src)
        p8, dp8 = self._probs(model, variables, -1, src)
        assert dp8.n_devices == len(jax.devices())
        np.testing.assert_allclose(
            np.asarray(p8), np.asarray(p1), atol=2e-5, rtol=1e-5,
            err_msg="data-parallel serving drifted from single-device",
        )

    def test_output_stays_batch_sharded(self, ft_model_and_vars):
        """The forward must actually run SPMD over "data" — replicated
        inputs would silently serialize onto one chip and the aggregate
        throughput claim would be false."""
        model, variables = ft_model_and_vars
        src = np.random.default_rng(4).normal(size=(8, 800)).astype(np.float32)
        out, dp = self._probs(model, variables, -1, src)
        spec = out.sharding.spec
        assert spec and spec[0] == "data", spec
        # each device holds exactly B / n_devices rows
        shard_rows = {s.data.shape[0] for s in out.addressable_shards}
        assert shard_rows == {8 // dp.n_devices}

    def test_padded_tail_matches(self, ft_model_and_vars):
        """pad_and_shard + trim (the infer_cli final-partial-batch path)
        equals forwarding the unpadded rows alone."""
        model, variables = ft_model_and_vars
        src = np.random.default_rng(5).normal(size=(3, 800)).astype(np.float32)
        dp = DataParallelServing(variables, n_devices=-1)

        @jax.jit
        def forward(v, s):
            return jax.nn.sigmoid(
                model.apply(v, s)["encoder_out"].astype(jnp.float32)
            )

        sharded, n_valid = dp.pad_and_shard(src)
        assert n_valid == 3 and sharded.shape[0] == dp.round_batch(3)
        padded = np.asarray(forward(dp.variables, sharded))[:n_valid]
        dp1 = DataParallelServing(variables, n_devices=1)
        lone = np.asarray(forward(dp1.variables, dp1.shard(src)))
        np.testing.assert_allclose(padded, lone, atol=2e-5, rtol=1e-5)
