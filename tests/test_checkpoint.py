"""CheckpointManager tests: save/restore round trip with optax state,
rotation, best-metric tracking, double-save of the same step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from animal2vec_tpu.train.checkpoint import CheckpointManager
from animal2vec_tpu.train.state import FinetuneState


def make_state():
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    return FinetuneState.create(params, tx)


class TestCheckpointManager:
    def test_round_trip_preserves_opt_state(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"))
        state = make_state()
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        state = state.apply_gradients(grads)
        mgr.save(int(state.step), state, extra={"loader": {"epoch": 3}})
        mgr.wait()
        restored, extra = mgr.restore(template=make_state())
        assert int(restored.step) == 1
        assert extra["loader"]["epoch"] == 3
        np.testing.assert_allclose(
            np.asarray(restored.params["dense"]["kernel"]),
            np.asarray(state.params["dense"]["kernel"]),
        )
        # optax NamedTuple structure restored: can keep training
        restored = restored.apply_gradients(grads)
        assert int(restored.step) == 2

    def test_rotation_keeps_last_k(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"), keep_last=2)
        state = make_state()
        for step in (1, 2, 3, 4):
            mgr.save(step, state.replace(step=jnp.asarray(step)))
        mgr.wait()
        assert mgr.all_steps() == [3, 4]

    def test_best_metric_symlink(self, tmp_path):
        d = str(tmp_path / "ck")
        mgr = CheckpointManager(d, keep_last=10, best_metric="f1", maximize=True)
        state = make_state()
        mgr.save(1, state, metrics={"f1": 0.5})
        mgr.save(2, state, metrics={"f1": 0.8})
        mgr.save(3, state, metrics={"f1": 0.6})
        mgr.wait()
        best = os.path.realpath(os.path.join(d, "best"))
        assert best.endswith("step_0000000002")

    def test_double_save_same_step(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"))
        state = make_state()
        mgr.save(5, state)
        mgr.save(5, state)  # must not raise "destination exists"
        mgr.wait()
        assert mgr.all_steps() == [5]

    def test_restore_specific_step(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"))
        state = make_state()
        mgr.save(1, state.replace(step=jnp.asarray(1)))
        mgr.save(2, state.replace(step=jnp.asarray(2)))
        mgr.wait()
        restored, _ = mgr.restore(step=1, template=make_state())
        assert int(restored.step) == 1


def test_restore_warns_on_missing_leaves(tmp_path, caplog):
    """A restore whose checkpoint lacks leaves the template has (config or
    optimizer change) must log loudly instead of silently padding."""
    import logging

    import jax.numpy as jnp
    import optax
    from flax import struct

    from animal2vec_tpu.train.checkpoint import CheckpointManager

    @struct.dataclass
    class S:
        step: jnp.ndarray
        params: dict
        tx: object = struct.field(pytree_node=False, default=None)

    old = S(step=jnp.asarray(3), params={"a": jnp.ones(2)})
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(3, old)
    mgr.wait()

    template = S(step=jnp.asarray(0), params={"a": jnp.zeros(2), "b": jnp.full(3, 7.0)})
    with caplog.at_level(logging.WARNING, logger="animal2vec_tpu"):
        state, _ = mgr.restore(template=template)
    assert any("missing from the checkpoint" in r.message for r in caplog.records)
    np.testing.assert_array_equal(np.asarray(state.params["a"]), np.ones(2))
    np.testing.assert_array_equal(np.asarray(state.params["b"]), np.full(3, 7.0))
    assert int(state.step) == 3
