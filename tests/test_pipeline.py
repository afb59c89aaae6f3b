"""Pipeline parallelism (parallel/pipeline.py): GPipe over the trunk's
"stage" mesh axis must reproduce the plain scanned stack — forward, taps,
streaming teacher targets, and gradients — and compose with dp/tp on the
virtual 8-device CPU mesh (conftest forces it).

The reference has no pipeline parallelism (beyond-parity TPU capability);
equivalence against our own scan path is the correctness contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animal2vec_tpu.config import DistributedConfig, load_config
from animal2vec_tpu.parallel import build_mesh
from animal2vec_tpu.parallel.pipeline import pick_microbatches
from animal2vec_tpu.train.build import build_pretrain_model

OVERRIDES = [
    "model.depth=4", "model.embed_dim=64", "model.num_heads=2",
    "model.clone_batch=1", "model.average_top_k_layers=2",
]


def _models(dp, pp, mp, extra=()):
    cfg = load_config(overrides=OVERRIDES + list(extra))
    cfg.distributed = DistributedConfig(
        data_parallel=dp, model_parallel=mp, pipeline_parallel=pp
    )
    mesh = build_mesh(cfg.distributed)
    pipelined = build_pretrain_model(cfg)
    plain = build_pretrain_model(load_config(overrides=OVERRIDES + list(extra)))
    return mesh, pipelined, plain


def _init(model, b=4, t=8000):
    rng = jax.random.PRNGKey(0)
    src = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, t)).astype(np.float32)
    )
    params = model.init({"params": rng}, src, "AUDIO")["params"]
    return params, src


def _encode(model, params, src, reduce_targets=False):
    M = type(model)
    local = model.apply({"params": params}, src, "AUDIO", method=M.local_features)
    x, taps, _, keeps = model.apply(
        {"params": params}, local, "AUDIO", None, False, None, None, True,
        True, reduce_targets, method=M.encode,
    )
    return x, taps, keeps


class TestPickMicrobatches:
    def test_divisor_cap(self):
        assert pick_microbatches(8, 2) == 4       # cap 2*S
        assert pick_microbatches(8, 2, requested=8) == 8
        assert pick_microbatches(6, 2) == 3       # largest divisor <= 4
        assert pick_microbatches(5, 4) == 5       # cap 8 -> 5 divides 5
        assert pick_microbatches(7, 3) == 1       # prime < cap fallback
        assert pick_microbatches(1, 4) == 1


class TestPipelineEquivalence:
    def test_forward_matches_scan_dp_pp_tp(self):
        mesh, pipelined, plain = _models(dp=2, pp=2, mp=2)
        params, src = _init(plain)
        f = lambda m: jax.jit(lambda p, s: _encode(m, p, s)[:2])
        x0, t0 = f(plain)(params, src)
        with mesh:
            x1, t1 = f(pipelined)(params, src)
        np.testing.assert_allclose(
            np.asarray(x0, np.float32), np.asarray(x1, np.float32), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(t0, np.float32), np.asarray(t1, np.float32), atol=2e-5
        )

    def test_forward_matches_scan_pp4(self):
        # one layer per stage (Lc=1), no tp
        mesh, pipelined, plain = _models(dp=2, pp=4, mp=1)
        params, src = _init(plain)
        f = lambda m: jax.jit(lambda p, s: _encode(m, p, s)[:2])
        x0, t0 = f(plain)(params, src)
        with mesh:
            x1, t1 = f(pipelined)(params, src)
        np.testing.assert_allclose(
            np.asarray(x0, np.float32), np.asarray(x1, np.float32), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(t0, np.float32), np.asarray(t1, np.float32), atol=2e-5
        )

    def test_streaming_targets_and_grads_match(self):
        mesh, pipelined, plain = _models(dp=2, pp=2, mp=2)
        params, src = _init(plain)

        def loss(model):
            def f(p, s):
                x, acc, _ = _encode(model, p, s, reduce_targets=True)
                return jnp.sum(x.astype(jnp.float32) ** 2) + 1e-3 * jnp.sum(acc**2)
            return f

        g0 = jax.jit(jax.grad(loss(plain)))(params, src)
        with mesh:
            g1 = jax.jit(jax.grad(loss(pipelined)))(params, src)
        f0, _ = jax.flatten_util.ravel_pytree(g0)
        f1, _ = jax.flatten_util.ravel_pytree(g1)
        scale = float(jnp.max(jnp.abs(f0))) + 1e-12
        assert float(jnp.max(jnp.abs(f0 - f1))) / scale < 1e-5

    def test_nonstreaming_grads_match(self):
        # backward through the stacked-taps path: out_buf/taps_buf
        # dynamic-update masking is the part most likely to mis-transpose,
        # and the streaming test never exercises it
        mesh, pipelined, plain = _models(dp=2, pp=2, mp=2)
        params, src = _init(plain)

        def loss(model):
            def f(p, s):
                x, taps, _ = _encode(model, p, s, reduce_targets=False)
                return (
                    jnp.sum(x.astype(jnp.float32) ** 2)
                    + 1e-3 * jnp.sum(taps.astype(jnp.float32) ** 2)
                )
            return f

        g0 = jax.jit(jax.grad(loss(plain)))(params, src)
        with mesh:
            g1 = jax.jit(jax.grad(loss(pipelined)))(params, src)
        f0, _ = jax.flatten_util.ravel_pytree(g0)
        f1, _ = jax.flatten_util.ravel_pytree(g1)
        scale = float(jnp.max(jnp.abs(f0))) + 1e-12
        assert float(jnp.max(jnp.abs(f0 - f1))) / scale < 1e-5

    def test_no_stage_axis_falls_back_to_scan(self):
        # pipeline_stages=2 but the active mesh has no "stage" axis: the
        # plain scan must run (bitwise-identical path)
        cfg = load_config(overrides=OVERRIDES)
        cfg.distributed = DistributedConfig(
            data_parallel=4, model_parallel=2, pipeline_parallel=1
        )
        mesh = build_mesh(cfg.distributed)
        cfg.model.pipeline_stages = 2
        pipelined = build_pretrain_model(cfg)
        plain = build_pretrain_model(load_config(overrides=OVERRIDES))
        params, src = _init(plain)
        x0, t0, _ = jax.jit(lambda p, s: _encode(plain, p, s))(params, src)
        with mesh:
            x1, t1, _ = jax.jit(lambda p, s: _encode(pipelined, p, s))(params, src)
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))

    def test_dropout_layerdrop_smoke(self):
        # stochastic paths can't match the scan's rng fold; assert they run
        # and stay finite, and layerdrop reports per-layer keep flags
        extra = [
            "model.encoder_dropout=0.1", "model.attention_dropout=0.1",
            "model.layerdrop=0.3", "model.start_drop_path_rate=0.1",
            "model.end_drop_path_rate=0.1",
        ]
        mesh, pipelined, _ = _models(dp=2, pp=2, mp=2, extra=extra)
        params, src = _init(pipelined)
        model = pipelined
        M = type(model)

        def f(p, s, rng):
            local = model.apply({"params": p}, s, "AUDIO", method=M.local_features)
            rngs = {
                "dropout": jax.random.fold_in(rng, 0),
                "layerdrop": jax.random.fold_in(rng, 1),
            }
            return model.apply(
                {"params": p}, local, "AUDIO", None, False, None, None, True,
                False, False, method=M.encode, rngs=rngs,
            )

        with mesh:
            x, taps, _, keeps = jax.jit(f)(params, src, jax.random.PRNGKey(3))
        assert np.isfinite(np.asarray(x, np.float32)).all()
        assert keeps is not None and keeps.shape == (4,)
        assert set(np.unique(np.asarray(keeps))) <= {0.0, 1.0}


class TestPipelineImageModality:
    def test_image_forward_matches_scan(self):
        # IMAGE trunk runs bias=None (no alibi by default) -> pipelined
        extra = [
            "model.supported_modality=IMAGE",
            "model.modalities.image.input_size=32",
            "model.modalities.image.patch_size=8",
        ]
        mesh, pipelined, plain = _models(dp=2, pp=2, mp=2, extra=extra)
        rng = jax.random.PRNGKey(0)
        src = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 32, 32, 3)).astype(np.float32)
        )
        params = plain.init({"params": rng}, src, "IMAGE")["params"]

        def f(model):
            M = type(model)
            def g(p, s):
                local = model.apply({"params": p}, s, "IMAGE", method=M.local_features)
                x, taps, _, _ = model.apply(
                    {"params": p}, local, "IMAGE", None, False, None, None,
                    True, True, False, method=M.encode,
                )
                return x, taps
            return jax.jit(g)

        x0, t0 = f(plain)(params, src)
        with mesh:
            x1, t1 = f(pipelined)(params, src)
        np.testing.assert_allclose(
            np.asarray(x0, np.float32), np.asarray(x1, np.float32), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(t0, np.float32), np.asarray(t1, np.float32), atol=2e-5
        )


class TestPipelinedTrainLoop:
    def test_run_pretrain_pipelined(self, tmp_path):
        """The real training loop (loader -> sharded step -> checkpoint)
        with distributed.pipeline_parallel=2: proves the CLI-reachable path,
        not just the module. dp=mp=1 keeps the 1-core CPU cost down."""
        from animal2vec_tpu.data.synthetic import generate
        from animal2vec_tpu.train.loop import run_pretrain
        from tests.test_e2e import e2e_config

        root = str(tmp_path / "data")
        generate(root, n_clips=4, clip_seconds=1.0, seed=1)
        cfg = e2e_config(root, str(tmp_path / "ckpt"))
        cfg.task.with_labels = False
        cfg.dataset.train_subset = "pretrain"
        cfg.dataset.disable_validation = True
        cfg.model.depth = 4  # divisible by the 2 stages
        cfg.model.clone_batch = 2
        cfg.distributed = DistributedConfig(
            data_parallel=1, model_parallel=1, pipeline_parallel=2
        )
        from animal2vec_tpu.config import resolve

        cfg = resolve(cfg)
        out = run_pretrain(cfg, max_steps=2)
        assert np.isfinite(out["train/loss"])
        assert out["train/target_var"] > 0.01


class TestPipelinePartitionSpecs:
    def test_stage_axis_on_block_params(self):
        from animal2vec_tpu.parallel.mesh import param_partition_spec

        cfg = DistributedConfig(
            data_parallel=2, model_parallel=2, pipeline_parallel=2
        )
        mesh = build_mesh(cfg)
        assert dict(mesh.shape) == {"data": 2, "stage": 2, "model": 2}
        spec = param_partition_spec(
            ("blocks", "block", "attn", "qkv", "kernel"), (4, 32, 96), mesh
        )
        assert spec == jax.sharding.PartitionSpec("stage", None, "model")
        # norm scales under the stack also carry the depth axis
        spec = param_partition_spec(
            ("blocks", "block", "norm1", "scale"), (4, 32), mesh
        )
        assert spec == jax.sharding.PartitionSpec("stage", None)
        # prenet stacks (no "blocks" in path) stay unsharded on depth
        spec = param_partition_spec(
            ("audio_encoder", "prenet", "stack", "block", "mlp", "fc1", "kernel"),
            (2, 32, 128),
            mesh,
        )
        assert spec[0] is None
