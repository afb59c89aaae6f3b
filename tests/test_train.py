"""Train-layer tests: overfit-tiny integration (SURVEY §4d), EMA semantics,
optimizer masks/schedules, and the pjit/GSPMD sharded step on the virtual
8-device CPU mesh (SURVEY §4c)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import flax.traverse_util as tu

from animal2vec_tpu.config import (
    Config,
    CriterionConfig,
    DistributedConfig,
    FinetuneModelConfig,
    MixupConfig,
    OptimizationConfig,
    TaskConfig,
    resolve,
)
from tests.test_models import tiny_model_cfg, TINY_CONV, LABELS
from animal2vec_tpu.train.build import (
    build_finetune_model,
    init_finetune,
    init_pretrain,
    load_pretrained_into_finetune,
)
from animal2vec_tpu.train.optim import (
    build_lr_schedule,
    build_optimizer,
    decay_mask,
    layer_decay_scales,
)
from animal2vec_tpu.train.pretrain import (
    make_pretrain_eval_step,
    make_pretrain_train_step,
    pretrain_loss,
)
from animal2vec_tpu.train.finetune_step import (
    make_finetune_eval_step,
    make_finetune_train_step,
)
from animal2vec_tpu.train.state import ema_subset, merge_params


def tiny_config(with_labels=False, finetune=False, update_freq=1):
    cfg = Config()
    cfg.task = TaskConfig(
        unique_labels=LABELS,
        conv_feature_layers=TINY_CONV,
        with_labels=with_labels,
        sample_rate=8000,
    )
    cfg.model = tiny_model_cfg()
    cfg.model.clone_batch = 2
    cfg.model.ema_decay = 0.99
    cfg.model.ema_end_decay = 0.999
    cfg.model.mixup = MixupConfig(source_mixup=-1.0)  # deterministic tests
    cfg.criterion = CriterionConfig(use_focal_loss=True, metric_threshold=0.25)
    cfg.optimization = OptimizationConfig(
        lr=1e-3,
        max_update=200,
        warmup_updates=10,
        update_freq=update_freq,
        clip_norm=1.0,
        adam_eps=1e-6,
    )
    if finetune:
        # reference finetune uses plain adam, no weight decay
        # (finetune_mixup_100.yaml:67-70)
        cfg.optimization.weight_decay = 0.0
        cfg.finetune = FinetuneModelConfig(
            freeze_finetune_updates=5,
            apply_mask=True,
            mask_prob=0.5,
            mask_length=2,
            mask_channel_prob=0.25,
            mask_channel_length=4,
            average_top_k_layers=2,
            mixup=MixupConfig(source_mixup=-1.0),
        )
    return resolve(cfg)


def synth_batch(rng, b=2, t=800, accum=None, labels=False, n_classes=4, t_feat=200):
    src = rng.normal(size=(b, t)).astype(np.float32)
    batch = {"source": jnp.asarray(src)}
    if labels:
        tgt = (rng.random((b, t_feat, n_classes)) < 0.2).astype(np.int64)
        batch["target"] = jnp.asarray(tgt)
    if accum:
        batch = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (accum,) + x.shape), batch
        )
    return batch


class TestOptim:
    def test_schedule_warmup_and_decay(self):
        cfg = OptimizationConfig(lr=1e-3, warmup_updates=100, max_update=1000, min_lr=1e-5)
        s = build_lr_schedule(cfg)
        assert float(s(0)) == pytest.approx(0.0, abs=1e-9)
        assert float(s(100)) == pytest.approx(1e-3, rel=1e-5)
        assert float(s(1000)) == pytest.approx(1e-5, rel=1e-3)
        assert float(s(50)) == pytest.approx(5e-4, rel=1e-4)

    def test_decay_mask(self):
        params = {
            "blocks": {"block": {"attn": {"qkv": {"kernel": jnp.zeros((3, 4, 12)), "bias": jnp.zeros((3, 12))}}}},
            "audio_encoder": {"alibi_scale": jnp.zeros((1, 1, 4, 1, 1)),
                              "act_0": {"p_swish_alpha": jnp.zeros((9,))}},
            "proj": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
        }
        m = tu.flatten_dict(decay_mask(params))
        assert m[("blocks", "block", "attn", "qkv", "kernel")] is True
        assert m[("blocks", "block", "attn", "qkv", "bias")] is False
        assert m[("audio_encoder", "alibi_scale")] is False
        assert m[("audio_encoder", "act_0", "p_swish_alpha")] is False
        assert m[("proj", "kernel")] is True
        assert m[("proj", "bias")] is False

    def test_layer_decay_scales(self):
        params = {
            "encoder": {
                "blocks": {"block": {"w": jnp.zeros((3, 4, 4))}},
                "audio_encoder": {"context_encoder": {"blocks": {"block": {"w": jnp.zeros((2, 4))}}}},
            },
            "proj": {"kernel": jnp.zeros((4, 4))},
        }
        scales = layer_decay_scales(
            params, 0.9,
            ("encoder", "audio_encoder", "context_encoder", "blocks", "block"),
            ("encoder", "blocks", "block"),
            2, 3,
        )
        f = tu.flatten_dict(scales)
        trunk = np.asarray(f[("encoder", "blocks", "block", "w")]).squeeze()
        prenet = np.asarray(f[("encoder", "audio_encoder", "context_encoder", "blocks", "block", "w")]).squeeze()
        # 5 layers + 1 head level: lid 1..5, scale = 0.9^(6-lid)
        np.testing.assert_allclose(prenet, [0.9**5, 0.9**4], rtol=1e-6)
        np.testing.assert_allclose(trunk, [0.9**3, 0.9**2, 0.9**1], rtol=1e-6)
        assert float(np.asarray(f[("proj", "kernel")])) == 1.0


class TestPretrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        model, state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        return cfg, model, state

    def test_loss_runs_and_is_finite(self, setup):
        cfg, model, state = setup
        batch = synth_batch(np.random.default_rng(0))
        loss, metrics = pretrain_loss(
            state.params, state.ema_params, batch, jax.random.PRNGKey(1), model, cfg
        )
        assert np.isfinite(float(loss))
        assert float(metrics["target_var"]) > 0.01
        assert float(metrics["pred_var"]) > 0.001
        assert 0.3 < float(metrics["masked_pct"]) < 0.8

    def test_overfit_tiny(self, setup):
        cfg, model, state = setup
        step_fn = jax.jit(make_pretrain_train_step(model, cfg))
        batch = synth_batch(np.random.default_rng(1), accum=1)
        losses = []
        for i in range(12):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(42))  # fixed mask
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.9, losses
        assert int(state.step) == 12

    def test_ema_updates_and_anneals(self, setup):
        cfg, model, state = setup
        step_fn = jax.jit(make_pretrain_train_step(model, cfg))
        batch = synth_batch(np.random.default_rng(2), accum=1)
        ema0 = tu.flatten_dict(state.ema_params)
        state2 = state
        for i in range(3):  # step 1 has lr=0 (warmup from 0), so take a few
            state2, metrics = step_fn(state2, batch, jax.random.PRNGKey(i))
        ema1 = tu.flatten_dict(state2.ema_params)
        max_diff = max(
            float(np.abs(np.asarray(ema0[k]) - np.asarray(ema1[k])).max()) for k in ema0
        )
        assert max_diff > 0.0
        # decay in [ema_decay, ema_end_decay] * 1000
        assert cfg.model.ema_decay * 1000 <= float(metrics["ema_decay"]) <= cfg.model.ema_end_decay * 1000

    def test_teacher_merge_covers_shared_blocks(self, setup):
        cfg, model, state = setup
        ema = state.ema_params
        assert "blocks" in ema
        assert "decoder" not in ema.get("audio_encoder", {})
        assert "local_encoder" not in ema.get("audio_encoder", {})
        merged = merge_params(state.params, ema)
        assert set(tu.flatten_dict(merged)) == set(tu.flatten_dict(state.params))

    def test_int8_teacher_runs_and_targets_stay_close(self, setup):
        """model.teacher_matmul_impl=int8 quantizes only the EMA-teacher
        forward (stop-gradient inference inside the train step). The step
        must run under grad (the int8 kernels have no vjp — pruned by the
        stop_gradient), and the d2v loss must stay near the fp32-teacher
        loss: same params + same rng => the only delta is teacher
        quantization noise in the regression targets."""
        import dataclasses as dc

        cfg, model, state = setup
        cfg8 = resolve(dc.replace(cfg, model=dc.replace(
            cfg.model, teacher_matmul_impl="int8")))
        batch = synth_batch(np.random.default_rng(9))
        loss_ref, m_ref = pretrain_loss(
            state.params, state.ema_params, batch, jax.random.PRNGKey(4), model, cfg
        )
        loss8, m8 = pretrain_loss(
            state.params, state.ema_params, batch, jax.random.PRNGKey(4), model, cfg8
        )
        assert np.isfinite(float(loss8))
        rel = abs(float(loss8) - float(loss_ref)) / max(1e-6, abs(float(loss_ref)))
        assert rel < 0.05, (float(loss8), float(loss_ref))
        # target statistics barely move
        tv_rel = abs(
            float(m8["target_var"]) - float(m_ref["target_var"])
        ) / max(1e-6, float(m_ref["target_var"]))
        assert tv_rel < 0.05, (float(m8["target_var"]), float(m_ref["target_var"]))
        # and a jitted train step with grads goes through
        step_fn = jax.jit(make_pretrain_train_step(model, cfg8))
        st, metrics = step_fn(state, synth_batch(np.random.default_rng(10), accum=1),
                              jax.random.PRNGKey(5))
        assert np.isfinite(float(metrics["loss"]))

    def test_matmul_impl_typos_rejected_at_config_time(self):
        """A typo'd quantization mode must fail loudly, not silently run
        bf16 while the user believes int8 is enabled."""
        import dataclasses as dc

        cfg = tiny_config()
        with pytest.raises(ValueError, match="matmul_impl"):
            resolve(dc.replace(cfg, model=dc.replace(cfg.model, matmul_impl="in8")))
        with pytest.raises(ValueError, match="teacher_matmul_impl"):
            resolve(dc.replace(
                cfg, model=dc.replace(cfg.model, teacher_matmul_impl="int_8")
            ))

    def test_grad_accum(self):
        cfg = tiny_config(update_freq=2)
        model, state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        step_fn = jax.jit(make_pretrain_train_step(model, cfg))
        batch = synth_batch(np.random.default_rng(3), accum=2)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        assert int(state.step) == 1
        assert np.isfinite(float(metrics["loss"]))


class TestPretrainWithLabels:
    def test_linear_eval_loss_present(self):
        cfg = tiny_config(with_labels=True)
        cfg.model.with_labels = True
        model, state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        batch = synth_batch(np.random.default_rng(0), labels=True)
        loss, metrics = pretrain_loss(
            state.params, state.ema_params, batch, jax.random.PRNGKey(1), model, cfg
        )
        assert "loss_linear_eval_loss" in metrics
        assert "pretrain/tp" in metrics
        assert np.isfinite(float(loss))


class TestFinetuneStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config(finetune=True)
        model, state = init_finetune(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        return cfg, model, state

    def test_overfit_and_freeze_schedule(self, setup):
        cfg, model, state = setup
        step_fn = jax.jit(make_finetune_train_step(model, cfg))
        batch = synth_batch(np.random.default_rng(0), labels=True, accum=1)
        p0 = np.asarray(
            tu.flatten_dict(state.params)[("encoder", "blocks", "block", "attn", "qkv", "kernel")]
        )
        losses = []
        for i in range(8):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
            if i == 3:  # still frozen (freeze_finetune_updates=5)
                p_frozen = np.asarray(
                    tu.flatten_dict(state.params)[("encoder", "blocks", "block", "attn", "qkv", "kernel")]
                )
        p_end = np.asarray(
            tu.flatten_dict(state.params)[("encoder", "blocks", "block", "attn", "qkv", "kernel")]
        )
        np.testing.assert_allclose(p_frozen, p0)  # encoder untouched while frozen
        assert not np.allclose(p_end, p0)  # encoder trained after unfreeze
        assert losses[-1] < losses[0], losses
        assert "finetune/tp" in metrics

    def test_pretrained_weight_transfer(self):
        cfg = tiny_config(finetune=True)
        _, pre_state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        model, ft_state = init_finetune(
            cfg, jax.random.PRNGKey(1), pretrained_params=pre_state.params,
            example_wav_len=800,
        )
        ft_flat = tu.flatten_dict(ft_state.params)
        pre_flat = tu.flatten_dict(pre_state.params)
        k = ("blocks", "block", "attn", "qkv", "kernel")
        np.testing.assert_allclose(
            np.asarray(ft_flat[("encoder",) + k]), np.asarray(pre_flat[k])
        )


class TestEvalPaddingInvariance:
    """Eval metrics must count each real clip exactly once even when the
    final batch is padded with repeated items (VERDICT r2 weak #3)."""

    def test_finetune_eval_metrics_ignore_padded_rows(self):
        cfg = tiny_config(finetune=True)
        model, state = init_finetune(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        eval_fn = jax.jit(make_finetune_eval_step(model, cfg))
        rng_np = np.random.default_rng(0)
        batch5 = synth_batch(rng_np, b=5, labels=True)
        m5 = eval_fn(state, batch5, jax.random.PRNGKey(1))
        # the same 5 items padded to batch 8 with repeats + n_valid=5
        batch8 = {
            "source": jnp.concatenate([batch5["source"], batch5["source"][:3]], 0),
            "target": jnp.concatenate([batch5["target"], batch5["target"][:3]], 0),
            "n_valid": jnp.asarray(5, jnp.int64),
        }
        m8 = eval_fn(state, batch8, jax.random.PRNGKey(1))
        for k in (
            "loss", "sample_size", "finetune/n_correct", "finetune/total",
            "finetune/tp", "finetune/fp", "finetune/tn", "finetune/fn",
        ):
            np.testing.assert_allclose(
                float(m5[k]), float(m8[k]), rtol=1e-5, err_msg=k
            )

    def test_pretrain_eval_metrics_independent_of_padded_content(self):
        """Padded-row *content* must not leak into the summed pretrain
        losses/counters (mask sampling differs by batch size, so we assert
        content-independence rather than cross-batch-size equality)."""
        cfg = tiny_config(with_labels=True)
        model, state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        eval_fn = jax.jit(make_pretrain_eval_step(model, cfg))
        rng_np = np.random.default_rng(0)
        base = synth_batch(rng_np, b=4, labels=True)
        batch_a = dict(base, n_valid=jnp.asarray(3, jnp.int64))
        garbage = synth_batch(np.random.default_rng(99), b=4, labels=True)
        batch_b = {
            "source": base["source"].at[3].set(garbage["source"][3]),
            "target": base["target"].at[3].set(garbage["target"][3]),
            "n_valid": jnp.asarray(3, jnp.int64),
        }
        m_a = eval_fn(state, batch_a, jax.random.PRNGKey(1))
        m_b = eval_fn(state, batch_b, jax.random.PRNGKey(1))
        for k in m_a:
            if k.startswith("loss") or k.startswith("pretrain/") or k == "sample_size":
                np.testing.assert_allclose(
                    float(m_a[k]), float(m_b[k]), rtol=1e-5, err_msg=k
                )


class TestShardedStep:
    def test_pretrain_step_on_8dev_mesh(self):
        from animal2vec_tpu.parallel import build_mesh, batch_sharding, param_sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
        cfg = tiny_config()
        cfg.distributed = DistributedConfig(data_parallel=4, model_parallel=2)
        mesh = build_mesh(cfg.distributed)
        assert mesh.shape == {"data": 4, "model": 2}
        model, state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)

        state_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state
        )
        # place params with TP/DP partitioning
        shardings = param_sharding(state.params, mesh, fsdp=False)
        params_sh = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
        state_sh = state_sh.replace(params=params_sh)

        step_fn = jax.jit(make_pretrain_train_step(model, cfg))
        batch = synth_batch(np.random.default_rng(0), b=4, accum=1)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(None, "data"))), batch
        )
        with mesh:
            state2, metrics = step_fn(state_sh, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1

    def test_int8_teacher_keeps_pipeline_stages(self):
        """The int8 teacher model must derive from model.cfg, not
        cfg.model: build_pretrain_model applies _with_pipeline (copies
        distributed.pipeline_parallel into the MODULE's config, leaving
        cfg.model untouched), and a teacher rebuilt from cfg.model would
        silently run unstaged on a 'stage' mesh. Asserts the configs
        actually diverge (the trap) and that the combined
        pp2 x teacher_matmul_impl=int8 step runs on the dp2xpp2xtp2 mesh."""
        from animal2vec_tpu.parallel import build_mesh, param_sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = tiny_config()
        cfg.model.teacher_matmul_impl = "int8"
        cfg.distributed = DistributedConfig(
            data_parallel=2, model_parallel=2, pipeline_parallel=2
        )
        mesh = build_mesh(cfg.distributed)
        model, state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        assert model.cfg.pipeline_stages == 2  # builder-applied delta
        assert cfg.model.pipeline_stages == 1  # ...absent from cfg.model

        shardings = param_sharding(state.params, mesh, fsdp=False)
        params_sh = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
        state_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state
        ).replace(params=params_sh)
        step_fn = jax.jit(make_pretrain_train_step(model, cfg))
        batch = synth_batch(np.random.default_rng(3), b=4, accum=1)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(None, "data"))), batch
        )
        with mesh:
            state2, metrics = step_fn(state_sh, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1

    def test_sharded_step_matches_unsharded(self):
        """Full pretrain step on the dp4 x tp2 mesh vs single-device: loss
        and updated params must agree. (Consistency check; the GSPMD
        grouped-conv dW over-reduction is regression-tested at the grad
        level in tests/test_grouped_conv.py — Adam's scale invariance makes
        it invisible at the params level.)"""
        from animal2vec_tpu.parallel import build_mesh, param_sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = tiny_config()
        model, state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        batch = synth_batch(np.random.default_rng(0), b=4, accum=1)
        key = jax.random.PRNGKey(7)

        step_fn = make_pretrain_train_step(model, cfg)
        ref_state, ref_metrics = jax.jit(step_fn)(state, batch, key)

        cfg_sh = tiny_config()
        cfg_sh.distributed = DistributedConfig(data_parallel=4, model_parallel=2)
        mesh = build_mesh(cfg_sh.distributed)
        state_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state
        )
        shardings = param_sharding(state.params, mesh, fsdp=False)
        params_sh = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
        state_sh = state_sh.replace(params=params_sh)
        batch_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(None, "data"))), batch
        )
        with mesh:
            new_state, metrics = jax.jit(make_pretrain_train_step(model, cfg_sh))(
                state_sh, batch_sh, key
            )

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
        )
        ref_flat = tu.flatten_dict(ref_state.params)
        new_flat = tu.flatten_dict(jax.device_get(new_state.params))
        for k in ref_flat:
            np.testing.assert_allclose(
                np.asarray(new_flat[k]),
                np.asarray(ref_flat[k]),
                rtol=5e-3,
                atol=5e-4,
                err_msg=f"param {k} diverged between sharded and unsharded step",
            )

    def test_fsdp_step_matches_unsharded(self):
        """Full pretrain step with fsdp=True param sharding (ZeRO-style:
        params sharded over the data axis, reference FSDP path
        nn/audio_train_routine.py:100-102) vs single-device — loss and
        updated params must agree (VERDICT r2 missing #3)."""
        from animal2vec_tpu.parallel import build_mesh, param_sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = tiny_config()
        model, state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        batch = synth_batch(np.random.default_rng(0), b=4, accum=1)
        key = jax.random.PRNGKey(7)
        ref_state, ref_metrics = jax.jit(make_pretrain_train_step(model, cfg))(
            state, batch, key
        )

        cfg_sh = tiny_config()
        cfg_sh.distributed = DistributedConfig(data_parallel=4, model_parallel=2)
        mesh = build_mesh(cfg_sh.distributed)
        state_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state
        )
        shardings = param_sharding(state.params, mesh, fsdp=True)
        params_sh = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
        state_sh = state_sh.replace(params=params_sh)
        batch_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(None, "data"))), batch
        )
        with mesh:
            new_state, metrics = jax.jit(make_pretrain_train_step(model, cfg_sh))(
                state_sh, batch_sh, key
            )

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
        )
        ref_flat = tu.flatten_dict(ref_state.params)
        new_flat = tu.flatten_dict(jax.device_get(new_state.params))
        for k in ref_flat:
            np.testing.assert_allclose(
                np.asarray(new_flat[k]),
                np.asarray(ref_flat[k]),
                rtol=5e-3,
                atol=5e-4,
                err_msg=f"param {k} diverged between fsdp and unsharded step",
            )

    def test_finetune_step_and_eval_on_mesh(self):
        """One finetune train step + one data-sharded eval forward on the
        dp4 x tp2 mesh match the unsharded results (VERDICT r2 missing #2:
        multi-chip evidence for the finetune/inference paths)."""
        from animal2vec_tpu.parallel import build_mesh, param_sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = tiny_config(finetune=True)
        model, state = init_finetune(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        batch = synth_batch(np.random.default_rng(0), b=4, labels=True, accum=1)
        key = jax.random.PRNGKey(3)
        ref_state, ref_metrics = jax.jit(make_finetune_train_step(model, cfg))(
            state, batch, key
        )
        eval_batch = synth_batch(np.random.default_rng(1), b=4, labels=True)
        ref_eval = jax.jit(make_finetune_eval_step(model, cfg))(
            ref_state, eval_batch, key
        )

        cfg_sh = tiny_config(finetune=True)
        cfg_sh.distributed = DistributedConfig(data_parallel=4, model_parallel=2)
        mesh = build_mesh(cfg_sh.distributed)
        state_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state
        )
        shardings = param_sharding(state.params, mesh, fsdp=False)
        params_sh = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
        state_sh = state_sh.replace(params=params_sh)
        batch_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(None, "data"))), batch
        )
        with mesh:
            new_state, metrics = jax.jit(make_finetune_train_step(model, cfg_sh))(
                state_sh, batch_sh, key
            )
            eval_sh = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))),
                eval_batch,
            )
            ev = jax.jit(make_finetune_eval_step(model, cfg_sh))(
                new_state, eval_sh, key
            )

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(ev["loss"]), float(ref_eval["loss"]), rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(ev["_predictions"]),
            np.asarray(ref_eval["_predictions"]),
            rtol=1e-3, atol=1e-5,
        )
        ref_flat = tu.flatten_dict(ref_state.params)
        new_flat = tu.flatten_dict(jax.device_get(new_state.params))
        for k in ref_flat:
            np.testing.assert_allclose(
                np.asarray(new_flat[k]),
                np.asarray(ref_flat[k]),
                rtol=5e-3,
                atol=5e-4,
                err_msg=f"param {k} diverged between sharded and unsharded finetune step",
            )

    def test_tp_partition_specs(self):
        from animal2vec_tpu.parallel import build_mesh
        from animal2vec_tpu.parallel.mesh import param_partition_spec

        cfg = DistributedConfig(data_parallel=4, model_parallel=2)
        mesh = build_mesh(cfg)
        spec = param_partition_spec(
            ("blocks", "block", "attn", "qkv", "kernel"), (3, 32, 96), mesh
        )
        assert spec == jax.sharding.PartitionSpec(None, None, "model")
        spec = param_partition_spec(
            ("blocks", "block", "attn", "proj", "kernel"), (3, 32, 32), mesh
        )
        assert spec == jax.sharding.PartitionSpec(None, "model", None)
        spec = param_partition_spec(
            ("blocks", "block", "mlp", "fc1", "kernel"), (3, 32, 128), mesh, fsdp=True
        )
        assert spec == jax.sharding.PartitionSpec(None, "data", "model")


class TestRematDecoder:
    """model.remat_decoder recomputes the d2v decoder (grouped convs at
    full length on every clone row) in the backward — numerics-neutral:
    the decoder is a pure function of its input (no rng, no static args),
    so grads must match the non-remat stack exactly."""

    def _grads(self, remat_decoder, shared_decoder=False, remat=True):
        cfg = tiny_config()
        cfg.model.remat = remat
        cfg.model.remat_decoder = remat_decoder
        if shared_decoder:
            from animal2vec_tpu.config import DecoderConfig

            cfg.model.shared_decoder = DecoderConfig(
                decoder_dim=12, decoder_groups=4, decoder_kernel=3,
                decoder_layers=2,
            )
            cfg = resolve(cfg)
        model, state = init_pretrain(cfg, jax.random.PRNGKey(0), example_wav_len=800)
        batch = synth_batch(np.random.default_rng(5))

        def loss(p):
            l, _ = pretrain_loss(
                p, state.ema_params, batch, jax.random.PRNGKey(3), model, cfg
            )
            return l

        v, g = jax.value_and_grad(loss)(state.params)
        return float(v), g, state

    @pytest.mark.parametrize("shared_decoder", [False, True])
    def test_grads_and_params_match_no_remat(self, shared_decoder):
        # shared_decoder=True covers the second remat branch in
        # data2vec2.py (cfg.shared_decoder Decoder1d); remat=False on the
        # remat_decoder=True side pins that remat_decoder is independent
        # of model.remat (same semantics as remat_frontend)
        v0, g0, s0 = self._grads(False, shared_decoder=shared_decoder)
        v1, g1, s1 = self._grads(True, shared_decoder=shared_decoder, remat=False)
        # identical param trees (nn.remat preserves module paths)
        assert set(tu.flatten_dict(s0.params)) == set(tu.flatten_dict(s1.params))
        np.testing.assert_allclose(v1, v0, rtol=1e-6)
        f0, f1 = tu.flatten_dict(g0), tu.flatten_dict(g1)
        for k in f0:
            np.testing.assert_allclose(
                np.asarray(f1[k]), np.asarray(f0[k]), rtol=1e-5, atol=1e-7,
                err_msg=str(k),
            )
