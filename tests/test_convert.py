"""Converter tests: round-trip our params through the fairseq name mapping
and verify the re-imported tree is bit-identical and covers every parameter
(shape verification per SURVEY §4b; real-checkpoint logit parity needs the
released .pt, exercised by tools/convert_cli.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.traverse_util as tu
import pytest

from tests.test_models import tiny_model_cfg
from animal2vec_tpu.models.data2vec2 import Data2VecMulti
from animal2vec_tpu.train.convert import (
    convert_finetune,
    convert_pretrain,
    export_pretrain,
    verify_tree_shapes,
)


@pytest.fixture(scope="module")
def pretrain_params():
    cfg = tiny_model_cfg(with_labels=True)
    model = Data2VecMulti(cfg=cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask_noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 800)),
    )["params"]
    return cfg, params


class TestRoundTrip:
    def test_export_import_identity(self, pretrain_params):
        cfg, params = pretrain_params
        sd = export_pretrain(params, cfg)
        back, ema = convert_pretrain(sd, cfg)
        missing, unexpected, mismatched = verify_tree_shapes(back, params)
        assert not missing, missing
        assert not unexpected, unexpected
        assert not mismatched, mismatched
        fb = tu.flatten_dict(back)
        for p, v in tu.flatten_dict(params).items():
            np.testing.assert_array_equal(fb[p], np.asarray(v), err_msg=str(p))

    def test_expected_fairseq_names(self, pretrain_params):
        """The exported names must match the reference module tree
        (spot-check the documented structure)."""
        cfg, params = pretrain_params
        sd = export_pretrain(params, cfg)
        expected = [
            "modality_encoders.AUDIO.local_encoder.conv_layers.0.0.low_hz_",
            "modality_encoders.AUDIO.local_encoder.conv_layers.0.0.band_hz_",
            "modality_encoders.AUDIO.local_encoder.conv_layers.0.3.p_swish_alpha",
            "modality_encoders.AUDIO.local_encoder.conv_layers.1.0.weight",
            "modality_encoders.AUDIO.local_encoder.conv_layers.1.2.1.weight",
            "modality_encoders.AUDIO.project_features.1.weight",
            "modality_encoders.AUDIO.project_features.2.weight",
            "modality_encoders.AUDIO.relative_positional_encoder.1.0.weight",
            "modality_encoders.AUDIO.context_encoder.blocks.0.attn.qkv.weight",
            "modality_encoders.AUDIO.context_encoder.blocks.1.mlp.fc2.bias",
            "modality_encoders.AUDIO.context_encoder.norm.weight",
            "modality_encoders.AUDIO.alibi_scale",
            "modality_encoders.AUDIO.decoder.blocks.0.0.weight",
            "modality_encoders.AUDIO.decoder.proj.weight",
            "blocks.0.attn.qkv.weight",
            "blocks.2.norm2.bias",
            "linear_eval_projection.weight",
        ]
        for name in expected:
            assert name in sd, f"missing exported key: {name}"

    def test_torch_layouts(self, pretrain_params):
        cfg, params = pretrain_params
        sd = export_pretrain(params, cfg)
        # torch Linear is (out, in)
        qkv = sd["blocks.0.attn.qkv.weight"]
        assert qkv.shape == (96, 32)  # 3*32, 32
        # torch Conv1d is (out, in/groups, k)
        posw = sd["modality_encoders.AUDIO.relative_positional_encoder.1.0.weight"]
        assert posw.shape == (32, 16, 5)  # embed, embed/groups=2, k=max(3,10//2)

    def test_finetune_wrapper(self, pretrain_params):
        cfg, params = pretrain_params
        sd = export_pretrain(params, cfg)
        ft_sd = {f"w2v_encoder.w2v_model.{k}": v for k, v in sd.items()}
        rng = np.random.default_rng(0)
        ft_sd["w2v_encoder.proj.weight"] = rng.normal(size=(4, 32)).astype(np.float32)
        ft_sd["w2v_encoder.proj.bias"] = np.zeros(4, np.float32)
        out = convert_finetune(ft_sd, cfg)
        f = tu.flatten_dict(out)
        assert ("encoder", "blocks", "block", "attn", "qkv", "kernel") in f
        assert f[("proj", "kernel")].shape == (32, 4)

    def test_cli_import_real_torch_pt(self, pretrain_params, tmp_path):
        """Full path: torch.save a fairseq-style checkpoint -> convert_cli
        import -> restored params match the originals bit-for-bit."""
        torch = pytest.importorskip("torch")
        import flax.traverse_util as tu

        from animal2vec_tpu.config import (
            Config, CriterionConfig, TaskConfig, resolve, save_config,
        )
        from tests.test_models import TINY_CONV, LABELS
        from animal2vec_tpu.tools import convert_cli
        from animal2vec_tpu.train.checkpoint import CheckpointManager

        cfg_m, params = pretrain_params
        sd = export_pretrain(params, cfg_m)
        pt = str(tmp_path / "ref.pt")
        torch.save({"model": {k: torch.tensor(v) for k, v in sd.items()}}, pt)

        cfg = Config()
        cfg.task = TaskConfig(
            unique_labels=LABELS, conv_feature_layers=TINY_CONV, with_labels=True
        )
        cfg.model = cfg_m
        cfg.criterion = CriterionConfig()
        cfg = resolve(cfg)
        cfg_path = str(tmp_path / "cfg.yaml")
        save_config(cfg, cfg_path)

        out_dir = str(tmp_path / "converted")
        convert_cli.main([
            "import", "--pt", pt, "--config", cfg_path, "--out", out_dir,
            "--kind", "pretrain", "--example-len", "800",
        ])
        state, _ = CheckpointManager(out_dir).restore()
        got = tu.flatten_dict(state["params"])
        for p, v in tu.flatten_dict(params).items():
            np.testing.assert_array_equal(np.asarray(got[p]), np.asarray(v), err_msg=str(p))

    def test_ema_conversion(self, pretrain_params):
        cfg, params = pretrain_params
        sd = export_pretrain(params, cfg)
        # fabricate an _ema entry covering the teacher subset
        ema_sd = {
            f"_ema.{k}": v * 0.5
            for k, v in sd.items()
            if k.startswith("blocks.")
            or (k.startswith("modality_encoders.AUDIO")
                and "local_encoder" not in k and "decoder" not in k
                and "project_features" not in k)
        }
        _, ema = convert_pretrain({**sd, **ema_sd}, cfg)
        assert ema is not None
        fe = tu.flatten_dict(ema)
        assert ("blocks", "block", "attn", "qkv", "kernel") in fe
        assert not any(p[0] == "audio_encoder" and p[1] == "local_encoder" for p in fe)


class TestTolerantUnpickler:
    """Real fairseq .pt files pickle omegaconf/fairseq objects in their
    cfg/args entries. Build a checkpoint whose cfg classes are unimportable
    at load time and check every tensor still comes through (VERDICT r1 #10:
    the tolerant path was previously only exercised by clean torch.save)."""

    def _fake_fairseq_ckpt(self, tmp_path, sd):
        import sys
        import types

        torch = pytest.importorskip("torch")
        mod = types.ModuleType("fake_omegaconf")

        class DictConfig:
            def __init__(self, content):
                self._content = content

            def __reduce__(self):
                # omegaconf-style custom reduce with state dict
                return (DictConfig, (None,), {"_content": self._content})

            def __setstate__(self, state):
                self.__dict__.update(state)

        class FairseqDataclass:
            def __init__(self, **kw):
                self.__dict__.update(kw)

        DictConfig.__module__ = "fake_omegaconf"
        DictConfig.__qualname__ = "DictConfig"
        FairseqDataclass.__module__ = "fake_omegaconf"
        FairseqDataclass.__qualname__ = "FairseqDataclass"
        mod.DictConfig = DictConfig
        mod.FairseqDataclass = FairseqDataclass
        sys.modules["fake_omegaconf"] = mod
        try:
            ckpt = {
                "args": None,
                "cfg": DictConfig(
                    {
                        "model": FairseqDataclass(depth=3, embed_dim=32),
                        "task": DictConfig({"_name": "audio_ccas"}),
                    }
                ),
                "model": {k: torch.tensor(v) for k, v in sd.items()},
                "extra_state": {"epoch": 7, "metrics": [FairseqDataclass(x=1)]},
                "optimizer_history": [
                    {"criterion_name": "ExpandedModelCriterion",
                     "state": FairseqDataclass(step=100)}
                ],
            }
            pt = str(tmp_path / "fairseq_like.pt")
            torch.save(ckpt, pt)
        finally:
            del sys.modules["fake_omegaconf"]
        return pt

    def test_tensors_survive_unimportable_cfg(self, pretrain_params, tmp_path):
        from animal2vec_tpu.train.convert import (
            load_torch_checkpoint, state_dict_to_numpy,
        )

        cfg_m, params = pretrain_params
        sd = export_pretrain(params, cfg_m)
        pt = self._fake_fairseq_ckpt(tmp_path, sd)

        ckpt = load_torch_checkpoint(pt)  # must hit the tolerant path
        assert ckpt["extra_state"]["epoch"] == 7
        got = state_dict_to_numpy(ckpt["model"])
        assert set(got) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(got[k], np.asarray(sd[k]), err_msg=k)

    def test_tolerant_convert_roundtrip(self, pretrain_params, tmp_path):
        from animal2vec_tpu.train.convert import (
            convert_pretrain, load_torch_checkpoint, state_dict_to_numpy,
        )

        cfg_m, params = pretrain_params
        sd = export_pretrain(params, cfg_m)
        pt = self._fake_fairseq_ckpt(tmp_path, sd)
        ckpt = load_torch_checkpoint(pt)
        back, _ = convert_pretrain(state_dict_to_numpy(ckpt["model"]), cfg_m)
        orig = tu.flatten_dict(jax.tree_util.tree_map(np.asarray, params))
        got = tu.flatten_dict(back)
        assert set(orig) == set(got)
        for k in orig:
            np.testing.assert_array_equal(orig[k], got[k], err_msg=str(k))
