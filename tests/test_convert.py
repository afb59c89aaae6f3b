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


def register_fairseq_stubs(names):
    """Register throwaway stub modules/classes under real fairseq/omegaconf
    import paths so torch.save writes a pickle indistinguishable from a true
    fairseq checkpoint. Returns the created module names for cleanup."""
    import sys
    import types

    created = []
    for modname, classnames in names.items():
        mod = types.ModuleType(modname)
        for cn in classnames:
            cls = type(cn, (), {
                "__init__": lambda self, *a, **k: self.__dict__.update(k),
                "__reduce__": lambda self: (
                    self.__class__, (), dict(self.__dict__)
                ),
                "__setstate__": lambda self, st: self.__dict__.update(st),
            })
            cls.__module__ = modname
            setattr(mod, cn, cls)
        sys.modules[modname] = mod
        created.append(modname)
        # parent packages must exist for pickle's __import__
        parts = modname.split(".")
        for i in range(1, len(parts)):
            parent = ".".join(parts[:i])
            if parent not in sys.modules:
                sys.modules[parent] = types.ModuleType(parent)
                created.append(parent)
        for i in range(1, len(parts)):
            child = ".".join(parts[: i + 1])
            setattr(sys.modules[".".join(parts[:i])], parts[i], sys.modules[child])
    return created


def fairseq_format_ckpt(path, sd):
    """torch.save a checkpoint with the released-file layout: args/cfg
    (real omegaconf/fairseq class paths), task_state, model tensors,
    extra_state (reference consumer: nn/wav2vec2.py:311-360)."""
    import sys

    import torch

    created = register_fairseq_stubs({
        "omegaconf.dictconfig": ["DictConfig"],
        "omegaconf.base": ["ContainerMetadata", "Metadata"],
        "fairseq.dataclass.configs": ["FairseqConfig", "FairseqDataclass"],
        "fairseq.data.dictionary": ["Dictionary"],
    })
    try:
        from omegaconf.dictconfig import DictConfig  # type: ignore
        from omegaconf.base import ContainerMetadata  # type: ignore
        from fairseq.dataclass.configs import FairseqConfig  # type: ignore
        from fairseq.data.dictionary import Dictionary  # type: ignore

        ckpt = {
            "args": None,
            "cfg": DictConfig(
                _content={"model": FairseqConfig(depth=3)},
                _metadata=ContainerMetadata(ref_type=None),
            ),
            "task_state": {"target_dictionary": Dictionary(symbols=["a", "b"])},
            "model": {k: torch.tensor(v) for k, v in sd.items()},
            "extra_state": {"epoch": 3},
        }
        torch.save(ckpt, path)
    finally:
        for m in created:
            sys.modules.pop(m, None)
    return path


class TestAdversarialCheckpoints:
    """VERDICT r2 #8: fixtures shaped like *real* fairseq pickles — actual
    ``fairseq.*``/``omegaconf.*`` class paths (stub modules registered only
    while saving), shared/sliced storages, half/bf16 tensors, and truncated
    files — must load (or fail loudly) through the public converter API."""

    def _fairseq_path_ckpt(self, tmp_path, sd):
        pytest.importorskip("torch")
        return fairseq_format_ckpt(str(tmp_path / "real_paths.pt"), sd)

    def test_actual_fairseq_class_paths(self, pretrain_params, tmp_path):
        from animal2vec_tpu.train.convert import (
            convert_pretrain, load_torch_checkpoint, state_dict_to_numpy,
        )

        cfg_m, params = pretrain_params
        sd = export_pretrain(params, cfg_m)
        pt = self._fairseq_path_ckpt(tmp_path, sd)
        with pytest.raises(ModuleNotFoundError):
            import fairseq  # noqa: F401  (must really be unimportable now)
        ckpt = load_torch_checkpoint(pt)
        back, _ = convert_pretrain(state_dict_to_numpy(ckpt["model"]), cfg_m)
        orig = tu.flatten_dict(jax.tree_util.tree_map(np.asarray, params))
        got = tu.flatten_dict(back)
        assert set(orig) == set(got)
        for k in orig:
            np.testing.assert_array_equal(orig[k], got[k], err_msg=str(k))

    def test_shared_and_sliced_storages(self, tmp_path):
        """fairseq ties some embeddings; torch.save stores one storage for
        views/slices. Every alias must materialize with its own values."""
        torch = pytest.importorskip("torch")
        from animal2vec_tpu.train.convert import (
            load_torch_checkpoint, state_dict_to_numpy,
        )

        base = torch.randn(8, 16)
        ckpt = {"model": {
            "a.weight": base,
            "b.weight": base,            # same storage, same view
            "c.weight": base[2:6],       # slice into the same storage
            "d.weight": base.t(),        # transposed view (non-contiguous)
        }}
        pt = str(tmp_path / "shared.pt")
        torch.save(ckpt, pt)
        got = state_dict_to_numpy(load_torch_checkpoint(pt)["model"])
        ref = base.detach().numpy()
        np.testing.assert_array_equal(got["a.weight"], ref)
        np.testing.assert_array_equal(got["b.weight"], ref)
        np.testing.assert_array_equal(got["c.weight"], ref[2:6])
        np.testing.assert_array_equal(got["d.weight"], ref.T)

    def test_half_and_bf16_tensors(self, tmp_path):
        torch = pytest.importorskip("torch")
        from animal2vec_tpu.train.convert import (
            load_torch_checkpoint, state_dict_to_numpy,
        )

        w = torch.randn(4, 8)
        ckpt = {"model": {
            "fp16.weight": w.half(),
            "bf16.weight": w.bfloat16(),
            "fp32.weight": w,
        }}
        pt = str(tmp_path / "halfs.pt")
        torch.save(ckpt, pt)
        got = state_dict_to_numpy(load_torch_checkpoint(pt)["model"])
        for k, v in got.items():
            assert v.dtype == np.float32, (k, v.dtype)
        np.testing.assert_allclose(got["fp16.weight"], w.numpy(), atol=2e-3)
        np.testing.assert_allclose(got["bf16.weight"], w.numpy(), atol=2e-2)
        np.testing.assert_array_equal(got["fp32.weight"], w.numpy())

    def test_truncated_file_raises_clear_error(self, tmp_path):
        torch = pytest.importorskip("torch")
        from animal2vec_tpu.train.convert import load_torch_checkpoint

        pt = str(tmp_path / "trunc.pt")
        torch.save({"model": {"w": torch.randn(64, 64)}}, pt)
        data = open(pt, "rb").read()
        for frac, name in ((0.5, "half"), (0.98, "tail")):
            cut = str(tmp_path / f"cut_{name}.pt")
            with open(cut, "wb") as f:
                f.write(data[: int(len(data) * frac)])
            with pytest.raises(ValueError, match="truncated/"):
                load_torch_checkpoint(cut)

    def test_garbage_file_raises_clear_error(self, tmp_path):
        from animal2vec_tpu.train.convert import load_torch_checkpoint

        bad = str(tmp_path / "garbage.pt")
        with open(bad, "wb") as f:
            f.write(b"\x00" * 1024)
        with pytest.raises(ValueError, match="truncated/"):
            load_torch_checkpoint(bad)
