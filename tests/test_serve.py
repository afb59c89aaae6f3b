"""AOT serving-bundle tests: export the finetuned forward via jax.export,
reload it without model code, and require numerical agreement with the live
model.apply path (serve.py; the reference has no AOT serving equivalent —
its inference re-imports fairseq per process)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animal2vec_tpu.config import Config, FinetuneModelConfig, TaskConfig, resolve
from animal2vec_tpu.serve import (
    ServingBundle,
    cast_serving_params,
    export_serving,
    load_params_npz,
    save_params_npz,
)
from animal2vec_tpu.train.build import build_finetune_model
from tests.test_models import LABELS as LABELS_STR, TINY_CONV, tiny_model_cfg


def serving_cfg():
    cfg = Config()
    cfg.task = TaskConfig(
        unique_labels=LABELS_STR,
        conv_feature_layers=TINY_CONV,
        sample_rate=8000,
        max_sample_size=2000,
    )
    cfg.model = tiny_model_cfg()
    cfg.model.unique_labels = LABELS_STR
    cfg.finetune = FinetuneModelConfig(
        w2v_path="", apply_mask=False, average_top_k_layers=2
    )
    return resolve(cfg)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    cfg = serving_cfg()
    model = build_finetune_model(cfg)
    src0 = jnp.zeros((1, 2000), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, src0)
    out = str(tmp_path_factory.mktemp("bundle"))
    export_serving(cfg, variables, out, batch_size=2, wav_len=2000,
                   cast_bf16=False)
    return cfg, model, variables, out


class TestParamsNpz:
    def test_roundtrip(self, tmp_path):
        tree = {"params": {"a": {"kernel": np.ones((3, 4), np.float32)},
                           "b": np.arange(5, dtype=np.int32)}}
        p = str(tmp_path / "p.npz")
        save_params_npz(p, tree)
        back = load_params_npz(p)
        assert back["params"]["a"]["kernel"].shape == (3, 4)
        np.testing.assert_array_equal(back["params"]["b"], tree["params"]["b"])

    def test_bf16_roundtrip(self, tmp_path):
        import ml_dtypes

        tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)
                           .astype(ml_dtypes.bfloat16)}}
        p = str(tmp_path / "b.npz")
        save_params_npz(p, tree)
        back = load_params_npz(p)
        assert back["params"]["w"].dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            back["params"]["w"].astype(np.float32),
            tree["params"]["w"].astype(np.float32),
        )

    def test_cast_policy(self):
        tree = {
            "params": {
                "frontend": {"conv_0": {"kernel": np.ones((7, 2), np.float32)}},
                "alibi_scale": np.ones((1, 1, 4, 1, 1), np.float32),
                "blocks": {"qkv": {"kernel": np.ones((8, 24), np.float32),
                                   "bias": np.ones((24,), np.float32)}},
            }
        }
        cast = cast_serving_params(tree)
        # sinc + alibi stay fp32; 2-D matmul kernels go bf16; 1-D stays fp32
        assert cast["params"]["frontend"]["conv_0"]["kernel"].dtype == jnp.float32
        assert cast["params"]["alibi_scale"].dtype == jnp.float32
        assert cast["params"]["blocks"]["qkv"]["kernel"].dtype == jnp.bfloat16
        assert cast["params"]["blocks"]["qkv"]["bias"].dtype == jnp.float32


class TestServingBundle:
    def test_files_written(self, bundle):
        _, _, _, out = bundle
        for name in ("forward.jaxexport", "params.npz", "meta.json"):
            assert os.path.isfile(os.path.join(out, name)), name

    def test_matches_live_model(self, bundle):
        cfg, model, variables, out = bundle
        sb = ServingBundle(out)
        rng = np.random.default_rng(0)
        src = rng.normal(size=(2, 2000)).astype(np.float32)
        got = sb(src)
        want = np.asarray(model.apply(variables, jnp.asarray(src))["encoder_out"])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
        probs = sb.predict_probs(src)
        assert probs.min() >= 0.0 and probs.max() <= 1.0

    def test_shape_guard(self, bundle):
        *_, out = bundle
        sb = ServingBundle(out)
        with pytest.raises(ValueError, match="expects source shape"):
            sb(np.zeros((1, 2000), np.float32))

    def test_meta(self, bundle):
        cfg, *_, out = bundle
        sb = ServingBundle(out)
        assert sb.batch_size == 2 and sb.wav_len == 2000
        assert sb.meta["labels"] == cfg.task.labels()

    def test_multi_shape_bundle(self, tmp_path):
        """One bundle serving two clip lengths (native-length buckets,
        VERDICT r2 weak #6): one StableHLO entry per shape, dispatch on
        source.shape."""
        cfg = serving_cfg()
        model = build_finetune_model(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 2000), jnp.float32)
        )
        out = str(tmp_path / "multibundle")
        export_serving(
            cfg, variables, out, cast_bf16=False,
            shapes=[(2, 2000), (4, 1000)],
        )
        sb = ServingBundle(out)
        assert sb.shapes == [(2, 2000), (4, 1000)]
        rng = np.random.default_rng(1)
        for shape in ((2, 2000), (4, 1000)):
            src = rng.normal(size=shape).astype(np.float32)
            got = sb(src)
            want = np.asarray(
                model.apply(variables, jnp.asarray(src))["encoder_out"]
            )
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
        with pytest.raises(ValueError, match="expects source shape"):
            sb(np.zeros((3, 2000), np.float32))

    def test_duplicate_shapes_deduped(self, tmp_path):
        """A repeated --shape equal to the first entry must not make the
        loader look for a forward_BxW.jaxexport the writer never emitted."""
        cfg = serving_cfg()
        model = build_finetune_model(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 2000), jnp.float32)
        )
        out = str(tmp_path / "dupbundle")
        export_serving(
            cfg, variables, out, cast_bf16=False,
            shapes=[(2, 2000), (2, 2000), (4, 1000)],
        )
        sb = ServingBundle(out)
        assert sb.shapes == [(2, 2000), (4, 1000)]
        src = np.random.default_rng(2).normal(size=(2, 2000)).astype(np.float32)
        got = sb(src)
        want = np.asarray(model.apply(variables, jnp.asarray(src))["encoder_out"])
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
