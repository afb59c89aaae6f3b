"""Full-model logit parity vs a torch mirror of the reference composition.

The BASELINE.json north star is <=1e-3 max abs frame-logit diff vs the
released fairseq checkpoint. Round-1 coverage was per-op only; these tests
close the gap at the *composition* level: the same weights run through

  (a) this framework's jitted FinetuneModel forward, and
  (b) tests/torch_mirror.py — an independent torch reimplementation of the
      reference forward path (nn/wav2vec2.py:362-482 ->
      nn/data2vec2.py:516-728 -> nn/modalities/{base,audio}.py ->
      nn/utils.py:1043-1163 / nn/sinc.py) with fairseq state-dict naming,

and must agree within the north-star tolerance. Weights cross over via
train/convert.py's export_pretrain, and the mirror loads them with
``load_state_dict(strict=True)`` — so any drift in norm placement, padding
convention, ALiBi scaling, tap selection, or converter name mapping fails
here even when every op is individually correct.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import flax.traverse_util as tu

from animal2vec_tpu.config import (
    AudioModalityConfig,
    Config,
    FinetuneModelConfig,
    MixupConfig,
    ModalitiesConfig,
    ModelConfig,
    OptimizationConfig,
    TaskConfig,
    parse_pylist,
    resolve,
)
from animal2vec_tpu.train.build import (
    build_finetune_encoder_cfg,
    build_finetune_model,
    init_finetune,
)
from animal2vec_tpu.train.convert import convert_finetune, export_pretrain

from tests import torch_mirror


LABELS = "['a', 'b', 'c', 'focal']"


def _finetune_cfg(conv_layers, embed_dim, num_heads, depth, prenet_depth,
                  conv_pos_depth, conv_pos_width, conv_pos_groups, avg_k,
                  unique_labels=LABELS):
    audio = AudioModalityConfig(
        prenet_depth=prenet_depth,
        conv_pos_depth=conv_pos_depth,
        conv_pos_width=conv_pos_width,
        conv_pos_groups=conv_pos_groups,
        sinc_input=True,
        sinc_norm="layer_norm",
        use_pswish=True,
        use_alibi_encoder=True,
        learned_alibi_scale=True,
        learned_alibi_scale_per_head=True,
        conv_feature_layers=conv_layers,
        sample_rate=8000,
        num_alibi_heads=num_heads,
        model_depth=depth,
        decoder=None,
    )
    cfg = Config()
    cfg.task = TaskConfig(
        unique_labels=unique_labels,
        conv_feature_layers=conv_layers,
        with_labels=True,
        sample_rate=8000,
    )
    cfg.model = ModelConfig(
        depth=depth,
        embed_dim=embed_dim,
        num_heads=num_heads,
        norm_eps=1e-5,  # a2v_large_pretrain_best.yaml:107
        average_top_k_layers=avg_k,
        supported_modality="AUDIO",
        encoder_dropout=0.0,
        attention_dropout=0.0,
        post_mlp_drop=0.0,
        remat=False,
        unique_labels=unique_labels,
        conv_feature_layers=conv_layers,
        modalities=ModalitiesConfig(audio=audio),
        shared_decoder=None,
    )
    cfg.optimization = OptimizationConfig(lr=1e-4, max_update=100)
    cfg.finetune = FinetuneModelConfig(
        average_top_k_layers=avg_k,
        apply_mask=False,
        mixup=MixupConfig(source_mixup=-1.0),
    )
    return resolve(cfg)


def _build_mirror(cfg, n_classes):
    conv_layers = [tuple(x) for x in parse_pylist(cfg.task.conv_feature_layers)]
    audio = cfg.model.modalities.audio
    w2v = torch_mirror.Data2VecMultiModel(
        conv_layers=conv_layers,
        embed_dim=cfg.model.embed_dim,
        num_heads=cfg.model.num_heads,
        depth=cfg.model.depth,
        prenet_depth=audio.prenet_depth,
        conv_pos_depth=audio.conv_pos_depth,
        conv_pos_width=audio.conv_pos_width,
        conv_pos_groups=audio.conv_pos_groups,
        sample_rate=audio.sample_rate,
        sinc_input=audio.sinc_input,
        sinc_norm=audio.sinc_norm,
        use_pswish=audio.use_pswish,
        norm_eps=cfg.model.norm_eps,
        layer_norm_first=cfg.model.layer_norm_first,
        mlp_ratio=cfg.model.mlp_ratio,
    )
    return torch_mirror.FinetuneModel(
        w2v, cfg.model.embed_dim, n_classes, cfg.finetune.average_top_k_layers
    )


def _export_finetune_sd(params, enc_cfg):
    """Our finetune params -> fairseq wav2vec_ccas_finetune state dict."""
    sd = export_pretrain(params["encoder"], enc_cfg)
    sd = {f"w2v_encoder.w2v_model.{k}": v for k, v in sd.items()}
    sd["w2v_encoder.proj.weight"] = np.asarray(params["proj"]["kernel"]).T
    sd["w2v_encoder.proj.bias"] = np.asarray(params["proj"]["bias"])
    return sd


def _run_parity(cfg, wav_len, batch=2, tol=1e-3, seed=0):
    model = build_finetune_model(cfg)
    rng = jax.random.PRNGKey(seed)
    src = np.random.default_rng(seed).normal(size=(batch, wav_len)).astype(np.float32)
    variables = model.init({"params": rng}, jnp.zeros((1, wav_len)))
    params = variables["params"]

    jax_logits = np.asarray(
        jax.jit(lambda p, s: model.apply(p, s)["encoder_out"])(
            variables, jnp.asarray(src)
        )
    )

    enc_cfg = build_finetune_encoder_cfg(cfg.model, cfg.finetune)
    sd = _export_finetune_sd(params, enc_cfg)
    n_classes = sd["w2v_encoder.proj.bias"].shape[0]
    mirror = _build_mirror(cfg, n_classes)
    # strict load: converter naming must exactly match the fairseq layout
    mirror.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})
    mirror.eval()
    with torch.no_grad():
        torch_logits = mirror(torch.from_numpy(src)).numpy()

    assert torch_logits.shape == jax_logits.shape
    diff = np.max(np.abs(torch_logits - jax_logits))
    assert diff <= tol, f"max abs logit diff {diff:.2e} > {tol}"
    return sd, params, diff


class TestFinetuneLogitParity:
    def test_tiny_composition(self):
        """Small dims, full composition: sinc frontend + PSwish + pos-conv +
        prenet + trunk + layer-avg + proj."""
        cfg = _finetune_cfg(
            conv_layers="[(9, 7, 1)] + [(16, 4, 2)] + [(16, 3, 2)]",
            embed_dim=32, num_heads=4, depth=3, prenet_depth=2,
            conv_pos_depth=2, conv_pos_width=10, conv_pos_groups=2, avg_k=3,
        )
        _run_parity(cfg, wav_len=800)

    def test_tiny_instance_norm_variant(self):
        """sinc_norm=instance + return_abs path (config.py default;
        nn/utils.py:1082,1100-1103)."""
        cfg = _finetune_cfg(
            conv_layers="[(9, 7, 1)] + [(16, 4, 2)] + [(16, 3, 2)]",
            embed_dim=32, num_heads=4, depth=2, prenet_depth=1,
            conv_pos_depth=2, conv_pos_width=10, conv_pos_groups=2, avg_k=2,
        )
        cfg.model.modalities.audio.sinc_norm = "instance"
        cfg.model.modalities.audio.use_pswish = False
        cfg = resolve(cfg)
        _run_parity(cfg, wav_len=800)

    def test_converter_roundtrip_vs_fairseq_naming(self):
        """convert_finetune over a mirror-validated state dict reproduces the
        original param tree exactly (names validated by the mirror's strict
        load, not by our own exporter)."""
        cfg = _finetune_cfg(
            conv_layers="[(9, 7, 1)] + [(16, 4, 2)] + [(16, 3, 2)]",
            embed_dim=32, num_heads=4, depth=3, prenet_depth=2,
            conv_pos_depth=2, conv_pos_width=10, conv_pos_groups=2, avg_k=3,
        )
        sd, params, _ = _run_parity(cfg, wav_len=800)
        enc_cfg = build_finetune_encoder_cfg(cfg.model, cfg.finetune)
        back = convert_finetune(sd, enc_cfg)
        flat_orig = tu.flatten_dict(jax.tree_util.tree_map(np.asarray, params))
        flat_back = tu.flatten_dict(back)
        assert set(flat_orig) == set(flat_back)
        for k in flat_orig:
            np.testing.assert_allclose(
                flat_orig[k], flat_back[k], rtol=0, atol=0, err_msg=str(k)
            )

    def test_a2v_large_shapes(self):
        """Real a2v-large dims (127-filter sinc, 512-ch conv stack, 1024 dim,
        16 heads, 16+8 blocks, avg 16) on a 1-s clip in fp32
        (a2v_large_pretrain_best.yaml:19-24,88-90,117-124). Set
        A2V_FULL_PARITY=1 to run the full 10-s clip instead."""
        full = os.environ.get("A2V_FULL_PARITY", "") == "1"
        cfg = _finetune_cfg(
            conv_layers=(
                "[(127, 63, 1)] + [(512, 10, 5)] + [(512, 3, 2)] * 3 "
                "+ [(512, 3, 1)] + [(512, 2, 1)] * 2"
            ),
            embed_dim=1024, num_heads=16, depth=16, prenet_depth=8,
            conv_pos_depth=5, conv_pos_width=95, conv_pos_groups=16, avg_k=16,
            unique_labels=(
                "['beep', 'synch', 'sn', 'cc', 'ld', 'oth', 'mo', 'al', "
                "'soc', 'agg', 'eating', 'focal']"
            ),
        )
        _run_parity(cfg, wav_len=80_000 if full else 8_000, batch=1)


# ---------------------------------------------------------------------------
# pretrain-forward parity (the masked-prediction science path)
# ---------------------------------------------------------------------------


def _pretrain_cfg(conv_layers, embed_dim, num_heads, depth, prenet_depth,
                  conv_pos_depth, conv_pos_width, conv_pos_groups, avg_k,
                  dec_dim, dec_kernel, dec_groups, dec_layers):
    from animal2vec_tpu.config import DecoderConfig

    audio = AudioModalityConfig(
        prenet_depth=prenet_depth,
        conv_pos_depth=conv_pos_depth,
        conv_pos_width=conv_pos_width,
        conv_pos_groups=conv_pos_groups,
        sinc_input=True,
        sinc_norm="layer_norm",
        use_pswish=True,
        use_alibi_encoder=True,
        learned_alibi_scale=True,
        learned_alibi_scale_per_head=True,
        conv_feature_layers=conv_layers,
        sample_rate=8000,
        num_alibi_heads=num_heads,
        model_depth=depth,
        mask_noise_std=0.0,  # zero decoder mask-tokens: deterministic parity
        decoder=DecoderConfig(
            decoder_dim=dec_dim,
            decoder_kernel=dec_kernel,
            decoder_groups=dec_groups,
            decoder_layers=dec_layers,
            input_dropout=0.0,
        ),
    )
    cfg = Config()
    cfg.task = TaskConfig(
        unique_labels=LABELS,
        conv_feature_layers=conv_layers,
        with_labels=False,
        sample_rate=8000,
    )
    cfg.model = ModelConfig(
        depth=depth,
        embed_dim=embed_dim,
        num_heads=num_heads,
        norm_eps=1e-5,
        average_top_k_layers=avg_k,
        supported_modality="AUDIO",
        encoder_dropout=0.0,
        attention_dropout=0.0,
        post_mlp_drop=0.0,
        dropout_input=0.0,
        remat=False,
        with_labels=False,
        unique_labels=LABELS,
        conv_feature_layers=conv_layers,
        modalities=ModalitiesConfig(audio=audio),
        shared_decoder=None,
        clone_batch=1,
        # a2v_large_pretrain_best.yaml:100-102
        instance_norm_target_layer=True,
        mixup=MixupConfig(source_mixup=-1.0),
    )
    cfg.optimization = OptimizationConfig(lr=1e-4, max_update=100)
    return resolve(cfg)


def _fixed_mask(batch, t, m, seed):
    """A fixed mask with exactly m masked tokens/row + its MaskInfo index
    arrays, built with the reference's stable-argsort bookkeeping
    (nn/modalities/base.py:427-455)."""
    rng = np.random.default_rng(seed)
    mask = np.zeros((batch, t), np.int32)
    for b in range(batch):
        mask[b, rng.permutation(t)[:m]] = 1
    ids_shuffle = np.argsort(mask, axis=1, kind="stable")
    ids_restore = np.argsort(ids_shuffle, axis=1, kind="stable")
    ids_keep = ids_shuffle[:, : t - m]
    return mask, ids_shuffle, ids_restore, ids_keep


def _run_pretrain_parity(cfg, wav_len, batch=2, mask_frac=0.6, tol=1e-3,
                         seed=0):
    """Compare teacher targets, decoder outputs, and the final d2v loss
    between the jitted pretrain composition and the torch mirror, on the
    identical fixed mask (VERDICT r2 item 3)."""
    from animal2vec_tpu.models.data2vec2 import (
        Data2VecMulti,
        finish_targets,
        make_targets,
    )
    from animal2vec_tpu.ops import d2v_regression_loss
    from animal2vec_tpu.ops.masking import MaskInfo
    from animal2vec_tpu.train.build import build_pretrain_model

    model = build_pretrain_model(cfg)
    rngs = {"params": jax.random.PRNGKey(seed),
            "mask_noise": jax.random.PRNGKey(seed + 1)}
    variables = model.init(rngs, jnp.zeros((1, wav_len)))
    params = variables["params"]
    src = np.random.default_rng(seed).normal(size=(batch, wav_len)).astype(np.float32)

    local = model.apply(variables, jnp.asarray(src),
                        method=Data2VecMulti.local_features)
    t = local.shape[1]
    m = int(t * mask_frac)
    mask, ids_shuffle, ids_restore, ids_keep = _fixed_mask(batch, t, m, seed)
    info = MaskInfo(
        mask=jnp.asarray(mask),
        ids_shuffle=jnp.asarray(ids_shuffle),
        ids_restore=jnp.asarray(ids_restore),
        ids_keep=jnp.asarray(ids_keep),
    )

    @jax.jit
    def jax_forward(variables, local, info):
        x, _, _, _ = model.apply(
            variables, local, "AUDIO", info, True,
            method=Data2VecMulti.encode,
        )
        xs = model.apply(
            variables, x, "AUDIO", info,
            rngs={"mask_noise": jax.random.PRNGKey(0)},  # std=0: unused draw
            method=Data2VecMulti.decode_d2v,
        )
        # teacher: stacked taps -> make_targets (nn/data2vec2.py:779-846)
        _, taps_t, _, _ = model.apply(
            variables, local, "AUDIO", None, False,
            method=Data2VecMulti.encode,
        )
        y = make_targets(taps_t, cfg.model)
        # the actual training path streams the same computation
        _, t_acc, _, _ = model.apply(
            variables, local, "AUDIO", None, False, None, None, True, True,
            True, method=Data2VecMulti.encode,
        )
        y_stream = finish_targets(t_acc / cfg.model.average_top_k_layers, cfg.model)
        ids_masked = info.ids_shuffle[:, info.ids_keep.shape[1]:]
        y_m = jnp.take_along_axis(y, ids_masked[..., None], axis=1)
        x_m = jnp.take_along_axis(xs[0], ids_masked[..., None], axis=1)
        loss = (
            d2v_regression_loss(x_m, y_m, cfg.model.loss_beta, cfg.model.loss_scale).sum()
            * cfg.model.d2v_loss / ids_masked.size
        )
        return y, y_stream, xs[0], loss

    y_jax, y_stream, dec_jax, loss_jax = jax.tree_util.tree_map(
        np.asarray, jax_forward(variables, jnp.asarray(local), info)
    )

    # --- torch mirror on the same weights + the same mask ---
    sd = export_pretrain(params, cfg.model)
    conv_layers = [tuple(x) for x in parse_pylist(cfg.task.conv_feature_layers)]
    audio = cfg.model.modalities.audio
    w2v = torch_mirror.Data2VecMultiModel(
        conv_layers=conv_layers,
        embed_dim=cfg.model.embed_dim,
        num_heads=cfg.model.num_heads,
        depth=cfg.model.depth,
        prenet_depth=audio.prenet_depth,
        conv_pos_depth=audio.conv_pos_depth,
        conv_pos_width=audio.conv_pos_width,
        conv_pos_groups=audio.conv_pos_groups,
        sample_rate=audio.sample_rate,
        sinc_input=audio.sinc_input,
        sinc_norm=audio.sinc_norm,
        use_pswish=audio.use_pswish,
        norm_eps=cfg.model.norm_eps,
        layer_norm_first=cfg.model.layer_norm_first,
        mlp_ratio=cfg.model.mlp_ratio,
        decoder=dict(
            decoder_dim=audio.decoder.decoder_dim,
            decoder_kernel=audio.decoder.decoder_kernel,
            decoder_groups=audio.decoder.decoder_groups,
            decoder_layers=audio.decoder.decoder_layers,
            projection_layers=audio.decoder.projection_layers,
            projection_ratio=audio.decoder.projection_ratio,
        ),
    )
    mirror = torch_mirror.PretrainModel(
        w2v,
        avg_k=cfg.model.average_top_k_layers,
        d2v_loss_weight=cfg.model.d2v_loss,
        loss_beta=cfg.model.loss_beta,
        loss_scale=cfg.model.loss_scale,
        instance_norm_target_layer=cfg.model.instance_norm_target_layer,
        layer_norm_target_layer=cfg.model.layer_norm_target_layer,
        layer_norm_targets=cfg.model.layer_norm_targets,
        instance_norm_targets=cfg.model.instance_norm_targets,
    )
    mirror.w2v_model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=True
    )
    mirror.eval()
    with torch.no_grad():
        out = mirror(
            torch.from_numpy(src),
            torch.from_numpy(mask),
            torch.from_numpy(ids_keep),
            torch.from_numpy(ids_restore),
        )

    y_t = out["targets"].numpy()
    dec_t = out["decoder_out"].numpy()
    loss_t = float(out["loss"])
    d_y = np.max(np.abs(y_t - y_jax))
    d_ys = np.max(np.abs(y_t - y_stream))
    d_dec = np.max(np.abs(dec_t - dec_jax))
    d_loss = abs(loss_t - float(loss_jax))
    assert d_y <= tol, f"teacher-target diff {d_y:.2e} > {tol}"
    assert d_ys <= tol, f"streamed-target diff {d_ys:.2e} > {tol}"
    assert d_dec <= tol, f"decoder-output diff {d_dec:.2e} > {tol}"
    assert d_loss <= tol, f"d2v-loss diff {d_loss:.2e} > {tol}"
    return d_y, d_dec, d_loss


class TestPretrainForwardParity:
    """Cross-framework parity for the *pretrain* composition: EMA-teacher
    target construction (top-k tap average + instance norm,
    nn/data2vec2.py:1023-1066), decoder mask-token scatter
    (nn/modalities/base.py:162-192) + Decoder1d (modules.py:137-192), and
    the d2v regression loss (:1005-1021) — on identical fixed masks."""

    def test_tiny_composition(self):
        cfg = _pretrain_cfg(
            conv_layers="[(9, 7, 1)] + [(16, 4, 2)] + [(16, 3, 2)]",
            embed_dim=32, num_heads=4, depth=3, prenet_depth=2,
            conv_pos_depth=2, conv_pos_width=10, conv_pos_groups=2, avg_k=2,
            dec_dim=16, dec_kernel=5, dec_groups=2, dec_layers=2,
        )
        _run_pretrain_parity(cfg, wav_len=800)

    def test_tiny_layer_norm_targets_variant(self):
        """layer_norm_target_layer + layer_norm_targets branches
        (nn/data2vec2.py:1049-1061)."""
        cfg = _pretrain_cfg(
            conv_layers="[(9, 7, 1)] + [(16, 4, 2)] + [(16, 3, 2)]",
            embed_dim=32, num_heads=4, depth=2, prenet_depth=1,
            conv_pos_depth=2, conv_pos_width=10, conv_pos_groups=2, avg_k=2,
            dec_dim=16, dec_kernel=5, dec_groups=2, dec_layers=2,
        )
        cfg.model.instance_norm_target_layer = False
        cfg.model.layer_norm_target_layer = True
        cfg.model.layer_norm_targets = True
        cfg = resolve(cfg)
        _run_pretrain_parity(cfg, wav_len=800)

    def test_a2v_large_shapes(self):
        """Full a2v-large pretrain dims incl. the 768/16-group/7-kernel
        4-layer decoder (a2v_large_pretrain_best.yaml:142-147) on a 1-s
        clip, ~93% masked, fp32."""
        cfg = _pretrain_cfg(
            conv_layers=(
                "[(127, 63, 1)] + [(512, 10, 5)] + [(512, 3, 2)] * 3 "
                "+ [(512, 3, 1)] + [(512, 2, 1)] * 2"
            ),
            embed_dim=1024, num_heads=16, depth=16, prenet_depth=8,
            conv_pos_depth=5, conv_pos_width=95, conv_pos_groups=16, avg_k=16,
            dec_dim=768, dec_kernel=7, dec_groups=16, dec_layers=4,
        )
        _run_pretrain_parity(cfg, wav_len=8_000, batch=1, mask_frac=0.93)
