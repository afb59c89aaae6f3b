"""Model/state factories: the wiring the reference does through the fairseq
registry + checkpoint surgery.

build_finetune_encoder_cfg mirrors the arg_overrides dict applied when a
pretrained checkpoint is wrapped for finetuning (nn/wav2vec2.py:94-130) plus
remove_pretraining_modules (nn/data2vec2.py:1125-1143): dropouts come from
the finetune config, decoders are dropped, clone_batch collapses to 1, the
frontend gradient is scaled by feature_grad_mult.

Mesh-context requirement: when a train step built from these models runs
under a multi-axis mesh (tp/pp), trace it inside ``with mesh:`` (or
``jax.sharding.set_mesh``) — the shipped loops and the dryrun all do. The
grouped-conv partition-correct weight-grad gate (ops/grouped_conv.py) and
the pipelined trunk both discover the mesh from that ambient context (plus
jit's abstract mesh); a step jitted with explicit NamedSharding arguments
and no mesh context can silently keep XLA's over-reduced grouped dW under
tp/pp. Set A2V_FORCE_SAFE_DW=1 if you must trace that way.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from animal2vec_tpu.config import Config, FinetuneModelConfig, ModelConfig
from animal2vec_tpu.models.data2vec2 import Data2VecMulti
from animal2vec_tpu.models.finetune import FinetuneModel
from animal2vec_tpu.train.optim import build_optimizer, layer_decay_scales
from animal2vec_tpu.train.state import FinetuneState, PretrainState


def compute_dtype(cfg: Config):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.common.compute_dtype]


def _with_pipeline(mcfg: ModelConfig, cfg: Config) -> ModelConfig:
    """Copy distributed.pipeline_parallel into the model's pipeline_stages
    so one knob configures both the mesh axis and the trunk schedule."""
    pp = cfg.distributed.pipeline_parallel
    if pp > 1 and mcfg.pipeline_stages == 1:
        mcfg = copy.deepcopy(mcfg)
        mcfg.pipeline_stages = pp
    return mcfg


def build_pretrain_model(cfg: Config) -> Data2VecMulti:
    return Data2VecMulti(
        cfg=_with_pipeline(cfg.model, cfg), dtype=compute_dtype(cfg)
    )


def build_finetune_encoder_cfg(pre: ModelConfig, ft: FinetuneModelConfig) -> ModelConfig:
    cfg = copy.deepcopy(pre)
    cfg.encoder_dropout = ft.dropout
    cfg.attention_dropout = ft.attention_dropout
    cfg.activation_dropout = ft.activation_dropout
    cfg.dropout_input = ft.dropout_input
    cfg.post_mlp_drop = ft.dropout
    cfg.layerdrop = ft.layerdrop
    cfg.start_drop_path_rate = ft.drop_path
    cfg.end_drop_path_rate = ft.drop_path
    cfg.with_labels = False
    cfg.clone_batch = 1
    cfg.skip_ema = True
    cfg.shared_decoder = None
    cfg.recon_loss = 0.0
    audio = cfg.modalities.audio
    audio.prenet_layerdrop = ft.layerdrop
    audio.prenet_dropout = ft.dropout
    audio.encoder_zero_mask = ft.zero_mask
    audio.inverse_mask = False
    audio.learned_alibi_scale = ft.update_alibi
    audio.local_grad_mult = ft.feature_grad_mult
    audio.mask_channel_prob = ft.mask_channel_prob
    audio.mask_channel_length = ft.mask_channel_length
    audio.decoder = None
    cfg.modalities.image.decoder = None
    return cfg


def build_finetune_model(cfg: Config) -> FinetuneModel:
    assert cfg.finetune is not None, "config has no finetune section"
    enc_cfg = build_finetune_encoder_cfg(cfg.model, cfg.finetune)
    return FinetuneModel(
        cfg=cfg.finetune, encoder_cfg=_with_pipeline(enc_cfg, cfg),
        dtype=compute_dtype(cfg),
    )


def init_pretrain(
    cfg: Config, rng: jax.Array, example_wav_len: int = 80_000, example_batch: int = 1
) -> Tuple[Data2VecMulti, PretrainState]:
    model = build_pretrain_model(cfg)
    src = jnp.zeros((example_batch, example_wav_len), jnp.float32)
    params = model.init(
        {"params": rng, "mask_noise": jax.random.fold_in(rng, 1)}, src
    )["params"]
    tx, _ = build_optimizer(cfg.optimization, params)
    state = PretrainState.create(params, tx, cfg.model)
    return model, state


def init_finetune(
    cfg: Config,
    rng: jax.Array,
    pretrained_params: Optional[Any] = None,
    example_wav_len: int = 80_000,
    example_batch: int = 1,
) -> Tuple[FinetuneModel, FinetuneState]:
    model = build_finetune_model(cfg)
    src = jnp.zeros((example_batch, example_wav_len), jnp.float32)
    params = model.init({"params": rng}, src)["params"]
    if pretrained_params is not None:
        params = load_pretrained_into_finetune(params, pretrained_params, cfg)
    scales = None
    if cfg.finetune.layer_decay < 1.0:
        scales = layer_decay_scales(
            params,
            cfg.finetune.layer_decay,
            ("encoder", "audio_encoder", "context_encoder", "blocks", "block"),
            ("encoder", "blocks", "block"),
            cfg.model.modalities.audio.prenet_depth,
            cfg.model.depth,
        )
    tx, _ = build_optimizer(cfg.optimization, params, layer_scales=scales)
    return model, FinetuneState.create(params, tx)


def load_pretrained_into_finetune(
    ft_params: Any, pre_params: Any, cfg: Config
) -> Any:
    """Copy pretrained weights into the finetune encoder, dropping the
    decoders / EMA / recon head (nn/wav2vec2.py:311-360). Optionally reuse
    the pretrain linear probe as the classifier head
    (nn/wav2vec2.py:240-262)."""
    import flax.traverse_util as tu

    flat_ft = dict(tu.flatten_dict(ft_params))
    flat_pre = tu.flatten_dict(pre_params)
    loaded = 0
    for path, val in flat_pre.items():
        tgt = ("encoder",) + tuple(path)
        if tgt in flat_ft:
            assert flat_ft[tgt].shape == val.shape, (path, flat_ft[tgt].shape, val.shape)
            flat_ft[tgt] = val
            loaded += 1
    if cfg.finetune.load_pretrain_weights:
        src = ("linear_eval_projection",)
        for leaf in ("kernel", "bias"):
            if src + (leaf,) in flat_pre and ("proj", leaf) in flat_ft:
                flat_ft[("proj", leaf)] = flat_pre[src + (leaf,)]
    assert loaded > 0, "no pretrained weights matched the finetune encoder"
    return tu.unflatten_dict(flat_ft)
