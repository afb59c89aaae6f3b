"""Frame-level multi-label finetune model.

Covers nn/wav2vec2.py (Wav2VecCcasFinetune / Wav2VecEncoderModOut): wraps a
pretrained Data2VecMulti encoder, averages the last-k transformer layer taps,
and projects to per-frame class logits. The reference's runtime machinery
(checkpoint surgery :311-360, arg overrides :94-130, freeze gate :442-448)
maps to:

* train/convert.py + train/finetune.py build the encoder config with the
  override knobs and load/strip pretrained weights,
* the freeze-first-N-updates gate is a traced `lax.cond` on a scalar, so one
  compiled step serves both phases,
* masking-as-regularization (apply_mask + channel mask) is sampled in the
  train step and passed in as MaskInfo.
"""

from __future__ import annotations

import ast
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from animal2vec_tpu.config import FinetuneModelConfig, ModelConfig
from animal2vec_tpu.models.data2vec2 import Data2VecMulti
from animal2vec_tpu.models.modules import top_k_tap_average
from animal2vec_tpu.ops.masking import MaskInfo


class FinetuneModel(nn.Module):
    """encoder (Data2VecMulti) -> average last-k taps -> dropout -> Linear."""

    cfg: FinetuneModelConfig
    encoder_cfg: ModelConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Data2VecMulti(cfg=self.encoder_cfg, dtype=self.dtype)
        self.final_dropout = nn.Dropout(self.cfg.final_dropout)
        n_classes = len(ast.literal_eval(self.cfg.unique_labels))
        self.proj = nn.Dense(
            n_classes, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform()
        )

    def __call__(
        self,
        source: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        mask_info: Optional[MaskInfo] = None,
        channel_mask: Optional[jnp.ndarray] = None,
        finetune_encoder=True,
        deterministic: bool = True,
        mode: str = "AUDIO",
    ) -> dict:
        res = self.encoder.extract_features(
            source,
            mode=mode,
            padding_mask=padding_mask,
            mask_info=mask_info,
            channel_mask=channel_mask,
            zero_mask=self.cfg.zero_mask,
            deterministic=deterministic,
        )
        taps = res["layer_results"]  # (depth, B, T, C)
        k = self.cfg.average_top_k_layers
        x = top_k_tap_average(taps, res.get("layer_keeps"), k).astype(taps.dtype)
        # freeze gate (nn/wav2vec2.py:442-448): before freeze_finetune_updates
        # only the classifier head receives gradients.
        x = jax.lax.cond(
            jnp.asarray(finetune_encoder, bool),
            lambda v: v,
            jax.lax.stop_gradient,
            x,
        )
        x = self.final_dropout(x, deterministic=deterministic)
        logits = self.proj(x)
        return {
            "encoder_out": logits,  # (B, T, n_classes)
            "padding_mask": res["padding_mask"],
            "layer_results": taps,
        }
