"""animal2vec-tpu: a TPU-native (JAX/XLA/Pallas) self-supervised bioacoustics
framework with the capabilities of livingingroups/animal2vec.

Layering (SURVEY.md §7):
  config   — typed dataclass config tree (replaces hydra/fairseq registry)
  ops      — pure numerics (sinc filters, masking, ALiBi, losses, mixup, ...)
  models   — flax.linen modules (frontend, encoders, data2vec2, finetune)
  parallel — mesh + partition specs (DP / FSDP / TP over one jax Mesh)
  train    — optax train states, jitted steps, checkpoints, converters
  data     — host input pipeline (manifests, wav decode, label rasterize)
  evalx    — event segmentation metric suite, reports, inference helpers
  tools    — CLI entry points
"""

__version__ = "0.1.0"

from animal2vec_tpu.config import Config, load_config
