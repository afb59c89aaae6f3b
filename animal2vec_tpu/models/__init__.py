from animal2vec_tpu.models.modules import (
    AltAttention,
    AltBlock,
    BlockStack,
    Decoder1d,
    Decoder2d,
    EncDecBlock,
    Fp32LayerNorm,
    Mlp,
)
from animal2vec_tpu.models.frontend import (
    ConvFeatureExtractor,
    PSwish,
    PCEN,
    SincConv,
)
from animal2vec_tpu.models.audio_encoder import AudioEncoder
from animal2vec_tpu.models.images import ImageEncoder, PatchEmbed
from animal2vec_tpu.models.data2vec2 import Data2VecMulti
from animal2vec_tpu.models.finetune import FinetuneModel
