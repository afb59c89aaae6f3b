from animal2vec_tpu.ops.conv_arith import (
    conv_out_length,
    feature_extractor_out_length,
    label_frame_length,
    same_pad_1d,
    strided_pad_1d,
)
from animal2vec_tpu.ops.sinc import mel_init_filterbank, sinc_filters
from animal2vec_tpu.ops.alibi import alibi_slopes, alibi_bias_1d, alibi_bias_2d
from animal2vec_tpu.ops.losses import sigmoid_focal_loss, d2v_regression_loss, label_smoothed_nll_loss
from animal2vec_tpu.ops.masking import (
    MaskInfo,
    span_mask,
    exactify_mask,
    make_mask_info,
    apply_mask,
    random_masking,
    gather_keep,
    masked_alibi,
    expected_span_mask_tokens,
    block_mask_2d,
)
from animal2vec_tpu.ops.grouped_conv import grouped_conv1d, grouped_conv2d
from animal2vec_tpu.ops.mixup import a_weighting_table, compute_gain, bc_mixup
from animal2vec_tpu.ops.stats import (
    confusion_counts,
    compute_var,
    get_annealed_rate,
    multilabel_accuracy,
)
from animal2vec_tpu.ops.frames import rasterize_labels, downsample_targets
from animal2vec_tpu.ops.audio import chunk_and_normalize, layer_norm_1d
from animal2vec_tpu.ops.ring_attention import (
    ring_flash_attention,
    ring_attention_sharded,
)
