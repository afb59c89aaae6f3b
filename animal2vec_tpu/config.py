"""Typed configuration tree for animal2vec-tpu.

This replaces the reference's hydra/omegaconf/fairseq-dataclass registry
(/root/reference/animal2vec_train.py:10-19 and the ``@dataclass`` configs spread
over /root/reference/nn/*.py) with a single, explicit, typed tree:

* every knob of the reference configs (configs/MeerKAT/*.yaml) is expressible,
* YAML loading with strict key checking,
* dotted-path CLI overrides (``model.depth=16``) replacing hydra override syntax,
* cross-references (omegaconf ``II(...)`` in the reference, e.g.
  /root/reference/nn/data2vec2.py:145-158) are resolved eagerly by
  :func:`resolve` once at build time.

No hydra, no omegaconf, no registries: plain dataclasses.
"""

from __future__ import annotations

import ast
import copy
import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, List, Optional, Sequence, Tuple

import yaml


def parse_pylist(expr):
    """Safely evaluate the reference's conv-layer spec strings, e.g.
    ``"[(512, 3, 2)] * 3 + [(512, 2, 1)]"`` — list/tuple literals combined
    with + and * only (the reference uses bare ``eval``,
    nn/audio_tasks.py:290). Already-parsed lists (e.g. a YAML override like
    ``dataset.bucket_lengths=[8000,16000]``) pass through unchanged."""
    if isinstance(expr, (list, tuple)):
        return list(expr)
    node = ast.parse(expr, mode="eval").body

    def ev(n):
        if isinstance(n, (ast.List, ast.Tuple, ast.Constant)):
            return ast.literal_eval(n)
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Add):
            return ev(n.left) + ev(n.right)
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult):
            return ev(n.left) * ev(n.right)
        raise ValueError(f"unsupported expression in list spec: {expr!r}")

    return ev(node)


# ---------------------------------------------------------------------------
# Leaf config groups
# ---------------------------------------------------------------------------


@dataclass
class CommonConfig:
    """Global run settings (reference: `common` yaml group)."""

    seed: int = 1
    # "bfloat16" for TPU throughput, "float32" for checkpoint logit parity.
    compute_dtype: str = "float32"
    log_interval: int = 100
    log_format: str = "json"
    tensorboard_logdir: str = ""
    profile: bool = False
    suppress_crashes: bool = False


@dataclass
class TaskConfig:
    """Audio task + dataset semantics (reference: nn/audio_tasks.py:41-90)."""

    data: str = ""
    sample_rate: int = 8_000
    normalize: bool = True
    with_labels: bool = False
    do_focal_prediction: bool = True
    min_label_size: int = 0
    enable_padding: bool = False
    max_sample_size: Optional[int] = None
    min_sample_size: int = 1
    # String form kept for parity with reference manifest tooling; parsed once.
    unique_labels: str = (
        "['beep', 'synch', 'sn', 'cc', 'ld', 'oth', 'mo', 'al', 'soc', 'agg',"
        " 'eating', 'focal']"
    )
    # [(dim, kernel, stride), ...] — reference a2v_large_pretrain_best.yaml:24
    conv_feature_layers: str = (
        "[(127, 63, 1)] + [(512, 10, 5)] + [(512, 3, 2)] * 3 + [(512, 3, 1)]"
        " + [(512, 2, 1)] * 2"
    )
    verbose_tensorboard_logging: bool = False

    def labels(self) -> List[str]:
        return list(ast.literal_eval(self.unique_labels))

    def conv_layers(self) -> List[Tuple[int, int, int]]:
        return [tuple(x) for x in parse_pylist(self.conv_feature_layers)]


@dataclass
class DatasetConfig:
    """Batching / loader settings (reference: `dataset` yaml group)."""

    max_tokens: int = 408_000
    batch_size: Optional[int] = None  # if set, overrides max_tokens batching
    # Static length buckets for variable-length training corpora, e.g.
    # "[20000, 40000, 80000]" (samples). Empty = single fixed shape. Each
    # bucket is one compiled step; batch size scales to keep max_tokens
    # constant. TPU-native replacement for the reference's length-sorted
    # max_tokens batching (nn/audio_tasks.py:453-459).
    bucket_lengths: str = ""
    num_workers: int = 8
    train_subset: str = "pretrain"
    valid_subset: str = "valid_0"
    validate_interval_updates: int = 10_000
    validate_after_updates: int = 0
    required_batch_size_multiple: int = 1
    disable_validation: bool = False
    skip_invalid_size_inputs: bool = True

    def buckets(self) -> List[int]:
        return [int(b) for b in parse_pylist(self.bucket_lengths)] if self.bucket_lengths else []


@dataclass
class DistributedConfig:
    """Mesh layout replacing the reference's DDP/FSDP/Megatron selection
    (/root/reference/nn/audio_train_routine.py:100-102,158-161)."""

    # -1 => use all devices for the data axis after model parallel is taken.
    data_parallel: int = -1
    model_parallel: int = 1
    # Shard parameters/optimizer state over the data axis (FSDP/ZeRO-style).
    fsdp: bool = False
    # >1 adds a "stage" mesh axis and GPipe-pipelines the trunk depth over
    # it (parallel/pipeline.py); depth must be divisible by it.
    pipeline_parallel: int = 1


@dataclass
class DecoderConfig:
    """Conv decoder (reference: nn/modalities/modules.py:34-47)."""

    decoder_dim: int = 384
    decoder_groups: int = 16
    decoder_kernel: int = 5
    decoder_layers: int = 5
    input_dropout: float = 0.1
    add_positions_masked: bool = False
    add_positions_all: bool = False
    decoder_residual: bool = True
    projection_layers: int = 1
    projection_ratio: float = 2.0
    # max lane-dense group-packing factor for the decoder convs
    # (ops/conv_arith.lane_pack_factor): 48-wide groups need 8 to go
    # lane-exact — ~8x those convs' FLOPs for unpadded (2.7x smaller)
    # activations/residuals; raise under training HBM pressure
    lane_pack_max: int = 2


@dataclass
class AudioModalityConfig:
    """Audio modality encoder knobs
    (reference: nn/modalities/base.py:30-72 + audio.py:29-52)."""

    prenet_depth: int = 4
    prenet_layerdrop: float = 0.0
    prenet_dropout: float = 0.0
    start_drop_path_rate: float = 0.0
    end_drop_path_rate: float = 0.0

    num_extra_tokens: int = 0
    init_extra_token_zero: bool = True

    mask_noise_std: float = 0.01
    mask_prob: float = 0.7
    mask_prob_min: Optional[float] = None
    inverse_mask: bool = False
    mask_prob_adjust: float = 0.0
    keep_masked_pct: float = 0.0
    mask_length: int = 5
    add_masks: bool = False
    remove_masks: bool = False
    mask_dropout: float = 0.0
    encoder_zero_mask: bool = True
    mask_channel_prob: float = 0.0
    mask_channel_length: int = 64

    ema_local_encoder: bool = False
    local_grad_mult: float = 1.0

    use_alibi_encoder: bool = False
    alibi_scale: float = 1.0
    learned_alibi: bool = False
    alibi_max_pos: Optional[int] = None
    learned_alibi_scale: bool = False
    learned_alibi_scale_per_head: bool = False
    learned_alibi_scale_per_layer: bool = False

    extractor_mode: str = "layer_norm"
    conv_pos_width: int = 95
    conv_pos_groups: int = 16
    conv_pos_depth: int = 5
    conv_pos_pre_ln: bool = False
    sinc_input: bool = True
    apply_window_to_root: bool = False
    sinc_norm: str = "instance"
    use_pswish: bool = False

    decoder: Optional[DecoderConfig] = field(default_factory=DecoderConfig)

    # resolved from task at build time (reference: II("task.*"))
    conv_feature_layers: str = ""
    sample_rate: int = 8_000
    num_alibi_heads: int = 12  # resolved from model.num_heads
    model_depth: int = 8  # resolved from model.depth


@dataclass
class ImageModalityConfig:
    """Image modality (reference: nn/modalities/images.py:40-56)."""

    prenet_depth: int = 4
    prenet_layerdrop: float = 0.0
    prenet_dropout: float = 0.0
    start_drop_path_rate: float = 0.0
    end_drop_path_rate: float = 0.0

    num_extra_tokens: int = 0
    init_extra_token_zero: bool = True

    mask_noise_std: float = 0.01
    mask_prob: float = 0.7
    mask_length: int = 5
    mask_prob_adjust: float = 0.0
    inverse_mask: bool = False
    mask_dropout: float = 0.0
    encoder_zero_mask: bool = True
    keep_masked_pct: float = 0.0

    ema_local_encoder: bool = False
    local_grad_mult: float = 1.0

    use_alibi_encoder: bool = False
    alibi_scale: float = 1.0
    learned_alibi_scale: bool = False
    learned_alibi_scale_per_head: bool = False
    learned_alibi_scale_per_layer: bool = False

    input_size: int = 224
    in_chans: int = 3
    patch_size: int = 16
    embed_dim: int = 768
    alibi_dims: int = 2
    alibi_distance: str = "manhattan"
    fixed_positions: bool = True
    transformer_decoder: bool = False
    enc_dec_transformer: bool = False

    decoder: Optional[DecoderConfig] = field(default_factory=DecoderConfig)

    num_alibi_heads: int = 12
    model_depth: int = 8


@dataclass
class ModalitiesConfig:
    audio: AudioModalityConfig = field(default_factory=AudioModalityConfig)
    image: ImageModalityConfig = field(default_factory=ImageModalityConfig)


@dataclass
class MixupConfig:
    """BC-learning mixup (reference: nn/data2vec2.py:159-166)."""

    mixup_prob: float = 0.5
    mixing_window_length: float = 0.1
    source_mixup: float = -1.0  # negative disables
    same_mixup: bool = True
    target_mixup: bool = False
    gain_mode: str = "A_weighting"


@dataclass
class ModelConfig:
    """data2vec-2.0 pretrain model (reference: nn/data2vec2.py:57-166)."""

    loss_beta: float = 0.0
    loss_scale: Optional[float] = None

    depth: int = 8
    start_drop_path_rate: float = 0.0
    end_drop_path_rate: float = 0.0
    num_heads: int = 12
    norm_eps: float = 1e-6
    norm_affine: bool = True
    encoder_dropout: float = 0.1
    post_mlp_drop: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    dropout_input: float = 0.0
    layerdrop: float = 0.0
    embed_dim: int = 768
    mlp_ratio: float = 4.0
    layer_norm_first: bool = False

    average_top_k_layers: int = 16
    end_of_block_targets: bool = False
    clone_batch: int = 1

    layer_norm_target_layer: bool = False
    batch_norm_target_layer: bool = False
    instance_norm_target_layer: bool = False
    instance_norm_targets: bool = False
    layer_norm_targets: bool = False

    ema_decay: float = 0.999
    ema_end_decay: float = 0.9999
    ema_anneal_end_step: int = -1  # resolved to optimization.max_update
    ema_encoder_only: bool = True
    log_norms: bool = True

    modalities: ModalitiesConfig = field(default_factory=ModalitiesConfig)
    shared_decoder: Optional[DecoderConfig] = None

    min_target_var: float = 0.1
    min_pred_var: float = 0.01

    supported_modality: str = "AUDIO"
    mae_init: bool = False
    skip_ema: bool = False

    cls_loss: float = 0.0
    recon_loss: float = 0.0
    d2v_loss: float = 1.0

    final_dropout: float = 0.0
    metric_threshold: float = 0.25

    mixup: MixupConfig = field(default_factory=MixupConfig)

    # "xla" | "flash" | "auto" — attention kernel selection (TPU: pallas flash)
    attn_impl: str = "auto"
    # "bf16" | "int8" | "int8_attn" — serving-only quantization. "int8":
    # weight+activation int8 for the trunk qkv/out/fc1/fc2 matmuls (int8 MXU
    # path, ~2x bf16 rate; fused Pallas MLP + dense kernels when lane-
    # aligned). "int8_attn": additionally runs QK^T/PV inside the flash
    # attention kernel in int8 (doubles the head_dim-64 structural floor).
    # Training paths ignore this and stay bf16/fp32.
    matmul_impl: str = "bf16"
    # "" | "int8": quantize the EMA TEACHER forward inside the pretrain
    # step (the teacher is pure inference — deterministic, stop-gradient;
    # nn/data2vec2.py:779-844). Serving-grade int8 there perturbs the
    # regression targets; measured accept/reject in docs/PERF.md round-5.
    # Student/backward always stay bf16/fp32.
    teacher_matmul_impl: str = ""
    # rematerialize transformer blocks during training to save HBM
    remat: bool = True
    # "mlp": recompute only the MLP sub-block in the backward (attention
    # keeps its flash residuals; ~15-20% faster step); "attn": recompute
    # the attention sub-block too (block-remat memory to within one
    # (B, T, C) stream per layer, but each sub-block recomputes exactly
    # once — "block" re-runs the fused MLP kernel twice); "block":
    # recompute whole blocks (smallest memory footprint)
    remat_scope: str = "mlp"
    # rematerialize the conv frontend (sinc + feature stack) in the backward:
    # its wav-rate activations (~80k samples deep) are large autodiff
    # residuals but cheap to recompute (<8% of step FLOPs)
    remat_frontend: bool = False
    # rematerialize the d2v decoders (grouped-conv stacks run at FULL
    # sequence length on every clone row): their (B*clone, T, C) conv
    # activations are ~1 GB/step at the v5e b8 recipe but recompute in
    # ~5 ms — freeing them is what admits batch 9+ on 16 GB chips.
    # Independent of `remat` (same semantics as remat_frontend).
    remat_decoder: bool = False
    # >1 pipelines the trunk over a "stage" mesh axis (parallel/pipeline.py);
    # set via distributed.pipeline_parallel, copied in by the model builders
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0  # 0 = auto (2 * stages)

    # resolved cross-refs
    with_labels: bool = False
    use_focal_loss: bool = True
    sample_rate: int = 8_000
    unique_labels: str = ""
    conv_feature_layers: str = ""


@dataclass
class FinetuneModelConfig:
    """Finetune wrapper (reference: nn/wav2vec2.py:40-55 + Wav2Vec2CtcConfig
    knobs consumed via arg_overrides nn/wav2vec2.py:94-130)."""

    w2v_path: str = ""
    no_pretrained_weights: bool = False
    load_ema: bool = False
    load_pretrain_weights: bool = False
    freeze_finetune_updates: int = 0
    feature_grad_mult: float = 0.0
    apply_mask: bool = True
    mask_prob: float = 0.5
    mask_length: int = 10
    mask_channel_prob: float = 0.0
    mask_channel_length: int = 64
    layer_decay: float = 1.0
    average_top_k_layers: int = 16

    dropout: float = 0.0
    dropout_input: float = 0.0
    activation_dropout: float = 0.0
    attention_dropout: float = 0.0
    final_dropout: float = 0.0
    layerdrop: float = 0.0
    drop_path: float = 0.0
    zero_mask: bool = False
    update_alibi: bool = True

    mixup: MixupConfig = field(default_factory=MixupConfig)

    # resolved
    sample_rate: int = 8_000
    unique_labels: str = ""
    use_focal_loss: bool = True


@dataclass
class CriterionConfig:
    """Loss + metric knobs (reference: nn/criterions.py:29-134)."""

    use_focal_loss: bool = True
    label_smoothing: float = 0.0
    report_accuracy: bool = True
    segmentation_metrics: bool = False
    metric_threshold: float = 0.25
    iou_threshold: float = 0.0
    sigma_s: float = 0.1
    maxfilt_s: float = 0.1
    max_duration_s: float = 0.5
    lowP: float = 0.125
    method: str = "avg"
    loss_weights: Optional[dict] = None
    log_keys: List[str] = field(default_factory=list)


@dataclass
class OptimizationConfig:
    """Optimizer + schedule (reference: `optimization`/`optimizer`/
    `lr_scheduler` yaml groups)."""

    lr: float = 1e-4
    max_update: int = 100_000
    update_freq: int = 1
    clip_norm: float = 1.0
    adam_betas: Tuple[float, float] = (0.9, 0.98)
    adam_eps: float = 1e-6
    weight_decay: float = 0.01
    warmup_updates: int = 10_000
    warmup_init_lr: float = 0.0
    min_lr: float = 0.0
    schedule: str = "cosine"
    # extra stop conditions (nn/audio_train_routine.py:194-199,399-416)
    stop_time_hours: float = 0.0  # 0 = unlimited
    stop_min_lr: float = -1.0  # stop once the schedule lr falls below this


@dataclass
class CheckpointConfig:
    save_dir: str = "checkpoints"
    save_interval_updates: int = 10_000
    keep_last: int = 10
    best_checkpoint_metric: str = ""
    maximize_best_checkpoint_metric: bool = True
    restore_file: str = ""
    # early-stop after N validations without best-metric improvement; 0 = off
    # (reference: checkpoint.patience, nn/audio_train_routine.py:233-258)
    patience: int = 0


@dataclass
class Config:
    common: CommonConfig = field(default_factory=CommonConfig)
    task: TaskConfig = field(default_factory=TaskConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    distributed: DistributedConfig = field(default_factory=DistributedConfig)
    criterion: CriterionConfig = field(default_factory=CriterionConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    finetune: Optional[FinetuneModelConfig] = None


# ---------------------------------------------------------------------------
# YAML loading / overrides / resolution
# ---------------------------------------------------------------------------

_OPTIONAL_DATACLASS_FIELDS = {
    ("Config", "finetune"): FinetuneModelConfig,
    ("ModelConfig", "shared_decoder"): DecoderConfig,
    ("AudioModalityConfig", "decoder"): DecoderConfig,
    ("ImageModalityConfig", "decoder"): DecoderConfig,
}


def _merge_into(obj: Any, data: dict, path: str = "") -> Any:
    """Recursively merge a raw dict into a dataclass instance, strict on keys."""
    if not isinstance(data, dict):
        raise TypeError(f"expected mapping at {path or '<root>'}, got {type(data)}")
    valid = {f.name: f for f in fields(obj)}
    for key, value in data.items():
        if key not in valid:
            raise KeyError(f"unknown config key: {path}{key}")
        current = getattr(obj, key)
        cls_key = (type(obj).__name__, key)
        if current is None and cls_key in _OPTIONAL_DATACLASS_FIELDS:
            if value is None:
                continue
            current = _OPTIONAL_DATACLASS_FIELDS[cls_key]()
            setattr(obj, key, current)
        if is_dataclass(current) and isinstance(value, dict):
            _merge_into(current, value, path=f"{path}{key}.")
        else:
            setattr(obj, key, _coerce(current, value, f"{path}{key}"))
    return obj


def _coerce(current: Any, value: Any, path: str) -> Any:
    if value is None:
        return None
    if isinstance(current, bool):
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            return value.strip().lower() in ("1", "true", "yes", "on")
        return bool(value)
    if isinstance(current, int) and not isinstance(current, bool):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, tuple):
        if isinstance(value, str):
            value = ast.literal_eval(value)
        return tuple(value)
    return value


def set_by_path(cfg: Any, dotted: str, value: Any) -> None:
    """Apply a single ``a.b.c=value`` override."""
    parts = dotted.split(".")
    obj = cfg
    for i, part in enumerate(parts[:-1]):
        nxt = getattr(obj, part)
        if nxt is None:
            cls_key = (type(obj).__name__, part)
            if cls_key in _OPTIONAL_DATACLASS_FIELDS:
                nxt = _OPTIONAL_DATACLASS_FIELDS[cls_key]()
                setattr(obj, part, nxt)
            else:
                raise KeyError(f"cannot descend into None at {'.'.join(parts[: i + 1])}")
        obj = nxt
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise KeyError(f"unknown config key: {dotted}")
    current = getattr(obj, leaf)
    if isinstance(value, str) and (is_dataclass(current) or current is None):
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
    if is_dataclass(current) and isinstance(value, dict):
        _merge_into(current, value, path=dotted + ".")
    else:
        setattr(obj, leaf, _coerce(current, value, dotted))


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must look like key=value, got {ov!r}")
        key, value = ov.split("=", 1)
        try:
            parsed: Any = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            parsed = value
        set_by_path(cfg, key.strip(), parsed)
    return cfg


def resolve(cfg: Config) -> Config:
    """Resolve cross-group references, mirroring the reference's II() wiring
    (nn/data2vec2.py:145-158, nn/audio_tasks.py:86-89, nn/wav2vec2.py:42-47,
    nn/modalities/base.py:69-70)."""
    cfg = copy.deepcopy(cfg)
    m = cfg.model
    m.with_labels = cfg.task.with_labels
    m.use_focal_loss = cfg.criterion.use_focal_loss
    m.sample_rate = cfg.task.sample_rate
    m.unique_labels = cfg.task.unique_labels
    m.conv_feature_layers = cfg.task.conv_feature_layers
    if m.ema_anneal_end_step < 0:
        m.ema_anneal_end_step = cfg.optimization.max_update
    for mod in (m.modalities.audio, m.modalities.image):
        mod.num_alibi_heads = m.num_heads
        mod.model_depth = m.depth
    m.modalities.audio.conv_feature_layers = cfg.task.conv_feature_layers
    m.modalities.audio.sample_rate = cfg.task.sample_rate
    if cfg.finetune is not None:
        ft = cfg.finetune
        ft.sample_rate = cfg.task.sample_rate
        ft.unique_labels = cfg.task.unique_labels
        ft.use_focal_loss = cfg.criterion.use_focal_loss
    # matmul routing: fail at config time on typos (a silently-unknown
    # value would run plain bf16 while the user believes int8 is on)
    if m.matmul_impl not in ("bf16", "int8", "int8_attn"):
        raise ValueError(
            f"model.matmul_impl={m.matmul_impl!r}: expected one of "
            "'bf16', 'int8', 'int8_attn'"
        )
    if m.teacher_matmul_impl not in ("", "bf16", "int8", "int8_attn"):
        raise ValueError(
            f"model.teacher_matmul_impl={m.teacher_matmul_impl!r}: expected "
            "'' (follow matmul_impl), 'bf16', 'int8', or 'int8_attn'"
        )
    pp = cfg.distributed.pipeline_parallel
    if pp > 1 and m.depth % pp != 0:
        # fail at config time: at apply time the pipelined path would only
        # decline with a warning and run the plain scan on 1/pp of the slice
        raise ValueError(
            f"model.depth={m.depth} is not divisible by "
            f"distributed.pipeline_parallel={pp}"
        )
    return cfg


def load_config(path: Optional[str] = None, overrides: Sequence[str] = ()) -> Config:
    cfg = Config()
    if path:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        _merge_into(cfg, raw)
    apply_overrides(cfg, overrides)
    return resolve(cfg)


def to_dict(cfg: Any) -> Any:
    if is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(x) for x in cfg]
    return cfg


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)
