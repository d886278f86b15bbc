"""Single-headed YAML config system.

Replaces the reference's two config stacks (OmegaConf YAML for TeReDiff +
detectron2 yacs CfgNode for TESTR — /root/reference/initialize.py:17-216,
testr/adet/config/*) with one plain-YAML -> dataclass pipeline. Model
geometry comes from named presets ("default" = production TAIR geometry,
"tiny" = CI geometry) with optional per-field overrides.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import yaml

from .data.batch_transform import DegradationConfig


@dataclass
class DatasetConfig:
    kind: str = "synthetic"          # "satext" | "synthetic"
    image_root: str = ""
    ann_path: str = ""
    out_size: int = 512
    p_empty_prompt: float = 0.2
    max_instances: int = 32
    synthetic_length: int = 256


@dataclass
class TrainConfig:
    stage: str = "stage1"            # stage1 | stage2 | stage3
    train_steps: int = 100_000
    batch_size: int = 3
    learning_rate: float = 1e-4
    # micro-batches averaged per optimizer update (optax.MultiSteps);
    # train_steps counts micro-steps, so updates = train_steps // grad_accum
    grad_accum: int = 1
    ckpt_every: int = 25_000
    # 0 = off. Periodic weight-only float16 .npz export (params only, no
    # optimizer state) to exp_dir/params_step_N.npz — ~5x cheaper than the
    # orbax TrainState save on a remote chip, and directly loadable by the
    # eval/A-B entry points and as init_params
    save_params_every: int = 0
    # False skips the end-of-training orbax TrainState save (exact-resume
    # artifact; ~17 min of device_get for the full default model through
    # the remote-chip relay) — use with save_params_every when the weights
    # export is the only artifact needed
    final_checkpoint: bool = True
    log_loss_every: int = 50
    log_image_every: int = 500
    num_val_images: int = 2
    ocr_loss_weight: float = 0.0
    unet_feat_sampling_timestep: Tuple[int, ...] = (10, 20, 30, 40, 50)
    # 0 = off (uniform over the full schedule, reference train.py:148).
    # When set, training timesteps sample from U(0, timestep_max) instead.
    # Stage-2 curriculum substitute for the reference's PRETRAINED TESTR
    # warm start (reference train.py:100 loads testr_ckpt_dir): our spotter
    # learns recognition from scratch, and at t>~300 the q_sample'd latent
    # carries no legible glyphs — uniform-t gradients then push the text
    # head toward the marginal letter distribution (the measured step-15000
    # degenerate "BB" state, docs/measurements/spotter_diag_step15000.json).
    # Stage 2 freezes every diffusion weight, so restricting t changes only
    # the feature distribution the spotter trains on, not the diffusion
    # model; eval reads features at late sampling steps (low t) where this
    # distribution matches.
    timestep_max: int = 0
    exp_dir: str = "./runs/exp"
    resume: Optional[str] = None
    # weight-only .npz (train/checkpoint.py save_params) merged into the
    # fresh init before training — e.g. in-env pretrained SwinIR/VAE from
    # scripts/pretrain_demo.py (the reference instead loads external SD /
    # DiffBIR checkpoints at this point, initialize.py:155-166)
    init_params: Optional[str] = None
    seed: int = 0
    n_data_devices: Optional[int] = None  # default: all devices
    log_tool: Optional[str] = None   # None/jsonl | tensorboard | wandb
    # "hungarian" (exact on-device JV, default) | "hungarian_host" | "greedy"
    matcher: str = "hungarian"
    # ZeRO-style sharding of params + optimizer moments over the data axis
    # (parallel/fsdp.py); the reference replicates per DDP rank instead
    fsdp: bool = False


@dataclass
class ValConfig:
    lq_dir: str = ""
    gt_dir: Optional[str] = None
    output_dir: str = "./results"
    steps: int = 50
    prompt_style: str = "CAPTION"    # CAPTION | TAG
    score_threshold: float = 0.5
    cfg_scale: float = 1.0
    seed: int = 231
    niqe_params: Optional[str] = None  # pristine-MVG .npz (utils/niqe.py)
    # full-reference perceptual metrics; each needs two external torch
    # checkpoints (docs/METRIC_WEIGHTS.md): "backbone_path:head_path"
    lpips_weights: Optional[str] = None  # alexnet.pth:lpips_alex.pth
    dists_weights: Optional[str] = None  # vgg16.pth:dists_weights.pt
    clipiqa_weights: Optional[str] = None  # CLIP RN50 state dict (RN50.pt)
    maniqa_weights: Optional[str] = None  # MANIQA ckpt (ckpt_koniq10k.pt)
    musiq_weights: Optional[str] = None  # MUSIQ ckpt (see utils/musiq.py)
    # tiled (val_patches) settings
    patch_size: int = 128
    overlap: int = 16
    out_scale: int = 4
    chunk: Optional[int] = None
    # run the full per-step OCR-feedback loop on every patch (reference
    # val_patches semantics); False = plain restoration, empty prompt
    tiled_ocr_loop: bool = True


@dataclass
class ExperimentConfig:
    model_preset: str = "default"    # "default" | "tiny"
    # TESTRConfig field overrides (e.g. use_checkpoint, enc_msda_q_chunk)
    testr_overrides: Dict[str, Any] = field(default_factory=dict)
    dtype: str = "bfloat16"
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    degradation: DegradationConfig = field(default_factory=DegradationConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    val: ValConfig = field(default_factory=ValConfig)
    weights: Dict[str, str] = field(default_factory=dict)  # torch ckpt paths


def _merge_dataclass(cls, data: Dict[str, Any]):
    """Build dataclass from dict, recursing into dataclass fields."""
    if data is None:
        return cls()
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) or f.name in (
            "dataset", "degradation", "train", "val",
        ):
            sub = {
                "dataset": DatasetConfig,
                "degradation": DegradationConfig,
                "train": TrainConfig,
                "val": ValConfig,
            }.get(f.name)
            kwargs[f.name] = _merge_dataclass(sub, v) if sub else v
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def load_config(path: str) -> ExperimentConfig:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return _merge_dataclass(ExperimentConfig, data)


def build_model(cfg: ExperimentConfig):
    from .pipeline import build_default_model, build_tiny_model

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.dtype]
    if cfg.model_preset == "default":
        return build_default_model(dtype=dtype,
                                   testr_overrides=cfg.testr_overrides or None)
    if cfg.model_preset == "tiny":
        return build_tiny_model(dtype=dtype)
    raise ValueError(f"unknown model preset {cfg.model_preset!r}")


def build_dataset(cfg: ExperimentConfig, mode: str = "TRAIN"):
    from .data.satext import (
        SATextDataset,
        SyntheticSAText,
        load_satext_file_list,
    )

    d = cfg.dataset
    if d.kind == "synthetic":
        return SyntheticSAText(size=d.out_size, length=d.synthetic_length,
                               seed=0 if mode == "TRAIN" else 1)
    records = load_satext_file_list(
        d.image_root, d.ann_path, mode, d.out_size,
        val_sample=2 if mode == "VAL" else None, seed=0,
    )
    return SATextDataset(records, d.out_size, d.p_empty_prompt)
