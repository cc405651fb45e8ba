"""Optimizer construction: AdamW with LR groups, staged freezing, cosine schedule.

Reproduces the reference's trainer optimizer semantics:
- separate LR for mm_projector/sampler params (`mm_projector_lr`,
  llava/train/llava_trainer.py:163-246);
- staged freezing: `tune_mm_mlp_adapter` trains only projector+sampler,
  `freeze_mm_mlp_adapter` freezes the projector, `mm_learnable_gated` pins one
  gated expert (train.py:1114-1134); the vision tower is frozen by default
  (clip_encoder.py:46 @torch.no_grad);
- no weight decay on norms/biases/1-d params;
- cosine LR decay with linear warmup (scripts/llama/llama3_8b_pt.sh:35-37).

Freezing is expressed as an optax mask (zero updates), the JAX-native equivalent of
requires_grad=False — frozen params also skip optimizer-state memory via
optax.multi_transform's set_to_zero.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = None
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    max_grad_norm: float = 1.0
    lr_schedule: str = "cosine"
    # staged-freezing flags (reference train.py:1114-1134)
    tune_mm_mlp_adapter: bool = False
    freeze_mm_mlp_adapter: bool = False
    freeze_backbone: bool = False
    unfreeze_mm_vision_tower: bool = False
    mm_learnable_gated: int = -1
    gradient_accumulation_steps: int = 1
    # "adamw" (fp32 moments) or "adamw8bit" (blockwise int8 moments,
    # train/opt8.py — 3.9x less optimizer HBM; the bnb-8-bit-Adam role)
    optim: str = "adamw"


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def trainable_label(path, leaf, tc: TrainConfig) -> str:
    """'base' | 'proj' (projector/sampler LR group) | 'frozen'."""
    s = _path_str(path)
    if s.startswith("vision/"):
        return "base" if tc.unfreeze_mm_vision_tower else "frozen"
    if s.startswith(("projector/", "sampler/")):
        if tc.freeze_mm_mlp_adapter and s.startswith("projector/"):
            return "frozen"
        # expert pinning: mm_learnable_gated==0 trains the MLP expert only
        # (attention adapter frozen); ==1 trains the adapter (MLP expert frozen).
        if s.startswith("projector/"):
            if tc.mm_learnable_gated == 0 and s.startswith("projector/attn/"):
                return "frozen"
            if tc.mm_learnable_gated == 1 and s.startswith("projector/projection/"):
                return "frozen"
        return "proj" if tc.mm_projector_lr is not None else "base"
    # LLM body
    if tc.tune_mm_mlp_adapter or tc.freeze_backbone:
        return "frozen"
    return "base"


def label_tree(params, tc: TrainConfig):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: trainable_label(path, leaf, tc), params)


def _decay_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: leaf.ndim >= 2 and "norm" not in _path_str(path).lower(),
        params)


def make_schedule(tc: TrainConfig, lr: float):
    warmup = max(int(tc.total_steps * tc.warmup_ratio), 1)
    if tc.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, max(tc.total_steps, warmup + 1), end_value=0.0)
    if tc.lr_schedule == "linear":  # HF lr_scheduler_type="linear": decay to 0
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.linear_schedule(lr, 0.0, max(tc.total_steps - warmup, 1))],
            [warmup])
    return optax.linear_schedule(lr, lr, 1)  # "constant"


def make_optimizer(params, tc: TrainConfig):
    """Returns (optax.GradientTransformation, labels pytree)."""
    def adamw(lr):
        if tc.optim == "adamw8bit":
            from .opt8 import adamw8bit
            inner = adamw8bit(make_schedule(tc, lr), b1=tc.adam_b1,
                              b2=tc.adam_b2, eps=tc.adam_eps,
                              weight_decay=tc.weight_decay,
                              mask=_decay_mask(params))
        else:
            inner = optax.adamw(make_schedule(tc, lr), b1=tc.adam_b1,
                                b2=tc.adam_b2, eps=tc.adam_eps,
                                weight_decay=tc.weight_decay,
                                mask=_decay_mask(params))
        return optax.chain(optax.clip_by_global_norm(tc.max_grad_norm),
                           inner)

    labels = label_tree(params, tc)
    tx = optax.multi_transform(
        {"base": adamw(tc.learning_rate),
         "proj": adamw(tc.mm_projector_lr or tc.learning_rate),
         "frozen": optax.set_to_zero()},
        labels)
    if tc.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, tc.gradient_accumulation_steps)
    return tx, labels


def make_lora_optimizer(trainable, tc: TrainConfig):
    """Optimizer over the LoRA trainable tree ({"adapters": ..., "extras": ...}).

    Mirrors the reference's LoRA runs: adapters at the base LR, the
    mm_projector/sampler extras in the separate mm_projector_lr group
    (llava_trainer.py:163-246 — LoRA-SFT keeps the projector trainable outside
    PEFT, saved as non_lora_trainables.bin). Optimizer state exists ONLY for
    this small tree — the frozen (possibly quantized) base carries no Adam
    moments, which is what makes single-chip QLoRA of an 8B fit."""
    def adamw(lr):
        if tc.optim == "adamw8bit":
            from .opt8 import adamw8bit
            inner = adamw8bit(make_schedule(tc, lr), b1=tc.adam_b1,
                              b2=tc.adam_b2, eps=tc.adam_eps,
                              weight_decay=tc.weight_decay,
                              mask=_decay_mask(trainable))
        else:
            inner = optax.adamw(make_schedule(tc, lr), b1=tc.adam_b1,
                                b2=tc.adam_b2, eps=tc.adam_eps,
                                weight_decay=tc.weight_decay,
                                mask=_decay_mask(trainable))
        return optax.chain(optax.clip_by_global_norm(tc.max_grad_norm),
                           inner)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, leaf: ("proj" if _path_str(path).startswith("extras/")
                            else "base"),
        trainable)
    tx = optax.multi_transform(
        {"base": adamw(tc.learning_rate),
         "proj": adamw(tc.mm_projector_lr or tc.learning_rate)},
        labels)
    if tc.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, tc.gradient_accumulation_steps)
    return tx, labels
