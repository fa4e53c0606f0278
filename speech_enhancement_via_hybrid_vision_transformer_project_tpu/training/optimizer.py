"""Optimizer + LR schedule factories (optax).

TPU-native equivalent of the reference's torch.optim factories (reference:
training/optimizer.py). Schedules are **per-epoch** functions mapping
epoch -> lr, exactly like the reference's epoch-level scheduler.step()
semantics (training/trainer.py:303-309), driven through
``optax.inject_hyperparams`` so the lr is a plain state field the trainer
updates once per epoch (no retracing).

Replicates the reference's quirk that ``cosine`` ignores warmup_epochs
(SURVEY.md §7.5): warmup only happens under ``warmup_cosine``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional

import optax


def create_optimizer(
    config: dict,
    learning_rate: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam / AdamW / SGD from config (reference: training/optimizer.py:20-73;
    defaults AdamW lr=1e-4 wd=0.01). Wrapped in inject_hyperparams so
    ``opt_state.hyperparams['learning_rate']`` is mutable per epoch."""
    oc = config.get("training", config).get("optimizer", {})
    name = oc.get("name", "adamw").lower()
    lr = learning_rate if learning_rate is not None else oc.get("lr", 1e-4)
    betas = tuple(oc.get("betas", (0.9, 0.999)))
    eps = oc.get("eps", 1e-8)
    wd = oc.get("weight_decay", 0.01)

    if name == "adam":
        base = optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps
        )
    elif name == "adamw":
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=wd,
        )
    elif name == "sgd":
        base = optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr,
            momentum=oc.get("momentum", 0.9),
            nesterov=oc.get("nesterov", False),
        )
    else:
        raise ValueError(f"Unknown optimizer: {name}")
    return base


def chain_with_clip(
    optimizer: optax.GradientTransformation, max_norm: float | None
) -> optax.GradientTransformation:
    """Global-norm clip before the optimizer — keeps the reference's
    clip-after-unscale semantics (training/trainer.py:167-174) without a
    GradScaler (bf16 needs none, SURVEY.md §7.12)."""
    if not max_norm or max_norm <= 0:
        return optimizer
    return optax.chain(optax.clip_by_global_norm(max_norm), optimizer)


# ---------------------------------------------------------------------------
# Epoch-level LR schedules
# ---------------------------------------------------------------------------


@dataclass
class PlateauState:
    best: float = math.inf
    bad_epochs: int = 0
    lr: float = 0.0


class EpochScheduler:
    """epoch -> lr callable; ``step(epoch, val_loss)`` mirrors the torch
    scheduler API surface (plateau needs the metric)."""

    def __init__(self, fn: Callable[[int], float], name: str):
        self.fn = fn
        self.name = name

    def __call__(self, epoch: int, val_loss: float | None = None) -> float:
        return self.fn(epoch)


class PlateauScheduler(EpochScheduler):
    """ReduceLROnPlateau (reference: training/optimizer.py:117-125)."""

    def __init__(self, base_lr: float, patience: int, factor: float, min_lr: float):
        super().__init__(lambda e: self.state.lr, "plateau")
        self.state = PlateauState(lr=base_lr)
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr

    def __call__(self, epoch: int, val_loss: float | None = None) -> float:
        if val_loss is not None:
            if val_loss < self.state.best - 1e-12:
                self.state.best = val_loss
                self.state.bad_epochs = 0
            else:
                self.state.bad_epochs += 1
                if self.state.bad_epochs > self.patience:
                    self.state.lr = max(self.state.lr * self.factor, self.min_lr)
                    self.state.bad_epochs = 0
        return self.state.lr


def create_scheduler(
    config: dict, num_epochs: Optional[int] = None
) -> EpochScheduler:
    """Build the epoch-level schedule (reference: training/optimizer.py:76-133).

    ``cosine``: CosineAnnealingLR over num_epochs to min_lr (NO warmup —
    the reference's config says warmup_epochs=5 but the cosine branch
    ignores it; we replicate).
    ``warmup_cosine``: linear warmup then cosine (reference:
    training/optimizer.py:136-198).
    """
    tc = config.get("training", config)
    sc = tc.get("scheduler", {})
    oc = tc.get("optimizer", {})
    base_lr = oc.get("lr", 1e-4)
    name = sc.get("name", "cosine").lower()
    total = num_epochs or tc.get("num_epochs", 100)
    min_lr = sc.get("min_lr", 1e-6)

    if name in ("none", "", "constant"):
        return EpochScheduler(lambda e: base_lr, "none")
    if name == "cosine":
        def fn(epoch: int) -> float:
            t = min(epoch, total) / max(total, 1)
            return min_lr + 0.5 * (base_lr - min_lr) * (1 + math.cos(math.pi * t))
        return EpochScheduler(fn, "cosine")
    if name == "warmup_cosine":
        warmup = sc.get("warmup_epochs", 5)

        def fn(epoch: int) -> float:
            if epoch < warmup:
                return base_lr * (epoch + 1) / max(warmup, 1)
            t = (epoch - warmup) / max(total - warmup, 1)
            t = min(t, 1.0)
            return min_lr + 0.5 * (base_lr - min_lr) * (1 + math.cos(math.pi * t))
        return EpochScheduler(fn, "warmup_cosine")
    if name == "step":
        step_size = sc.get("step_size", 30)
        gamma = sc.get("gamma", 0.1)

        def fn(epoch: int) -> float:
            return base_lr * gamma ** (epoch // step_size)
        return EpochScheduler(fn, "step")
    if name == "plateau":
        return PlateauScheduler(
            base_lr,
            patience=sc.get("patience", 5),
            factor=sc.get("factor", 0.5),
            min_lr=min_lr,
        )
    raise ValueError(f"Unknown scheduler: {name}")


def warmup_cosine_step_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_lr: float = 0.0,
) -> optax.Schedule:
    """Step-level warmup+cosine as an optax schedule (reference:
    training/optimizer.py:201-278 defines two step-level variants it never
    uses; this is the TPU-native one for step-driven runs)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=min_lr,
    )
