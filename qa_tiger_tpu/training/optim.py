"""Optimizer + LR schedule factories (optax).

Reproduces the reference's optimization surface (src/trainutils.py:116-182):
Adam with betas from config (default (0.95, 0.999) in the shipped config),
optional weight decay, an optional separate encoder learning rate (name-match
on video_encoder/quest_encoder/audio_encoder/mllm), and three schedulers —
StepLR, timm-style cosine with warmup, and ReduceLROnPlateau.

Design: the transform is ``scale_by_adam`` (+ optional decoupled weight decay
matching torch Adam's L2-in-gradient form) with the learning rate applied as a
runtime scalar inside the jitted train step. That keeps ALL schedules —
including the stateful plateau scheduler, which depends on validation metrics
— as plain host-side float computations with zero recompilation.

Epoch-indexed schedule semantics match torch/timm exactly:
- StepLR: lr used during epoch e (1-based) = lr0 * gamma^((e-1) // step_size)
  (the reference calls sched.step(epoch) at epoch end, src/train.py:70).
- Cosine: timm CosineLRScheduler(t_initial=epochs, warmup_prefix=False,
  t_in_epochs=True): linear warmup from min_lr, then half-cosine from base lr
  to min_lr over t_initial epochs.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import optax

ENCODER_NAME_PARTS = ("video_encoder", "quest_encoder", "audio_encoder", "mllm")


def make_optimizer(betas: Tuple[float, float] = (0.95, 0.999),
                   weight_decay: float = 0.0,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam direction (unit LR); the step scales by the scheduled LR.

    torch.optim.Adam applies weight decay as L2 added to the gradient BEFORE
    the moment updates — optax.add_decayed_weights before scale_by_adam
    reproduces that ordering.
    """
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    txs.append(optax.scale(-1.0))
    return optax.chain(*txs)


def lr_multipliers(params, encoder_lr: Optional[float], base_lr: float):
    """Per-leaf LR multiplier pytree for the two-group split
    (src/trainutils.py:121-137). 1.0 everywhere unless encoder_lr is set."""
    if encoder_lr is None:
        return jax.tree_util.tree_map(lambda _: 1.0, params)

    ratio = encoder_lr / base_lr

    def assign(tree, path=()):
        if isinstance(tree, dict):
            return {k: assign(v, path + (k,)) for k, v in tree.items()}
        is_enc = any(any(part in seg for part in ENCODER_NAME_PARTS)
                     for seg in path)
        return ratio if is_enc else 1.0

    return assign(params)


def make_lr_schedule(name: str, base_lr: float, *, epochs: int = 15,
                     step_size: int = 8, gamma: float = 0.1,
                     min_lr: float = 1e-7, warmup_epochs: int = 2
                     ) -> Callable[[int], float]:
    """Returns epoch (1-based) -> lr. Plateau is handled by PlateauScheduler."""
    name_l = name.lower()
    if "steplr" in name_l:
        def sched(epoch: int) -> float:
            return base_lr * gamma ** ((epoch - 1) // step_size)
        return sched
    if "cosine" in name_l:
        # timm CosineLRScheduler(t_initial=epochs, lr_min, warmup_t,
        # warmup_lr_init=lr_min, warmup_prefix=False, cycle_limit=1,
        # t_in_epochs=True) as the reference constructs it
        # (src/trainutils.py:153-168) and steps it with sched.step(epoch) at
        # epoch END (src/train.py:70): the lr used during epoch e is
        # timm's _get_lr(e-1), and past the single cycle (t >= t_initial,
        # i.e. i >= cycle_limit) timm pins the lr to lr_min.
        def sched(epoch: int) -> float:
            t = epoch - 1
            if t < warmup_epochs:
                return min_lr + t * (base_lr - min_lr) / max(warmup_epochs, 1)
            if t >= epochs:  # beyond cycle_limit=1 -> lr_min
                return min_lr
            return min_lr + 0.5 * (base_lr - min_lr) * (
                1 + math.cos(math.pi * t / epochs))
        return sched
    raise ValueError(f"unknown schedule {name!r} (use PlateauScheduler for "
                     "ReduceLROnPlateau)")


class PlateauScheduler:
    """Exact torch.optim.lr_scheduler.ReduceLROnPlateau semantics — the
    reference constructs it with torch defaults beyond mode/factor/patience
    (src/trainutils.py:174-180): threshold=1e-4 in 'rel' mode, cooldown=0,
    min_lr=0, eps=1e-8 — and steps it with the validation metric
    (src/train.py:63-67). The rel-threshold matters on near-flat validation
    curves: a metric must beat best by a 1e-4 relative margin to count as
    improvement, otherwise the epoch is 'bad'."""

    def __init__(self, base_lr: float, mode: str = "min",
                 factor: float = 0.5, patience: int = 5,
                 threshold: float = 1e-4, threshold_mode: str = "rel",
                 cooldown: int = 0, min_lr: float = 0.0, eps: float = 1e-8):
        self.lr = base_lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.cooldown_counter = 0
        self.min_lr = min_lr
        self.eps = eps
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad = 0

    def _is_better(self, a: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return a < self.best * (1.0 - self.threshold)
            return a < self.best - self.threshold
        if self.threshold_mode == "rel":
            return a > self.best * (1.0 + self.threshold)
        return a > self.best + self.threshold

    def step(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:  # torch skips sub-eps updates
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.lr
