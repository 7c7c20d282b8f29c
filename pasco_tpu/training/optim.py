"""Optimizer and LR schedule.

Reference: AdamW(lr=1e-4, weight_decay=1e-4) + a ``WarmupCosine`` lambda
schedule (``net_panoptic_sparse.py:887-903``).  Note the reference's
``WarmupCosine`` (``pasco/utils/torch_util.py:75-96``) has its cosine body
commented out and ``warmup_end=0`` with epoch-interval stepping, so the
schedule that actually trains the released checkpoints is a constant LR
with a x0.1 drop after 60k steps; ``schedule(..., mode="reference")``
reproduces exactly that, while ``mode="cosine"`` provides the intended
warmup-cosine for new training runs.  Gradient clipping is by-norm 0.5
(``scripts/train.py:209,228``).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax

from pasco_tpu.core.config import OptimConfig


def lr_schedule(cfg: OptimConfig, mode: str = "reference") -> Callable:
    if mode == "reference":

        def fn(step):
            factor = jnp.where(step > 60000, 0.1, 1.0)
            if cfg.warmup_steps > 0:
                factor = factor * jnp.minimum(
                    (step + 1) / cfg.warmup_steps, 1.0
                )
            return cfg.lr * factor

        return fn
    if mode == "cosine":

        def fn(step):
            warm = jnp.minimum((step + 1) / max(cfg.warmup_steps, 1), 1.0)
            t = jnp.clip(
                (step - cfg.warmup_steps)
                / max(cfg.max_steps - cfg.warmup_steps, 1),
                0.0,
                1.0,
            )
            cos = 0.01 + 0.5 * (1 - 0.01) * (jnp.cos(t * math.pi) + 1)
            return cfg.lr * warm * cos

        return fn
    raise ValueError(mode)


def make_optimizer(cfg: OptimConfig, mode: str = "reference"):
    """AdamW with grad-norm clipping, matching the reference recipe."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=lr_schedule(cfg, mode),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
            # First moment in bf16: halves one of the two optimizer-state
            # copies of the 117M params (memory headroom for training).
            mu_dtype=jnp.bfloat16,
        ),
    )
