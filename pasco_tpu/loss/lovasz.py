"""Lovász-softmax loss, masked static-shape JAX version.

Re-derivation of the Berman Lovász-softmax (reference
``pasco/loss/lovasz.py:186-220``, ``lovasz_softmax_flat``) for padded
arrays: invalid / ignored rows are folded into zero-error, zero-foreground
entries which sort to the tail and contribute nothing to the class losses
(the Lovász extension is evaluated as ``dot(errors_sorted,
grad(fg_sorted))``, and zero errors kill any tail distortion of the
gradient).  The per-class loop is static (n_classes ~ 20).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _lovasz_grad(fg_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors (Alg. 1 of
    arXiv:1705.08790)."""
    gts = jnp.sum(fg_sorted)
    intersection = gts - jnp.cumsum(fg_sorted)
    union = gts + jnp.cumsum(1.0 - fg_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(
    logits: jnp.ndarray,       # [N, C]
    labels: jnp.ndarray,       # [N] int
    valid: jnp.ndarray,        # [N] bool — padding / ignore mask
    ignore_classes: Sequence[int] = (),
    classes: str = "present",
) -> jnp.ndarray:
    """Multi-class Lovász-softmax over the valid rows.

    ``classes='present'`` averages only classes with foreground pixels,
    like the reference.  Ignored classes never contribute.
    """
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    valid_f = valid.astype(jnp.float32)

    losses = []
    present = []
    for cls in range(c):
        if cls in ignore_classes:
            continue
        fg = ((labels == cls) & valid).astype(jnp.float32)
        err = jnp.abs(fg - probs[:, cls]) * valid_f
        order = jnp.argsort(-err)
        err_sorted = err[order]
        fg_sorted = fg[order]
        grad = _lovasz_grad(fg_sorted)
        losses.append(jnp.dot(err_sorted, grad))
        present.append(jnp.sum(fg) > 0)

    losses = jnp.stack(losses)
    present = jnp.stack(present)
    if classes == "present":
        denom = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
        return jnp.sum(jnp.where(present, losses, 0.0)) / denom
    return jnp.mean(losses)
