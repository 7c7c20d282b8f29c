"""Lovász-softmax loss, masked static-shape JAX version.

Re-derivation of the Berman Lovász-softmax (reference
``pasco/loss/lovasz.py:186-220``, ``lovasz_softmax_flat``) for padded
arrays: invalid / ignored rows are folded into zero-error, zero-foreground
entries which sort to the tail and contribute nothing to the class losses
(the Lovász extension is evaluated as ``dot(errors_sorted,
grad(fg_sorted))``, and zero errors kill any tail distortion of the
gradient).

All classes are processed by ONE batched two-operand ``lax.sort`` that
carries the foreground indicator through the sort.  The earlier per-class
``argsort`` + permutation-gather form lowered to hundreds of scalar-layout
gathers (~45M single-element fetches, ~380 ms/step on the target chip,
plus their scatter-add transpose in backward); the payload-carrying sort
has no gathers at all and its JVP/transpose stay batched.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _lovasz_grad(fg_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors (Alg. 1 of
    arXiv:1705.08790); batched over a leading class axis."""
    gts = jnp.sum(fg_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(fg_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=-1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate(
        [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1
    )


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
    keep = [cls for cls in range(c) if cls not in ignore_classes]
    cls_arr = jnp.asarray(keep, jnp.int32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    valid_f = valid.astype(jnp.float32)

    fg = (
        (labels[None, :] == cls_arr[:, None]) & valid[None, :]
    ).astype(jnp.float32)                                   # [K, N]
    err = jnp.abs(fg - probs.T[cls_arr]) * valid_f[None, :]  # [K, N]

    # Descending sort on err, carrying fg: one batched sort, no gathers.
    neg_err_sorted, fg_sorted = jax.lax.sort(
        (-err, fg), dimension=1, num_keys=1, is_stable=True
    )
    grad = _lovasz_grad(fg_sorted)
    losses = jnp.sum(-neg_err_sorted * grad, axis=1)         # [K]
    present = jnp.sum(fg, axis=1) > 0

    if classes == "present":
        denom = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
        return jnp.sum(jnp.where(present, losses, 0.0)) / denom
    return jnp.mean(losses)
