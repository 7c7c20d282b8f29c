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

    # The loss is dot(err_sorted, w) with w = lovasz_grad(fg_sorted): both
    # fg and the sort PERMUTATION are constants under AD (sort-of-values
    # differentiates as a fixed permutation), so dot(err_sorted, w) ==
    # dot(err, unsort(w)) with IDENTICAL value and gradient.  Computing it
    # that way keeps the sorts out of the AD path entirely: the
    # differentiable-sort form paid a u32/s32 JVP payload pair in the
    # forward sort plus a permutation-apply in backward — profiled at
    # ~50 ms/step (criterion ssc_lovasz, [4, 19, 150k]) + ~35 ms
    # (multiscale compl lovász) on the train step.  The unsort is a second
    # stop-grad sort keyed on the carried iota (a sort is ~3x faster here
    # than the equivalent scatter).
    err_sg = jax.lax.stop_gradient(err)
    k, n = err.shape
    iota = jnp.broadcast_to(
        jax.lax.iota(jnp.int32, n)[None, :], (k, n)
    )
    neg_err_sorted, fg_sorted, idx_sorted = jax.lax.sort(
        (-err_sg, fg, iota), dimension=1, num_keys=1, is_stable=True
    )
    w = _lovasz_grad(fg_sorted)                              # constant
    _, w_elem = jax.lax.sort(
        (idx_sorted, w), dimension=1, num_keys=1, is_stable=False
    )
    losses = jnp.sum(err * w_elem, axis=1)                   # [K]
    present = jnp.sum(fg, axis=1) > 0

    if classes == "present":
        denom = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
        return jnp.sum(jnp.where(present, losses, 0.0)) / denom
    return jnp.mean(losses)
