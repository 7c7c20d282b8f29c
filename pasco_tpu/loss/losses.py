"""Core loss primitives and the multiscale semantic-completion loss.

Masked static-shape JAX ports of the reference loss functions
(``pasco/loss/losses.py``): weighted CE, sigmoid focal, dice, and
``compute_sem_compl_loss`` (``losses.py:124-179``) which supervises the
per-scale, per-subnet completion heads of the generative decoder.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pasco_tpu.core.sparse import SparseGrid
from pasco_tpu.loss.lovasz import lovasz_softmax


def weighted_cross_entropy(
    logits: jnp.ndarray,       # [N, C]
    labels: jnp.ndarray,       # [N] int
    valid: jnp.ndarray,        # [N] bool (already excludes ignore_index)
    class_weight: Optional[jnp.ndarray] = None,  # [C]
) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss(weight=w, reduction='mean') semantics:
    ``sum(w[y] * ce) / sum(w[y])`` over valid rows."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    n = logits.shape[0]
    ce = -logp[jnp.arange(n), jnp.clip(labels, 0, logits.shape[-1] - 1)]
    if class_weight is None:
        w = valid.astype(jnp.float32)
    else:
        w = class_weight[jnp.clip(labels, 0, logits.shape[-1] - 1)] * valid
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)


def sigmoid_focal_loss(
    inputs: jnp.ndarray,       # [N, M] logits
    targets: jnp.ndarray,      # [N, M] binary
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Element-wise focal loss (reference ``losses.py:44-68``), unreduced."""
    prob = jax.nn.sigmoid(inputs)
    ce = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(
        jnp.exp(-jnp.abs(inputs))
    )
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def dice_loss(
    inputs: jnp.ndarray,       # [N, M] logits
    targets: jnp.ndarray,      # [N, M] binary
    valid: jnp.ndarray,        # [N] bool rows that count
) -> jnp.ndarray:
    """Per-mask dice (reference ``losses.py:26-41``): reduces over voxels,
    returns ``[M]``."""
    probs = jax.nn.sigmoid(inputs) * valid[:, None]
    targets = targets * valid[:, None]
    numerator = 2 * jnp.sum(probs * targets, axis=0)
    denominator = jnp.sum(probs, axis=0) + jnp.sum(targets, axis=0)
    return 1 - (numerator + 1) / (denominator + 1)


def compl_labelweights(
    class_frequencies: np.ndarray, power: float = 1.0 / 3.0
) -> np.ndarray:
    """Completion class weights ``(max_freq / freq) ** power`` (reference
    ``losses.py:133-139``; KITTI-360 uses power 1/1.5, ``losses.py:82-88``)."""
    f = class_frequencies / np.sum(class_frequencies)
    return np.power(np.amax(f) / f, power).astype(np.float32)


def sem_compl_loss_one(
    grid: SparseGrid,                 # coords at the scale (stride-1 units)
    sem_logits: jnp.ndarray,          # [N, C] one subnet's completion logits
    target_dense: jnp.ndarray,        # [X/s, Y/s, Z/s] int labels, 255=unknown
    subnet_min: jnp.ndarray,          # [3] subnet bbox min
    subnet_max: jnp.ndarray,          # [3]
    scale: int,
    weights: jnp.ndarray,             # [C]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CE(ignore 255) + lovász(ignore 255) of one subnet at one scale
    (reference ``compute_sem_compl_loss``, ``losses.py:124-179``).

    The dense target grid is indexed at ``(coords - subnet_min) // scale``;
    voxels outside the subnet bbox are pruned (ignored).
    """
    c = grid.coords[:, 1:]
    in_bbox = jnp.all((c >= subnet_min[None]) & (c <= subnet_max[None]), axis=-1)
    rel = jnp.clip(
        (c - subnet_min[None]) // scale,
        0,
        jnp.asarray(target_dense.shape, jnp.int32)[None, :] - 1,
    )
    tgt = target_dense[rel[:, 0], rel[:, 1], rel[:, 2]]
    valid = grid.mask & in_bbox & (tgt != 255)
    ce = weighted_cross_entropy(sem_logits, tgt, valid, weights)
    lov = lovasz_softmax(sem_logits, tgt, valid, ignore_classes=())
    return ce, lov


def compute_sem_compl_loss(
    sem_grids: Dict[int, SparseGrid],
    sem_logits: Dict[int, jnp.ndarray],     # scale -> [N, S, C]
    sem_labels: Dict[int, jnp.ndarray],     # scale -> [S, X/s, Y/s, Z/s]
    subnet_min: jnp.ndarray,                # [S, 3]
    subnet_max: jnp.ndarray,
    weights_at_scales: Dict[int, jnp.ndarray],  # scale -> [C]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean CE / lovász over all (scale, subnet) pairs."""
    ces, lovs = [], []
    for scale, grid in sem_grids.items():
        logits = sem_logits[scale]
        n_subnets = logits.shape[1]
        for s in range(n_subnets):
            ce, lov = sem_compl_loss_one(
                grid,
                logits[:, s],
                sem_labels[scale][s],
                subnet_min[s],
                subnet_max[s],
                scale,
                weights_at_scales[scale],
            )
            ces.append(ce)
            lovs.append(lov)
    return jnp.mean(jnp.stack(ces)), jnp.mean(jnp.stack(lovs))


def jsd(p_logits: jnp.ndarray, q_logits: jnp.ndarray) -> jnp.ndarray:
    """Jensen-Shannon divergence between two categorical logit sets
    (reference ``SetCriterion.JSD``, ``criterion_sparse.py:211-239``; used
    by the query-consistency regulariser)."""
    p = jax.nn.softmax(p_logits, axis=-1) + 1e-8
    q = jax.nn.softmax(q_logits, axis=-1) + 1e-8
    m = 0.5 * (p + q)
    kl_pm = jnp.sum(p * (jnp.log(p) - jnp.log(m)), axis=-1)
    kl_qm = jnp.sum(q * (jnp.log(q) - jnp.log(m)), axis=-1)
    return 0.5 * jnp.mean(kl_pm + kl_qm)
