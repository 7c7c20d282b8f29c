"""Hungarian query<->target matching with static shapes.

Re-design of ``HungarianMatcher`` (reference
``pasco/loss/matcher_sparse.py:69-193``).  The cost matrix (focal + dice +
class costs over <=100 queries x <=T_cap padded targets) is computed on
device; the tiny LSA itself runs on host through ``jax.pure_callback`` into
the native C++ solver (``pasco_tpu/native/hungarian.cpp``), exactly
mirroring the reference's scipy-on-CPU pattern but without leaving jit.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pasco_tpu import native
from pasco_tpu.loss.losses import sigmoid_focal_loss


def batch_dice_cost(
    inputs: jnp.ndarray,    # [N, Q] logits
    targets: jnp.ndarray,   # [N, T] binary
    valid: jnp.ndarray,     # [N] rows that count
) -> jnp.ndarray:
    """Pairwise dice cost [Q, T] (reference ``matcher_sparse.py:12-27``)."""
    probs = jax.nn.sigmoid(inputs) * valid[:, None]
    targets = targets * valid[:, None]
    numerator = 2 * jnp.einsum(
        "nq,nt->qt", probs, targets, preferred_element_type=jnp.float32
    )
    denominator = jnp.sum(probs, axis=0)[:, None] + jnp.sum(targets, axis=0)[None, :]
    return 1 - (numerator + 1) / (denominator + 1)


def batch_focal_cost(
    inputs: jnp.ndarray,    # [N, Q] logits
    targets: jnp.ndarray,   # [N, T] binary
    valid: jnp.ndarray,     # [N]
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Pairwise focal cost [Q, T] (reference ``matcher_sparse.py:30-66``),
    normalised by the number of valid voxels."""
    prob = jax.nn.sigmoid(inputs)
    pos_ce = jnp.maximum(inputs, 0) - inputs + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
    neg_ce = jnp.maximum(inputs, 0) + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
    focal_pos = ((1 - prob) ** gamma) * pos_ce * alpha * valid[:, None]
    focal_neg = (prob**gamma) * neg_ce * (1 - alpha) * valid[:, None]
    tv = targets * valid[:, None]
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    cost = jnp.einsum(
        "nq,nt->qt", focal_pos, tv, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "nq,nt->qt",
        focal_neg,
        (1 - targets) * valid[:, None],
        preferred_element_type=jnp.float32,
    )
    return cost / n_valid


def _host_assign(cost: np.ndarray, tgt_valid: np.ndarray) -> np.ndarray:
    """Host-side LSA on the valid target columns.

    Returns ``src_of_tgt [T_cap]`` — matched query per target, -1 invalid.
    """
    cost = np.asarray(cost, np.float64)
    tgt_valid = np.asarray(tgt_valid, bool)
    t_cap = cost.shape[1]
    out = np.full((t_cap,), -1, np.int32)
    cols = np.nonzero(tgt_valid)[0]
    if cols.size == 0:
        return out
    sub = cost[:, cols]
    rows, sub_cols = native.linear_sum_assignment(sub)
    out[cols[sub_cols]] = rows.astype(np.int32)
    return out


def hungarian_assignment(
    cost: jnp.ndarray,      # [Q, T_cap]
    tgt_valid: jnp.ndarray, # [T_cap] bool
) -> jnp.ndarray:
    """jit-compatible LSA via host callback: ``src_of_tgt [T_cap]``."""
    return jax.pure_callback(
        _host_assign,
        jax.ShapeDtypeStruct((cost.shape[1],), jnp.int32),
        cost,
        tgt_valid,
        vmap_method="sequential",
    )


def match(
    query_logits: jnp.ndarray,   # [Q, C+1]
    voxel_logits: jnp.ndarray,   # [N, Q]
    tgt_onehot: jnp.ndarray,     # [N, T_cap] binary membership
    tgt_labels: jnp.ndarray,     # [T_cap] int
    tgt_valid: jnp.ndarray,      # [T_cap] bool
    voxel_valid: jnp.ndarray,    # [N] bool: covered-by-GT and known
    class_weight: jnp.ndarray,   # [C+1]
    cost_class: float,
    cost_mask: float,
    cost_dice: float,
) -> jnp.ndarray:
    """Full matching cost + LSA (reference
    ``memory_efficient_forward``, ``matcher_sparse.py:100-165``).

    The whole matching is non-differentiable (reference decorates it
    ``@torch.no_grad()``); stop_gradient here also keeps the host callback
    out of the JVP graph.
    """
    query_logits = jax.lax.stop_gradient(query_logits)
    voxel_logits = jax.lax.stop_gradient(voxel_logits)
    tgt_onehot = jax.lax.stop_gradient(tgt_onehot)
    out_prob = jax.nn.softmax(query_logits.astype(jnp.float32), axis=-1)
    cc = -out_prob[:, jnp.clip(tgt_labels, 0, query_logits.shape[-1] - 1)]
    cd = batch_dice_cost(voxel_logits, tgt_onehot, voxel_valid)
    cm = batch_focal_cost(voxel_logits, tgt_onehot, voxel_valid)
    tgt_w = class_weight[jnp.clip(tgt_labels, 0, class_weight.shape[0] - 1)]
    c = (cost_mask * cm + cost_class * cc + cost_dice * cd) * tgt_w[None, :]
    c = jnp.where(tgt_valid[None, :], c, 0.0)
    c = jnp.nan_to_num(c, nan=1e6, posinf=1e6, neginf=-1e6)
    return hungarian_assignment(c, tgt_valid)
