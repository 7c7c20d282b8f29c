"""Set criterion: matched panoptic losses per MIMO subnet.

Re-design of ``SetCriterion`` (reference
``pasco/loss/criterion_sparse.py:19-411``) for padded static shapes.
Targets are encoded compactly: instead of ``[T, 256, 256, 32]`` dense mask
stacks, each subnet carries one dense ``mask_id`` grid (voxel -> target
index, ``T_cap`` = none) plus per-target labels — masks are disjoint by
construction (stuff = per-class, things = per-instance;
``kitti_dataset.py:609-664``), so the dense lookup at prediction
coordinates reconstructs the reference's ``[N, T]`` one-hot exactly.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pasco_tpu.core.config import LossConfig
from pasco_tpu.core.sparse import SparseGrid
from pasco_tpu.loss.losses import (
    sigmoid_focal_loss,
    weighted_cross_entropy,
)
from pasco_tpu.loss.lovasz import lovasz_softmax
from pasco_tpu.loss.matcher import match


class SubnetTargets(NamedTuple):
    """Panoptic targets of one subnet (static shapes, host-precomputed)."""

    labels: jnp.ndarray        # [T_cap] int — class of each target mask
    valid: jnp.ndarray         # [T_cap] bool
    mask_id_dense: jnp.ndarray # [X, Y, Z] int32: target index, T_cap = none
    semantic_dense: jnp.ndarray  # [X, Y, Z] int labels (255 = unknown)
    unknown_dense: jnp.ndarray   # [X, Y, Z] bool (geo label == 255)


def _gather_dense(dense: jnp.ndarray, rel: jnp.ndarray, fill):
    """Lookup [X,Y,Z] dense at clipped rel coords; out-of-range -> fill."""
    shape = jnp.asarray(dense.shape, jnp.int32)
    in_range = jnp.all((rel >= 0) & (rel < shape[None, :]), axis=-1)
    relc = jnp.clip(rel, 0, shape[None, :] - 1)
    vals = dense[relc[:, 0], relc[:, 1], relc[:, 2]]
    return jnp.where(in_range, vals, fill)


def criterion_losses(
    query_logits: jnp.ndarray,   # [Q, C+1] one subnet
    voxel_logits: jnp.ndarray,   # [N, Q] on scale-1 panop coords
    grid: SparseGrid,            # per-subnet scale-1 panop grid
    sem_logits_pruned: jnp.ndarray,  # [N, C] subnet's pruned sem logits
    targets: SubnetTargets,
    subnet_min: jnp.ndarray,     # [3] — dense grids are relative to this
    class_weight: jnp.ndarray,   # [C+1] (incl. dustbin)
    compl_weights: jnp.ndarray,  # [C] completion label weights
    cfg: LossConfig,
    n_classes: int,
) -> Dict[str, jnp.ndarray]:
    """One subnet, one prediction level (reference ``compute_losses``,
    ``criterion_sparse.py:241-352``)."""
    t_cap = targets.labels.shape[0]
    q = query_logits.shape[0]

    rel = grid.coords[:, 1:] - subnet_min[None, :]
    mask_id = _gather_dense(targets.mask_id_dense, rel, t_cap)
    unknown = _gather_dense(targets.unknown_dense, rel, True)
    mask_id = jnp.where(grid.mask, mask_id, t_cap)
    unknown = unknown | ~grid.mask

    tgt_onehot = (
        (mask_id[:, None] == jnp.arange(t_cap)[None, :]) & targets.valid[None, :]
    ).astype(jnp.float32)

    covered = (mask_id < t_cap) & targets.valid[jnp.clip(mask_id, 0, t_cap - 1)]
    match_valid = covered & ~unknown

    assign = match(
        query_logits,
        voxel_logits,
        tgt_onehot,
        targets.labels,
        targets.valid,
        match_valid,
        class_weight,
        cfg.cost_class,
        cfg.mask_weight,
        cfg.dice_weight,
    )  # [T_cap] query per target, -1 invalid

    # ---- classification loss (criterion_sparse.py:56-81) ----------------
    assigned = assign >= 0
    assign_c = jnp.clip(assign, 0, q - 1)
    target_classes = jnp.full((q,), n_classes, jnp.int32)
    target_classes = target_classes.at[assign_c].set(
        jnp.where(assigned, targets.labels, n_classes).astype(jnp.int32),
        mode="drop",
    )
    logp = jax.nn.log_softmax(query_logits.astype(jnp.float32), axis=-1)
    ce_per_q = -logp[jnp.arange(q), target_classes]
    loss_ce = jnp.mean(ce_per_q * class_weight[target_classes])

    # ---- mask losses (criterion_sparse.py:83-116) -----------------------
    # Computed in [T_cap, N] layout: gathering the assigned queries as
    # ROWS of voxel_logits^T is one contiguous row gather, while the
    # [:, assign_c] form gathered along the minor (lane) dim — N*T_cap
    # scalar fetches that profiled at ~380 ms/step forward plus a
    # ~160 ms scatter-add backward.
    pred_rows = voxel_logits.T[assign_c]             # [T_cap, N]
    onehot_t = (
        (mask_id[None, :] == jnp.arange(t_cap)[:, None])
        & targets.valid[:, None]
    ).astype(jnp.float32)
    tgt_w = class_weight[jnp.clip(targets.labels, 0, n_classes)]
    t_valid = assigned & targets.valid
    row_valid = (~unknown) & grid.mask
    rv = row_valid[None, :].astype(jnp.float32)

    focal = sigmoid_focal_loss(pred_rows, onehot_t) * tgt_w[:, None]
    focal = focal * rv
    n_rows = jnp.maximum(jnp.sum(row_valid.astype(jnp.float32)), 1.0)
    per_t_focal = jnp.sum(focal, axis=1) / n_rows
    n_t = jnp.maximum(jnp.sum(t_valid.astype(jnp.float32)), 1.0)
    loss_mask = jnp.sum(jnp.where(t_valid, per_t_focal, 0.0)) / n_t

    probs_t = jax.nn.sigmoid(pred_rows) * rv
    tgts_t = onehot_t * rv
    numer = 2 * jnp.sum(probs_t * tgts_t, axis=1)
    denom = jnp.sum(probs_t, axis=1) + jnp.sum(tgts_t, axis=1)
    dice = (1 - (numer + 1) / (denom + 1)) * tgt_w
    loss_dice = jnp.sum(jnp.where(t_valid, dice, 0.0)) / n_t

    # ---- voxel-query SSC losses (criterion_sparse.py:180-209) -----------
    # semantic_inference_v2 (helper.py:7-39): normalised mask probs @ kept
    # query logits.
    q_prob = jax.nn.softmax(query_logits.astype(jnp.float32), axis=-1)
    keep_q = (jnp.argmax(q_prob, axis=-1) != n_classes).astype(jnp.float32)
    any_kept = jnp.sum(keep_q) > 0
    vox_prob = (jax.nn.sigmoid(voxel_logits.astype(jnp.float32)) + 1e-8) * keep_q[
        None, :
    ]
    # Safe divide: with every query dropped the row sum is exactly 0 and
    # a max(.., 1e-20) floor overflows in backward (1/m^2 = 1e40 > f32max,
    # inf * 0 = NaN poisoning the whole trunk grad).  When any query is
    # kept the +1e-8 bounds the sum away from 0, so where(S>0) is exact.
    vox_sum = jnp.sum(vox_prob, axis=1, keepdims=True)
    vox_prob = vox_prob / jnp.where(vox_sum > 0, vox_sum, 1.0)
    ssc_logit = vox_prob @ (query_logits[:, :-1].astype(jnp.float32) * keep_q[:, None])

    sem_lbl = _gather_dense(targets.semantic_dense, rel, 255)
    ssc_valid = grid.mask & (sem_lbl != 255)
    # CE_ssc_loss (reference ``losses.py:10-23``) runs with ignore_index=0:
    # the empty class is excluded from the CE mean (the lovasz below gets
    # the same exclusion via ``ignore_classes=(0,)``).
    ssc_ce = weighted_cross_entropy(
        ssc_logit, sem_lbl, ssc_valid & (sem_lbl != 0), compl_weights
    )
    ssc_lovasz = lovasz_softmax(ssc_logit, sem_lbl, ssc_valid, ignore_classes=(0,))
    ssc_ce = jnp.where(any_kept, ssc_ce, 0.0)
    ssc_lovasz = jnp.where(any_kept, ssc_lovasz, 0.0)

    return {
        "loss_ce": loss_ce,
        "loss_mask": loss_mask,
        "loss_dice": loss_dice,
        "ssc_ce": ssc_ce,
        "ssc_lovasz": ssc_lovasz,
    }


def criterion_all_subnets(
    predictor_out,
    panop_grid1: SparseGrid,           # batched [S, cap1, ...]
    sem_logits_pruned: jnp.ndarray,    # [S, cap1, C]
    targets_per_subnet,                # SubnetTargets with leading [S] axes
    subnet_min: jnp.ndarray,           # [S, 3]
    class_weight: jnp.ndarray,         # [C+1]
    compl_weights: jnp.ndarray,        # [C]
    cfg: LossConfig,
    n_classes: int,
    include_aux: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Average the per-subnet criterion over subnets and aux levels
    (reference ``net_panoptic_sparse.py:380-478`` + aux in
    ``criterion_sparse.py:387-405``).

    The (level, subnet) grid is rolled into NESTED ``vmap`` (levels over
    subnets) so the matcher + losses trace and compile ONCE instead of
    ``(1 + n_aux) * n_infers`` times (10 x 2 for the flagship: the
    unrolled form dominated whole-train-step compile time — the round-2
    multichip dryrun timed out compiling it).  Round 5 moved the level
    axis from ``lax.map`` to ``vmap`` too: the scan executed the 4 level
    bodies sequentially and its TRANSPOSE re-walked them one by one —
    profiled at ~87 ms/step of backward while-loop self time plus
    ~27 ms of carry ``dynamic_update_slice`` on the train step; batched
    levels run as 4x-wide ops instead (the matcher's augmenting-path
    ``while_loop`` runs lock-step under vmap, which is faster here than
    four sequential loops)."""
    S = subnet_min.shape[0]
    levels = [(predictor_out.query_logits, predictor_out.voxel_logits)]
    if include_aux:
        levels += list(predictor_out.aux)
    L = len(levels)
    q_all = jnp.stack([q for q, _ in levels])  # [L, S, Q, C+1]
    v_all = jnp.stack([v for _, v in levels])  # [L, S, N, Q]

    per_subnet = jax.vmap(
        lambda q, v, grid, sem, tgt, smin: criterion_losses(
            q, v, grid, sem, tgt, smin,
            class_weight, compl_weights, cfg, n_classes,
        ),
        in_axes=(0, 0, 0, 0, 0, 0),
    )

    def level_fn(qv):
        q_l, v_l = qv
        return per_subnet(
            q_l, v_l, panop_grid1, sem_logits_pruned,
            targets_per_subnet, subnet_min,
        )

    stacked = jax.vmap(level_fn)((q_all, v_all))  # dict of [L, S]

    total: Dict[str, jnp.ndarray] = {}
    for li in range(L):
        suffix = "" if li == 0 else f"_aux{li - 1}"
        for k, v in stacked.items():
            total[k + suffix] = jnp.sum(v[li], axis=0) / S
    return total
