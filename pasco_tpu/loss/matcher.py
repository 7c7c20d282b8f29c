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


def hungarian_assignment_host(
    cost: jnp.ndarray,      # [Q, T_cap]
    tgt_valid: jnp.ndarray, # [T_cap] bool
) -> jnp.ndarray:
    """LSA via host callback into the native C++ solver.

    Not usable on the axon TPU backend (it rejects host callbacks inside
    jit); kept for CPU runs and as a cross-check of the pure-JAX solver.
    """
    return jax.pure_callback(
        _host_assign,
        jax.ShapeDtypeStruct((cost.shape[1],), jnp.int32),
        cost,
        tgt_valid,
        vmap_method="sequential",
    )


def hungarian_assignment(
    cost: jnp.ndarray,      # [Q, T_cap]
    tgt_valid: jnp.ndarray, # [T_cap] bool
) -> jnp.ndarray:
    """jit-native exact LSA: ``src_of_tgt [T_cap]`` (query per target, -1
    for invalid targets).

    Invalid target columns enter the assignment with a sentinel cost far
    above any real cost, which cannot perturb the optimum over the valid
    columns (exchange argument: any matching that skips a valid target in
    favour of a sentinel can be improved by swapping, so the optimum covers
    every valid target as long as #valid <= Q).
    """
    q, t_cap = cost.shape
    padded = jnp.where(tgt_valid[None, :], jnp.clip(cost, -1e6, 1e6), 1e9)
    if t_cap <= q:
        src = jax_linear_sum_assignment(padded.T)        # [T_cap] query/tgt
    else:
        # More target slots than queries: solve with queries as rows and
        # invert (unmatched target slots keep -1).
        tgt_of_q = jax_linear_sum_assignment(padded)     # [Q] target/query
        src = (
            jnp.full((t_cap,), -1, jnp.int32)
            .at[tgt_of_q]
            .set(jnp.arange(q, dtype=jnp.int32), mode="drop")
        )
    return jnp.where(tgt_valid, src, -1).astype(jnp.int32)


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


# ---------------------------------------------------------------------------
# Pure-JAX exact Hungarian (shortest augmenting path)
# ---------------------------------------------------------------------------
#
# The target TPU backend does not support host callbacks inside jit
# (axon_pjrt rejects pure_callback), so the LSA also exists as a pure-XLA
# routine: the classic O(n^2 m) potentials + augmenting-path algorithm with
# the column scans vectorised.  Cost matrices are <=100 x ~64, so the
# sequential outer structure is negligible.


def jax_linear_sum_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact LSA on a ``[R, C]`` cost matrix with R <= C.

    Returns ``col_for_row [R]`` — every row matched to a distinct column,
    minimising total cost (equal to scipy.optimize.linear_sum_assignment).
    """
    r, c = cost.shape
    assert r <= c, "requires rows <= cols (transpose the cost)"
    big = jnp.asarray(jnp.inf, jnp.float32)
    costf = cost.astype(jnp.float32)

    def assign_row(i, carry):
        u, v, p, way = carry
        # p[j] (1-indexed cols, 0 = virtual start) holds the 1-indexed row
        # currently assigned to column j; p[0] is the row being inserted.
        p = p.at[0].set(i + 1)
        minv = jnp.full((c + 1,), big)
        used = jnp.zeros((c + 1,), bool)

        iota_c = jax.lax.iota(jnp.int32, c + 1)
        iota_r = jax.lax.iota(jnp.int32, r + 1)

        def path_step(state):
            u, v, p, way, minv, used, j0 = state
            # One-hot selects instead of .at[] scatters: each scatter in
            # this body dispatched as its own (vmapped) HLO scatter at
            # ~13 us — profiled 45 ms/step over ~3.5k path iterations of
            # the flagship criterion.  The vectors are tiny (<= 101), so
            # masked selects / a [R, C] one-hot reduce are ~free.
            used = used | (iota_c == j0)
            i0 = p[j0]
            cur = costf[i0 - 1, :] - u[i0] - v[1:]
            upd = (cur < minv[1:]) & ~used[1:]
            minv = minv.at[1:].set(jnp.where(upd, cur, minv[1:]))
            way = way.at[1:].set(jnp.where(upd, j0, way[1:]))
            masked = jnp.where(used[1:], big, minv[1:])
            j1 = jnp.argmin(masked) + 1
            delta = masked[j1 - 1]
            # u[p[j]] += delta for every used column j (p has at most one
            # used column per row on the augmenting path, but the one-hot
            # sum is exact for duplicates too).
            u = u + delta * jnp.sum(
                (used[None, :] & (p[None, :] == iota_r[:, None])).astype(
                    jnp.float32
                ),
                axis=1,
            )
            v = v - jnp.where(used, delta, 0.0)
            minv = minv.at[1:].add(jnp.where(used[1:], 0.0, -delta))
            return u, v, p, way, minv, used, j1

        def path_cond(state):
            j0 = state[6]
            return state[2][j0] != 0

        state = (u, v, p, way, minv, used, jnp.int32(0))
        # First step must run once (j0 = 0 has p[0] = i+1 != 0).
        u, v, p, way, minv, used, j0 = jax.lax.while_loop(
            path_cond, path_step, state
        )

        def back_step(state):
            p, j0 = state
            j1 = way[j0]
            p = jnp.where(iota_c == j0, p[j1], p)
            return p, j1

        p, _ = jax.lax.while_loop(lambda s: s[1] != 0, back_step, (p, j0))
        return u, v, p, way

    u = jnp.zeros((r + 1,), jnp.float32)
    v = jnp.zeros((c + 1,), jnp.float32)
    p = jnp.zeros((c + 1,), jnp.int32)
    way = jnp.zeros((c + 1,), jnp.int32)
    u, v, p, way = jax.lax.fori_loop(0, r, assign_row, (u, v, p, way))

    # Invert: col_for_row[i] = j where p[j] == i+1 (1-indexed; every row
    # is assigned because r <= c).
    cols = jnp.arange(1, c + 1, dtype=jnp.int32)
    row_of_col = p[1:]  # [C], 0 = unassigned
    col_for_row = jnp.zeros((r + 1,), jnp.int32).at[row_of_col].set(
        cols, mode="drop"
    )[1:]
    return col_for_row - 1
