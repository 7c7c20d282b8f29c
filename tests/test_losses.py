"""Unit tests for loss primitives against independent torch references."""

import numpy as np
import pytest

import jax.numpy as jnp

from pasco_tpu.loss.losses import (
    dice_loss,
    sigmoid_focal_loss,
    weighted_cross_entropy,
)
from pasco_tpu.loss.lovasz import lovasz_softmax
from pasco_tpu.loss.matcher import batch_dice_cost, batch_focal_cost


def test_weighted_ce_matches_torch():
    import torch
    import torch.nn.functional as F

    r = np.random.RandomState(0)
    logits = r.randn(50, 5).astype(np.float32)
    labels = r.randint(0, 5, 50)
    w = r.rand(5).astype(np.float32) + 0.1
    valid = r.rand(50) > 0.3

    ours = weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid), jnp.asarray(w)
    )
    ref = F.cross_entropy(
        torch.tensor(logits[valid]),
        torch.tensor(labels[valid]),
        weight=torch.tensor(w),
    )
    assert abs(float(ours) - float(ref)) < 1e-5


def test_focal_matches_torch_formula():
    import torch
    import torch.nn.functional as F

    r = np.random.RandomState(1)
    x = r.randn(30, 4).astype(np.float32)
    t = (r.rand(30, 4) > 0.5).astype(np.float32)
    ours = np.asarray(sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t)))

    xt, tt = torch.tensor(x), torch.tensor(t)
    prob = xt.sigmoid()
    ce = F.binary_cross_entropy_with_logits(xt, tt, reduction="none")
    p_t = prob * tt + (1 - prob) * (1 - tt)
    ref = ce * (1 - p_t) ** 2
    ref = (0.25 * tt + 0.75 * (1 - tt)) * ref
    assert np.allclose(ours, ref.numpy(), atol=1e-5)


def test_dice_with_mask():
    r = np.random.RandomState(2)
    x = r.randn(40, 3).astype(np.float32)
    t = (r.rand(40, 3) > 0.5).astype(np.float32)
    valid = r.rand(40) > 0.25
    ours = np.asarray(
        dice_loss(jnp.asarray(x), jnp.asarray(t), jnp.asarray(valid))
    )
    # Manual: restrict to valid rows.
    p = 1 / (1 + np.exp(-x[valid]))
    tv = t[valid]
    ref = 1 - (2 * (p * tv).sum(0) + 1) / (p.sum(0) + tv.sum(0) + 1)
    assert np.allclose(ours, ref, atol=1e-5)


def test_lovasz_padding_invariance():
    """Invalid rows must not change the loss."""
    r = np.random.RandomState(3)
    logits = r.randn(60, 6).astype(np.float32)
    labels = r.randint(0, 6, 60)
    valid = np.ones(60, bool)
    base = float(
        lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid))
    )
    # Append garbage padding rows.
    logits_p = np.concatenate([logits, r.randn(25, 6).astype(np.float32) * 10])
    labels_p = np.concatenate([labels, r.randint(0, 6, 25)])
    valid_p = np.concatenate([valid, np.zeros(25, bool)])
    padded = float(
        lovasz_softmax(
            jnp.asarray(logits_p), jnp.asarray(labels_p), jnp.asarray(valid_p)
        )
    )
    assert abs(base - padded) < 1e-5


def test_lovasz_perfect_prediction_is_zero():
    labels = np.array([0, 1, 2, 1, 0])
    logits = np.full((5, 3), -20.0, np.float32)
    logits[np.arange(5), labels] = 20.0
    loss = float(
        lovasz_softmax(
            jnp.asarray(logits), jnp.asarray(labels), jnp.ones(5, dtype=bool)
        )
    )
    assert loss < 1e-5


def test_batch_costs_match_elementwise():
    """Pairwise cost matrices must agree with per-pair elementwise losses."""
    r = np.random.RandomState(4)
    n, q, t = 30, 4, 3
    x = r.randn(n, q).astype(np.float32)
    tgt = (r.rand(n, t) > 0.5).astype(np.float32)
    valid = np.ones(n, bool)

    dc = np.asarray(
        batch_dice_cost(jnp.asarray(x), jnp.asarray(tgt), jnp.asarray(valid))
    )
    fc = np.asarray(
        batch_focal_cost(jnp.asarray(x), jnp.asarray(tgt), jnp.asarray(valid))
    )
    for qi in range(q):
        for ti in range(t):
            d = float(
                dice_loss(
                    jnp.asarray(x[:, qi : qi + 1]),
                    jnp.asarray(tgt[:, ti : ti + 1]),
                    jnp.asarray(valid),
                )[0]
            )
            assert abs(d - dc[qi, ti]) < 1e-5
            f = np.asarray(
                sigmoid_focal_loss(
                    jnp.asarray(x[:, qi : qi + 1]), jnp.asarray(tgt[:, ti : ti + 1])
                )
            ).mean()
            assert abs(f - fc[qi, ti]) < 1e-5


@pytest.mark.slow
def test_jax_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment as slsa

    from pasco_tpu.loss.matcher import jax_linear_sum_assignment

    r = np.random.RandomState(7)
    for _ in range(20):
        n = r.randint(1, 30)
        m = r.randint(n, 80)
        c = (r.randn(n, m) * r.randint(1, 5)).astype(np.float32)
        got = np.asarray(jax_linear_sum_assignment(jnp.asarray(c)))
        ri, ci = slsa(c)
        assert len(set(got.tolist())) == n          # a permutation
        assert abs(c[np.arange(n), got].sum() - c[ri, ci].sum()) < 1e-3


def test_hungarian_assignment_ignores_invalid_targets():
    from pasco_tpu.loss.matcher import hungarian_assignment

    r = np.random.RandomState(8)
    q, t = 20, 8
    cost = r.randn(q, t).astype(np.float32)
    valid = np.array([True] * 5 + [False] * 3)
    out = np.asarray(hungarian_assignment(jnp.asarray(cost), jnp.asarray(valid)))
    assert (out[5:] == -1).all()
    assert len(set(out[:5].tolist())) == 5
    # Optimal over the valid columns only.
    from scipy.optimize import linear_sum_assignment as slsa

    ri, ci = slsa(cost[:, :5].T)
    assert abs(
        cost[out[:5], np.arange(5)].sum() - cost.T[:5][ri, ci].sum()
    ) < 1e-3


def test_hungarian_assignment_more_slots_than_queries():
    """T_cap > Q (tiny configs): unmatched slots -1, valid slots optimal."""
    from scipy.optimize import linear_sum_assignment as slsa

    from pasco_tpu.loss.matcher import hungarian_assignment

    r = np.random.RandomState(9)
    q, t = 6, 15
    cost = r.randn(q, t).astype(np.float32)
    valid = np.zeros(t, bool)
    valid[[0, 3, 7, 11]] = True
    out = np.asarray(hungarian_assignment(jnp.asarray(cost), jnp.asarray(valid)))
    assert (out[~valid] == -1).all()
    matched = out[valid]
    assert len(set(matched.tolist())) == 4 and (matched >= 0).all()
    ri, ci = slsa(cost[:, valid])
    assert abs(
        cost[matched, np.nonzero(valid)[0]].sum() - cost[:, valid][ri, ci].sum()
    ) < 1e-3


def test_criterion_grads_finite_when_all_queries_dropped():
    """Regression: a subnet whose every query argmaxes to no-object made
    the voxel-query SSC normalisation divide by the 1e-20 floor, whose
    backward (1/m^2 = 1e40) overflows f32 -> inf * 0 = NaN through the
    whole trunk (caught by the flagship multichip dryrun)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pasco_tpu.core.config import LossConfig
    from pasco_tpu.core.sparse import SparseGrid
    from pasco_tpu.loss.criterion import SubnetTargets, criterion_losses

    r = np.random.RandomState(0)
    Q, N, C, T = 8, 64, 5, 4
    X = Y = Z = 8
    # every query strongly predicts the dustbin class C
    ql = jnp.asarray(r.randn(Q, C + 1), jnp.float32).at[:, -1].add(50.0)
    vl = jnp.asarray(r.randn(N, Q), jnp.float32)
    coords = jnp.concatenate(
        [
            jnp.zeros((N, 1), jnp.int32),
            jnp.asarray(r.randint(0, X, (N, 3)), jnp.int32),
        ],
        axis=-1,
    )
    grid = SparseGrid(
        coords=coords,
        feats=jnp.zeros((N, 4), jnp.float32),
        mask=jnp.ones((N,), bool),
        stride=1,
    )
    tgt = SubnetTargets(
        labels=jnp.asarray(r.randint(1, C, (T,)), jnp.int32),
        valid=jnp.ones((T,), bool),
        mask_id_dense=jnp.asarray(r.randint(0, T, (X, Y, Z)), jnp.int32),
        semantic_dense=jnp.asarray(r.randint(0, C, (X, Y, Z)), jnp.int32),
        unknown_dense=jnp.zeros((X, Y, Z), bool),
    )
    cw = jnp.ones((C + 1,), jnp.float32)
    lwv = jnp.ones((C,), jnp.float32)

    def total(ql_, vl_):
        losses = criterion_losses(
            ql_, vl_, grid, jnp.zeros((N, C), jnp.float32), tgt,
            jnp.zeros((3,), jnp.int32), cw, lwv, LossConfig(), C,
        )
        return sum(losses.values())

    gq, gv = jax.jit(jax.grad(total, argnums=(0, 1)))(ql, vl)
    assert np.isfinite(np.asarray(gq)).all()
    assert np.isfinite(np.asarray(gv)).all()


def test_masked_attention_grads_finite_with_all_masked_row():
    """Regression: a query whose every key is masked has softmax
    normaliser l == 0; the old max(l, 1e-20) floor NaN'd its backward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pasco_tpu.ops.attention import masked_cross_attention

    r = np.random.RandomState(1)
    Q, N, D, H = 4, 32, 16, 2
    q = jnp.asarray(r.randn(Q, D), jnp.float32)
    k = jnp.asarray(r.randn(N, D), jnp.float32)
    v = jnp.asarray(r.randn(N, D), jnp.float32)
    allow = jnp.ones((N, Q), bool).at[:, 0].set(False)  # query 0: no keys

    def loss(q_, k_, v_):
        out = masked_cross_attention(q_, k_, v_, allow, num_heads=H)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for a in g:
        assert np.isfinite(np.asarray(a)).all()
