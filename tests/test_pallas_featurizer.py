"""Fused featurizer kernel vs the XLA scatter/enc_in formulation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_pallas_conv import _interpret


def _xla_reference(f, rel, in_box, wbd, b2, extent, neg):
    """The dense_unet S==1 z-packed featurizer + enc_in, XLA form."""
    from pasco_tpu.ops.dense_ops import scatter_max_rows

    ex, ey, ez = extent
    tz = ez // 2
    cellrow = (rel[:, 0] * tz + rel[:, 2] // 2) * ey + rel[:, 1]
    row = cellrow * 2 + (rel[:, 2] % 2)
    n_rows = ex * tz * ey * 2
    flat_idx = jnp.where(in_box, row, n_rows).astype(jnp.int32)
    grid_f = scatter_max_rows(f.astype(jnp.float32), flat_idx, n_rows, neg)
    occ = jnp.max(grid_f, axis=-1) > neg
    grid_f = jnp.where(grid_f == neg, 0.0, grid_f)   # densify (test both)
    grid_f = grid_f[:-1]
    x = grid_f.reshape(ex, tz, ey, 2 * f.shape[-1])
    enc = jnp.einsum(
        "xtyc,cd->xtyd", x, wbd.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) + b2
    occ_pair = occ[:-1].reshape(ex, tz, ey, 2)
    return enc, occ_pair


def test_featurizer_fused_matches_xla():
    from pasco_tpu.ops.dense_ops import blockdiag2_weight
    from pasco_tpu.ops.pallas_conv import conv_plan, HY
    from pasco_tpu.ops.pallas_featurizer import featurizer_fused

    r = np.random.RandomState(7)
    ex, ey, ez = 16, 32, 16
    F = 8
    P = 256
    neg = -1e30

    f = jnp.asarray(r.randn(P, F).astype(np.float32) * 3)
    rel = jnp.asarray(
        np.stack(
            [
                r.randint(0, ex, P),
                r.randint(0, ey, P),
                r.randint(0, ez, P),
            ],
            axis=1,
        ).astype(np.int32)
    )
    in_box = jnp.asarray(r.rand(P) > 0.1)
    w = r.randn(F, F).astype(np.float32) * 0.2
    b = r.randn(F).astype(np.float32) * 0.1
    wbd = blockdiag2_weight(jnp.asarray(w))
    b2 = jnp.concatenate([jnp.asarray(b)] * 2)

    yt = conv_plan(2 * F, 2 * F, ez // 2 + 2, fused=True, X=ex, Y=ey)[1]
    with _interpret():
        xpad, m8, occ = featurizer_fused(
            f, rel, in_box, wbd, b2, (ex, ey, ez), yt, neg, jnp.float32
        )

    enc_ref, occ_ref = _xla_reference(
        f, rel, in_box, wbd, b2, (ex, ey, ez), neg
    )

    T = ez // 2
    # occupancy: occ[slot, x, t, y] vs occ_ref[x, t, y, slot]
    np.testing.assert_array_equal(
        np.asarray(occ).transpose(1, 2, 3, 0), np.asarray(occ_ref)
    )

    # m8: lane-replicated per-slot occupancy, zero borders + rounding
    m8 = np.asarray(m8)
    Ypad = m8.shape[2]
    occ_np = np.asarray(occ_ref)
    interior = m8[1:-1, 1 : T + 1, HY : HY + ey]
    exp_lo = np.repeat(occ_np[..., 0:1], F, axis=-1)
    exp_hi = np.repeat(occ_np[..., 1:2], F, axis=-1)
    np.testing.assert_array_equal(
        interior, np.concatenate([exp_lo, exp_hi], -1).astype(np.int8)
    )
    border = m8.copy()
    border[1:-1, 1 : T + 1, HY : HY + ey] = 0
    assert np.all(border == 0), "mask borders/rounding must be zero"

    # xpad interior: enc_in output at OCCUPIED cells (empty cells are
    # garbage by contract — consumers mask by m8)
    got = np.asarray(xpad)[1:-1, 1 : T + 1, HY : HY + ey].astype(np.float32)
    ref = np.asarray(enc_ref)
    sel = np.concatenate([exp_lo, exp_hi], -1) != 0
    np.testing.assert_allclose(got[sel], ref[sel], rtol=2e-3, atol=2e-3)


def test_featurizer_fused_empty_scan():
    """Zero valid points: occupancy empty, mask all-zero."""
    from pasco_tpu.ops.dense_ops import blockdiag2_weight
    from pasco_tpu.ops.pallas_featurizer import featurizer_fused

    ex, ey, ez = 8, 16, 8
    F = 8
    P = 64
    f = jnp.zeros((P, F), jnp.float32)
    rel = jnp.zeros((P, 3), jnp.int32)
    in_box = jnp.zeros((P,), bool)
    wbd = blockdiag2_weight(jnp.eye(F))
    b2 = jnp.zeros((2 * F,))
    with _interpret():
        xpad, m8, occ = featurizer_fused(
            f, rel, in_box, wbd, b2, (ex, ey, ez), 16, -1e30, jnp.float32
        )
    assert not bool(np.asarray(occ).any())
    assert np.all(np.asarray(m8) == 0)
