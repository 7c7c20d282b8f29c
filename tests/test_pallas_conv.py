"""Pallas block-sparse conv vs the dense reference (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasco_tpu.ops.dense_ops import conv3_dense
from pasco_tpu.ops.pallas_conv import active_columns, block_sparse_conv3


def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def test_active_columns():
    mask = np.zeros((16, 16, 8), bool)
    mask[0:8, 0:8, 2] = True      # column (0, 0)
    mask[9, 12, 0] = True         # column (1, 1)
    ids, n = active_columns(jnp.asarray(mask), capacity=8)
    assert int(n[0]) == 2
    got = sorted(int(i) for i in np.asarray(ids)[:2])
    assert got == [0, 3]  # flat ids over a 2x2 column grid


def test_block_sparse_conv_matches_dense():
    r = np.random.RandomState(0)
    X, Y, Z, C, D = 32, 32, 16, 64, 32
    mask = np.zeros((X, Y, Z), bool)
    mask[4:20, 6:25, 2:12] = r.rand(16, 19, 10) > 0.5
    x = np.where(mask[..., None], r.randn(X, Y, Z, C), 0).astype(np.float32)
    w = (r.randn(27, C, D) * 0.1).astype(np.float32)
    b = r.randn(D).astype(np.float32)

    ref = conv3_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    ref = np.where(mask[..., None], np.asarray(ref, np.float32), 0)

    with _interpret():
        out = block_sparse_conv3(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(mask),
            block_capacity=32, bias=jnp.asarray(b),
        )
    out = np.where(mask[..., None], np.asarray(out, np.float32), 0)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel


def test_block_sparse_conv_skips_dead_columns():
    r = np.random.RandomState(1)
    X, Y, Z, C = 16, 16, 8, 64
    mask = np.zeros((X, Y, Z), bool)
    mask[0:8, 0:8, :] = True
    x = np.where(mask[..., None], r.randn(X, Y, Z, C), 0).astype(np.float32)
    w = (r.randn(27, C, C) * 0.1).astype(np.float32)
    with _interpret():
        out = block_sparse_conv3(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(mask), block_capacity=4
        )
    out = np.asarray(out)
    # Cells in never-visited columns stay exactly zero.
    assert np.all(out[8:, 8:] == 0)
    assert np.abs(out[:8, :8]).max() > 0


def test_block_sparse_packed_conv_matches_xla():
    from pasco_tpu.ops.dense_ops import conv3_packed_z2, pack_z2, unpack_z2
    from pasco_tpu.ops.pallas_conv import block_sparse_packed_conv

    r = np.random.RandomState(2)
    X, Z, Y, C, D = 16, 8, 32, 4, 6
    x = jnp.asarray(r.randn(X, Z, Y, C).astype(np.float32))
    mask_np = r.rand(X, Z, Y) > 0.6
    mask_np[8:] = False           # leave inactive tiles
    mask = jnp.asarray(mask_np)
    w = jnp.asarray(r.randn(27, C, D).astype(np.float32))
    b = jnp.asarray(r.randn(D).astype(np.float32))

    xm = pack_z2(jnp.where(mask[..., None], x, 0))
    ref = np.asarray(unpack_z2(conv3_packed_z2(xm, w, b, mask=mask)))
    with _interpret():
        got = np.asarray(
            unpack_z2(block_sparse_packed_conv(pack_z2(x), w, mask, bias=b))
        )
    # The exact-zero region is plan-dependent: cells in never-visited
    # (xw, 2*tb, yt) blocks stay zero (the donated-zeros contract).
    from pasco_tpu.ops.pallas_conv import conv_plan

    xw, yt, tb = conv_plan(
        2 * C, 2 * D, Z // 2 + 2, fused=False, X=X, Y=Y
    )[:3]
    zb = 2 * tb
    Yr = Y + (-Y) % yt
    mp = np.pad(mask_np, ((0, 0), (0, 0), (0, Yr - Y)))
    tile_act = (
        mp.reshape(X // xw, xw, Z // zb, zb, Yr // yt, yt)
        .any((1, 3, 5))
    )
    act = np.repeat(
        np.repeat(np.repeat(tile_act, xw, 0), zb, 1), yt, 2
    )[:, :, :Y]
    sel = act
    np.testing.assert_allclose(got[sel], ref[sel], rtol=1e-4, atol=1e-4)
    assert np.all(got[~sel] == 0)


def test_packed_tap_weight_band_structure():
    from pasco_tpu.ops.pallas_conv import packed_tap_weight

    r = np.random.RandomState(3)
    ci, co = 3, 5
    w = jnp.asarray(r.randn(27, ci, co).astype(np.float32))
    wp = np.asarray(packed_tap_weight(w))
    assert wp.shape == (3, 3, 3, 2 * ci, 2 * co)
    # at = -1: only the (pz=1 -> oz=0) block may be nonzero
    assert np.all(wp[0, :, :, :ci, :] == 0)
    assert np.all(wp[0, :, :, ci:, co:] == 0)
    # at = +1: only the (pz=0 -> oz=1) block may be nonzero
    assert np.all(wp[2, :, :, ci:, :] == 0)
    assert np.all(wp[2, :, :, :ci, :co] == 0)


def test_fused_packed_conv_chain_matches_xla():
    from pasco_tpu.ops.dense_ops import conv3_packed_z2
    from pasco_tpu.ops.pallas_conv import (
        active_tiles_xy, fused_packed_conv, pad_stage, stage_mask8)

    r = np.random.RandomState(5)
    X, Z, Y, C = 16, 8, 32, 4
    T = Z // 2
    x = jnp.asarray(r.randn(X, T, Y, 2 * C).astype(np.float32))
    mask_np = r.rand(X, Z, Y) > 0.5
    mask_np[8:] = False
    mask = jnp.asarray(mask_np)
    w1 = jnp.asarray(r.randn(27, C, C).astype(np.float32))
    w2 = jnp.asarray(r.randn(27, C, C).astype(np.float32))
    b1, b2 = (jnp.asarray(r.randn(C).astype(np.float32)) for _ in range(2))
    a1, a2 = (
        jnp.asarray((np.abs(r.randn(2 * C)) + 0.5).astype(np.float32))
        for _ in range(2)
    )
    c1, c2 = (jnp.asarray(r.randn(2 * C).astype(np.float32)) for _ in range(2))

    lo, hi = mask[:, 0::2], mask[:, 1::2]

    def mask_mul(v):
        return jnp.concatenate(
            [
                jnp.where(lo[..., None], v[..., :C], 0),
                jnp.where(hi[..., None], v[..., C:], 0),
            ],
            axis=-1,
        )

    # XLA reference of a lean residual block (pre-act, fused contract).
    y1 = mask_mul(jnp.maximum(x * a1 + c1, 0))
    f1 = conv3_packed_z2(y1, w1, b1)
    y2 = mask_mul(jnp.maximum(f1 * a2 + c2, 0))
    ref = jnp.maximum(x + conv3_packed_z2(y2, w2, b2), 0)

    with _interpret():
        m8 = stage_mask8(mask, 2 * C)
        ids, n = active_tiles_xy(mask.any(axis=1), 8, 16)
        xp = pad_stage(x)
        o1 = fused_packed_conv(
            xp, w1, m8, ids, n, affine=(a1, c1), relu=True, bias=b1,
            out_padded=True,
        )
        o2 = fused_packed_conv(
            o1, w2, m8, ids, n, affine=(a2, c2), relu=True, bias=b2,
            skip=xp, out_padded=False,
        )
    got = np.asarray(o2)
    rn = np.asarray(ref)
    tile_act = mask_np.any(1).reshape(X // 8, 8, Y // 16, 16).any((1, 3))
    act = np.repeat(np.repeat(tile_act, 8, 0), 16, 1)
    sel = np.broadcast_to(act[:, None, :], (X, T, Y))
    d = np.abs(got - rn).max(axis=-1)
    assert d[sel].max() < 1e-3, d[sel].max()
    # cells outside active tiles are undefined (uninitialised output
    # buffers); every chain consumer masks or gathers kept cells only


@pytest.mark.slow  # multi-minute-class compile; fast tier keeps one guard per kernel family
def test_packed_conv_vjp_matches_xla():
    """Gradients of the custom-VJP Pallas conv == autodiff of the XLA
    formulation, for a loss that reads mask-valid cells only (the packed
    path's contract)."""
    import jax

    from pasco_tpu.ops.dense_ops import conv3_packed_z2, pack_z2
    from pasco_tpu.ops.pallas_conv import packed_conv_trainable

    r = np.random.RandomState(3)
    X, Z, Y, C, D = 16, 8, 32, 4, 4
    x = jnp.asarray(r.randn(X, Z, Y, C).astype(np.float32))
    mask_np = r.rand(X, Z, Y) > 0.5
    mask_np[8:] = False
    mask = jnp.asarray(mask_np)
    w = jnp.asarray(r.randn(27, C, D).astype(np.float32) * 0.1)
    b = jnp.asarray(r.randn(D).astype(np.float32) * 0.1)
    xp = pack_z2(x)
    # cotangent weights restricted to valid cells
    g = jnp.asarray(r.randn(X, Z, Y, D).astype(np.float32))
    gm = pack_z2(jnp.where(mask[..., None], g, 0))

    def loss_xla(x_, w_, b_):
        y = conv3_packed_z2(x_, w_, b_, mask=mask)
        return jnp.sum(y * gm)

    def loss_pallas(x_, w_, b_):
        y = packed_conv_trainable(x_, w_, b_, mask, True, None)
        return jnp.sum(y * gm)

    ref = jax.grad(loss_xla, argnums=(0, 1, 2))(xp, w, b)
    with _interpret():
        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(xp, w, b)
        # forward values agree at valid cells too
        y_p = packed_conv_trainable(xp, w, b, mask, True, None)
    y_x = conv3_packed_z2(xp, w, b, mask=mask)
    np.testing.assert_allclose(
        np.asarray(y_p * (gm != 0)), np.asarray(y_x * (gm != 0)),
        rtol=1e-4, atol=1e-4,
    )

    # dx: the XLA autodiff also produces cotangents at never-read cells
    # (its forward computes values there); the declared semantics make
    # those cells zero, so compare at mask-valid cells.
    mvalid = np.asarray(
        pack_z2(jnp.broadcast_to(mask[..., None], (X, Z, Y, C)).astype(
            jnp.float32))
    ) > 0
    np.testing.assert_allclose(
        np.asarray(got[0])[mvalid], np.asarray(ref[0])[mvalid],
        rtol=1e-4, atol=1e-4,
    )
    assert np.all(np.asarray(got[0])[~mvalid] == 0)
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[2]), np.asarray(ref[2]), rtol=1e-4, atol=1e-4
    )


def test_fused_refiner_matches_xla_per_subnet():
    """fused_refine_one (the S-agnostic fused refiner driver) == the XLA
    refiner math: conv1 -> BN-affine+relu -> conv2(+bias), masked."""
    from pasco_tpu.ops.dense_ops import conv3_packed_z2, pack_z2
    from pasco_tpu.models.dense_unet import fused_refine_one

    r = np.random.RandomState(7)
    X, Z, Y, C = 16, 8, 32, 4
    S = 2
    x = jnp.asarray(r.randn(X, Z, Y, C).astype(np.float32))
    xp = pack_z2(x)
    w1 = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.2)
    w2 = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.2)
    b2 = jnp.asarray(r.randn(C).astype(np.float32) * 0.1)
    a = jnp.asarray(np.abs(r.randn(2 * C)).astype(np.float32))
    c = jnp.asarray(r.randn(2 * C).astype(np.float32) * 0.1)

    for s in range(S):
        mask_np = r.rand(X, Z, Y) > 0.5
        mask_np[8:] = False
        keep = jnp.asarray(mask_np)
        lo, hi = keep[:, 0::2], keep[:, 1::2]

        def msel(v):
            cc = v.shape[-1] // 2
            return jnp.concatenate(
                [jnp.where(lo[..., None], v[..., :cc], 0),
                 jnp.where(hi[..., None], v[..., cc:], 0)], -1)

        g = conv3_packed_z2(xp, w1, None, mask=keep)
        f = jnp.maximum(msel(g) * a + c, 0)
        ref = conv3_packed_z2(msel(f), w2, b2, mask=keep)

        with _interpret():
            got = fused_refine_one(xp, keep, w1, (a, c), w2, b2, None)
        got_m = np.asarray(msel(jnp.asarray(got)))
        ref_m = np.asarray(msel(ref))
        np.testing.assert_allclose(got_m, ref_m, rtol=1e-3, atol=1e-3)


def test_conv_plan_ladder():
    from pasco_tpu.ops.pallas_conv import conv_plan

    # tiny channels, no extents: legacy 8x16 tile, double-buffered
    assert conv_plan(8, 8, 6, True) == (8, 16, 4, True, False, 1)
    # s1 flagship (64-ch slots), no extents: dense form (lane padding
    # makes the split a wash), yt pinned to the legacy 16 rounding
    xw, yt, tb, db, ss, p = conv_plan(128, 128, 18, True)
    assert (xw, yt, tb, ss) == (8, 16, 4, False) and db
    # s1 flagship WITH extents: the wide-tile plan (xw divides X, large
    # yt cuts the fixed 16-row halo's relative over-read)
    xw, yt, tb, db, ss, p = conv_plan(128, 128, 18, True, X=352, Y=352)
    assert X_DIVIDES(352, xw) and yt > 16 and db and tb == 4
    # s4 odd extents: xw must divide X=88 (16 does not)
    xw, yt, tb, db, ss, p = conv_plan(512, 512, 6, True, X=88, Y=88)
    assert 88 % xw == 0
    # s2 (128-ch slots): slot-split available, banded (t_out=8 -> tb=4)
    assert conv_plan(256, 256, 10, True)[2] == 4
    assert conv_plan(256, 256, 10, True)[4] is True
    # lane-fold factor rides the plan (active_tiles needs it)
    assert conv_plan(32, 32, 18, True)[5] == 4
    # s4 (256-ch slots): slot-split; the raised scoped-VMEM limit
    # (vmem_limit_bytes) lets the full 8-wide double-buffered tile fit
    xw, yt, tb, db, ss, p = conv_plan(512, 512, 6, True)
    assert ss is True and xw == 8 and db


def X_DIVIDES(x, w):
    return x % w == 0


@pytest.mark.slow  # multi-minute-class compile; fast tier keeps one guard per kernel family
def test_block_sparse_packed_conv_slot_split_matches_xla():
    """Ci=Co=128 triggers the slot-split tap formulation; must agree
    with the XLA packed conv on kept cells."""
    from pasco_tpu.ops.dense_ops import conv3_packed_z2, pack_z2
    from pasco_tpu.ops.pallas_conv import (
        block_sparse_packed_conv, conv_plan)

    assert conv_plan(256, 256, 6, False)[3] is True
    r = np.random.RandomState(11)
    X, Z, Y, C = 8, 8, 32, 128
    x = jnp.asarray(r.randn(X, Z, Y, C).astype(np.float32) * 0.2)
    mask_np = r.rand(X, Z, Y) > 0.4
    mask_np[:, :, 16:] = False       # one inactive y tile
    mask = jnp.asarray(mask_np)
    w = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.05)
    b = jnp.asarray(r.randn(C).astype(np.float32) * 0.1)

    xm = pack_z2(jnp.where(mask[..., None], x, 0))
    ref = conv3_packed_z2(xm, w, b, mask=mask)
    with _interpret():
        got = block_sparse_packed_conv(pack_z2(x), w, mask, bias=b)

    lo, hi = mask[:, 0::2], mask[:, 1::2]
    sel = np.concatenate(
        [np.asarray(lo)[..., None].repeat(C, -1),
         np.asarray(hi)[..., None].repeat(C, -1)], -1)
    d = np.abs(np.asarray(got) - np.asarray(ref))[sel]
    assert d.max() < 2e-3, d.max()


def test_fused_packed_conv_slot_split_matches_xla():
    """Fused chain at Ci=Co=128 (slot-split formulation) == XLA math."""
    from pasco_tpu.ops.dense_ops import conv3_packed_z2
    from pasco_tpu.ops.pallas_conv import (
        active_tiles, conv_plan, fused_packed_conv, pad_stage,
        stage_mask8, unpad_stage)

    r = np.random.RandomState(12)
    X, Z, Y, C = 8, 8, 32, 128
    T = Z // 2
    x = jnp.asarray(r.randn(X, T, Y, 2 * C).astype(np.float32) * 0.2)
    mask_np = r.rand(X, Z, Y) > 0.4
    mask_np[:, :, 16:] = False
    mask = jnp.asarray(mask_np)
    w = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.05)
    b = jnp.asarray(r.randn(C).astype(np.float32) * 0.1)
    a = jnp.asarray((np.abs(r.randn(2 * C)) + 0.5).astype(np.float32))
    c = jnp.asarray(r.randn(2 * C).astype(np.float32) * 0.1)

    plan = conv_plan(2 * C, 2 * C, T + 2, fused=True)
    assert plan[4] is True

    lo, hi = mask[:, 0::2], mask[:, 1::2]

    def msel(v):
        cc = v.shape[-1] // 2
        return jnp.concatenate(
            [jnp.where(lo[..., None], v[..., :cc], 0),
             jnp.where(hi[..., None], v[..., cc:], 0)], -1)

    ref = conv3_packed_z2(msel(jnp.maximum(x * a + c, 0)), w, b)

    with _interpret():
        m8 = stage_mask8(mask, 2 * C)
        ids, n = active_tiles(mask, plan[0], plan[1], plan[2], plan[5])
        got = fused_packed_conv(
            pad_stage(x), w, m8, ids, n, affine=(a, c), relu=True,
            bias=b, out_padded=False, plan=plan,
        )
    tile_act = mask_np.any(1).reshape(
        X // plan[0], plan[0], Y // plan[1], plan[1]).any((1, 3))
    act = np.repeat(np.repeat(tile_act, plan[0], 0), plan[1], 1)
    sel = np.broadcast_to(act[:, None, :], (X, T, Y))
    d = np.abs(np.asarray(got) - np.asarray(ref)).max(axis=-1)
    assert d[sel].max() < 2e-3, d[sel].max()


@pytest.mark.slow  # multi-minute-class compile; fast tier keeps one guard per kernel family
def test_fused_packed_conv_y_tile_rounding():
    """Y extents that are not a 16-multiple (e.g. stride-4 of a 352 box
    -> 88) run the fused kernel via internal y rounding; outputs match
    the XLA oracle on the logical extent."""
    from pasco_tpu.ops.dense_ops import conv3_packed_z2
    from pasco_tpu.ops.pallas_conv import (
        active_tiles, conv_plan, fused_packed_conv, pad_stage,
        stage_mask8, unpad_stage)

    r = np.random.RandomState(21)
    X, Z, Y, C = 16, 8, 24, 8          # Y % 16 == 8
    T = Z // 2
    x = jnp.asarray(r.randn(X, T, Y, 2 * C).astype(np.float32) * 0.3)
    mask_np = r.rand(X, Z, Y) > 0.5
    mask = jnp.asarray(mask_np)
    w = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.1)
    b = jnp.asarray(r.randn(C).astype(np.float32) * 0.1)

    plan = conv_plan(2 * C, 2 * C, T + 2, fused=True)
    lo, hi = mask[:, 0::2], mask[:, 1::2]

    def msel(v):
        cc = v.shape[-1] // 2
        return jnp.concatenate(
            [jnp.where(lo[..., None], v[..., :cc], 0),
             jnp.where(hi[..., None], v[..., cc:], 0)], -1)

    ref = conv3_packed_z2(msel(x), w, b)

    with _interpret():
        m8 = stage_mask8(mask, 2 * C)
        ids, n = active_tiles(mask, plan[0], plan[1], plan[2], plan[5])
        xp = pad_stage(x)
        assert xp.shape[2] % plan[1] == 0
        got_pad = fused_packed_conv(
            xp, w, m8, ids, n, bias=b, out_padded=True, plan=plan,
        )
        got = unpad_stage(got_pad, y=Y)
    assert got.shape == ref.shape
    yr = -(-Y // plan[1]) * plan[1]
    tile_act = np.pad(mask_np.any(1), ((0, 0), (0, yr - Y))).reshape(
        X // plan[0], plan[0], yr // plan[1], plan[1]).any((1, 3))
    act = np.repeat(np.repeat(tile_act, plan[0], 0), plan[1], 1)[:, :Y]
    sel = np.broadcast_to(act[:, None, :], (X, T, Y))
    d = np.abs(np.asarray(got) - np.asarray(ref)).max(axis=-1)
    assert d[sel].max() < 2e-3, d[sel].max()


def test_block_sparse_packed_conv_y_tile_rounding():
    """The non-fused packed conv also rounds Y internally and crops."""
    from pasco_tpu.ops.dense_ops import conv3_packed_z2
    from pasco_tpu.ops.pallas_conv import block_sparse_packed_conv

    r = np.random.RandomState(22)
    X, Z, Y, C = 8, 8, 40, 8           # Y % 16 == 8
    T = Z // 2
    x = jnp.asarray(r.randn(X, T, Y, 2 * C).astype(np.float32) * 0.3)
    mask = jnp.asarray(r.rand(X, Z, Y) > 0.5)
    w = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.1)

    ref = conv3_packed_z2(x, w, None, mask=mask)
    with _interpret():
        got = block_sparse_packed_conv(x, w, mask)
    assert got.shape == ref.shape
    # every xy tile is active at this density; compare everywhere
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert d.max() < 2e-3, d.max()


@pytest.mark.slow  # multi-minute-class compile; fast tier keeps one guard per kernel family
def test_fused_packed_conv_lane_fold_matches_xla():
    """s1-proportioned stage (2C = 32 lanes, T = 16): the chain buffers
    lane-fold p = 4 z-pair rows into the 128-lane tile (lane_fold)."""
    from pasco_tpu.ops.dense_ops import conv3_packed_z2
    from pasco_tpu.ops.pallas_conv import (
        active_tiles, block_sparse_packed_conv, conv_plan,
        fused_packed_conv, lane_fold, pad_stage, stage_mask8)

    r = np.random.RandomState(9)
    X, Z, Y, C = 16, 32, 32, 16
    T = Z // 2
    assert lane_fold(2 * C, 2 * C, T) == 4
    x = jnp.asarray(r.randn(X, T, Y, 2 * C).astype(np.float32))
    mask_np = r.rand(X, Z, Y) > 0.4
    mask_np[12:] = False
    mask = jnp.asarray(mask_np)
    w1 = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.2)
    w2 = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.2)
    b1, b2 = (jnp.asarray(r.randn(C).astype(np.float32)) for _ in range(2))
    a1, a2 = (
        jnp.asarray((np.abs(r.randn(2 * C)) + 0.5).astype(np.float32))
        for _ in range(2)
    )
    c1, c2 = (jnp.asarray(r.randn(2 * C).astype(np.float32)) for _ in range(2))

    lo, hi = mask[:, 0::2], mask[:, 1::2]

    def mask_mul(v):
        return jnp.concatenate(
            [
                jnp.where(lo[..., None], v[..., :C], 0),
                jnp.where(hi[..., None], v[..., C:], 0),
            ],
            axis=-1,
        )

    y1 = mask_mul(jnp.maximum(x * a1 + c1, 0))
    f1 = conv3_packed_z2(y1, w1, b1)
    y2 = mask_mul(jnp.maximum(f1 * a2 + c2, 0))
    ref = jnp.maximum(x + conv3_packed_z2(y2, w2, b2), 0)

    plan = conv_plan(2 * C, 2 * C, T + 2, fused=True)
    with _interpret():
        m8 = stage_mask8(mask, 2 * C)
        assert m8.shape[-1] == 128 and m8.shape[1] == T // 4 + 2
        ids, n = active_tiles(mask, plan[0], plan[1], plan[2], plan[5])
        xp = pad_stage(x)
        assert xp.shape[-1] == 128 and xp.shape[1] == T // 4 + 2
        o1 = fused_packed_conv(
            xp, w1, m8, ids, n, affine=(a1, c1), relu=True, bias=b1,
            out_padded=True, plan=plan,
        )
        assert o1.shape == xp.shape
        o2 = fused_packed_conv(
            o1, w2, m8, ids, n, affine=(a2, c2), relu=True, bias=b2,
            skip=xp, out_padded=False, plan=plan,
        )
        # the standalone (non-chain) kernel folds/unfolds internally
        bs = block_sparse_packed_conv(mask_mul(x), w1, mask, bias=b1)
    got = np.asarray(o2)
    rn = np.asarray(ref)
    assert got.shape == rn.shape
    xw, yt = plan[0], plan[1]
    tile_act = mask_np.any(1).reshape(X // xw, xw, Y // yt, yt).any((1, 3))
    act = np.repeat(np.repeat(tile_act, xw, 0), yt, 1)
    sel = np.broadcast_to(act[:, None, :], (X, T, Y))
    d = np.abs(got - rn).max(axis=-1)
    assert d[sel].max() < 1e-3, d[sel].max()
    bs_ref = np.asarray(conv3_packed_z2(mask_mul(x), w1, b1))
    db = np.abs(np.asarray(bs) - bs_ref).max(axis=-1)
    assert db[sel].max() < 1e-3, db[sel].max()


def test_packed_conv_t_banded_grid():
    """nb > 1 (t-banded grid): Z=16 at p=1 gives 2 bands per xy tile.
    Occupancy crosses the band boundary (halo rows) and leaves some
    (tile, band) blocks empty; outputs must match XLA at mask-true
    cells, and the non-fused kernel must return exact zeros at inactive
    blocks."""
    from pasco_tpu.ops.dense_ops import conv3_packed_z2, pack_z2
    from pasco_tpu.ops.pallas_conv import (
        active_tiles, block_sparse_packed_conv, conv_plan,
        fused_packed_conv, pad_stage, stage_mask8)

    r = np.random.RandomState(31)
    X, Z, Y, C = 16, 16, 32, 64
    T = Z // 2
    plan = conv_plan(2 * C, 2 * C, T + 2, fused=True)
    xw, yt, tb, _, _, p = plan
    assert p == 1 and tb == 4 and T // tb == 2   # two bands
    mask_np = np.zeros((X, Z, Y), bool)
    # ground band + sparse structure above, crossing z=8 (band boundary)
    mask_np[:8, 0:3] = r.rand(8, 3, Y) > 0.3
    mask_np[:8, 7:10, 5:9] = r.rand(8, 3, 4) > 0.3
    mask_np[8:, :] = False                       # dead tiles
    mask = jnp.asarray(mask_np)
    x = jnp.asarray(r.randn(X, T, Y, 2 * C).astype(np.float32) * 0.3)
    w = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.05)
    b = jnp.asarray(r.randn(C).astype(np.float32) * 0.1)
    a = jnp.asarray((np.abs(r.randn(2 * C)) + 0.5).astype(np.float32))
    c = jnp.asarray(r.randn(2 * C).astype(np.float32) * 0.1)

    lo, hi = mask[:, 0::2], mask[:, 1::2]

    def msel(v):
        cc = v.shape[-1] // 2
        return jnp.concatenate(
            [jnp.where(lo[..., None], v[..., :cc], 0),
             jnp.where(hi[..., None], v[..., cc:], 0)], -1)

    ref_f = conv3_packed_z2(msel(jnp.maximum(x * a + c, 0)), w, b)
    ref_b = conv3_packed_z2(msel(x), w, b)

    with _interpret():
        ids, n = active_tiles(mask, xw, yt, tb, p)
        m8 = stage_mask8(mask, 2 * C)
        got_f = fused_packed_conv(
            pad_stage(x), w, m8, ids, n, affine=(a, c), relu=True,
            bias=b, out_padded=False, plan=plan,
        )
        got_b = block_sparse_packed_conv(msel(x), w, mask, bias=b)

    # expected active blocks: band of 4 t rows (8 z) per (xw, yt) xy tile
    blk = mask_np.reshape(X // xw, xw, 2, 8, Y // yt, yt).any((1, 3, 5))
    assert 0 < blk.sum() < blk.size              # genuinely banded
    mvalid = np.asarray(msel(jnp.ones((X, T, Y, 2 * C)))) > 0
    for got, ref in ((got_f, ref_f), (got_b, ref_b)):
        d = np.abs(np.asarray(got) - np.asarray(ref))
        assert d[mvalid].max() < 2e-3, d[mvalid].max()
    # non-fused kernel: exact zeros at inactive (tile, band) blocks —
    # block_sparse_packed_conv computes its own extent-aware plan, so
    # the zero pattern is derived from THAT plan's tiling.
    xwb, ytb, tbb = conv_plan(2 * C, 2 * C, T + 2, fused=False, X=X, Y=Y)[:3]
    zbb = 2 * tbb
    blk_b = (
        mask_np.reshape(X // xwb, xwb, Z // zbb, zbb, Y // ytb, ytb)
        .any((1, 3, 5))
    )
    act_b = np.repeat(np.repeat(np.repeat(
        blk_b, xwb, 0), tbb, 1), ytb, 2)         # [X, T, Y]
    gb = np.asarray(got_b)
    assert np.all(gb[~act_b] == 0)
    assert np.abs(gb[act_b]).max() > 0
