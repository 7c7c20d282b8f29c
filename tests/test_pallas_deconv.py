"""Fused up-preamble kernel vs the XLA decoder preamble (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from pasco_tpu.core.sparse import Box
from pasco_tpu.ops.dense_ops import (
    blockdiag2_weight, cell_coords, deconv2_packed_to_packed, pack_z2,
    upsample2_mask)
from pasco_tpu.ops.pallas_conv import active_tiles_xy
from pasco_tpu.ops.pallas_deconv import XW, YT, up_preamble_padded


def xla_preamble(xm, skip, box, scale, wd, bd, a1, c1, a2, c2, wr, br,
                 child=None):
    """The DenseDecoderStage preamble, composed exactly (lean/inference).

    ``child``: logical [X, T, Y] bool mask of generated-child cells — the
    dec side is zeroed outside it before the union skip add (ME
    ``dec + shortcut``); None keeps the dec side everywhere."""
    cd = jnp.bfloat16
    x = deconv2_packed_to_packed(xm, wd, bd, cd)
    f = (x.astype(jnp.float32) * a1 + c1)
    y1 = jnp.where(f > 0, f, 0.01 * f).astype(cd)
    ch = wd.shape[-1]
    norm_c = (
        cell_coords(box, scale, "xzy").astype(jnp.float32) / scale
    ).astype(cd)
    ncp = pack_z2(norm_c)
    xc = jnp.concatenate(
        [y1[..., :ch], ncp[..., :3], y1[..., ch:], ncp[..., 3:]], axis=-1
    )
    xc = (xc.astype(jnp.float32) * a2 + c2).astype(cd)
    wk = blockdiag2_weight(wr).astype(cd)
    out = jnp.dot(xc.reshape(-1, xc.shape[-1]), wk).reshape(
        *xc.shape[:-1], 2 * ch
    )
    out = out + jnp.concatenate([br, br]).astype(out.dtype)
    out = out.astype(cd)
    if child is not None:
        out = jnp.where(child[..., None], out, 0)
    return out + skip.astype(cd)


def padded_child_m8(child, co2):
    """Unfolded padded int8 mask [X+2, T+2, Ypad, co2] from a logical
    packed-row [X, T, Y] bool mask (the p == 1 ``stage_mask8`` layout the
    fused up path feeds the kernel; test channel counts would lane-fold)."""
    X, T, Y = child.shape
    ypad = Y + (-Y) % 16 + 32
    m = np.zeros((X + 2, T + 2, ypad, co2), np.int8)
    m[1 : 1 + X, 1 : 1 + T, 16 : 16 + Y] = np.asarray(child, np.int8)[
        ..., None
    ]
    return jnp.asarray(m)


def test_up_preamble_matches_xla():
    r = np.random.RandomState(0)
    X, Z, Y = 16, 8, 64         # output stage extents (T = 4)
    T = Z // 2
    ci, co = 12, 8
    scale = 2
    xm = jnp.asarray(
        r.randn(X // 2, T // 2, Y // 2, 2 * ci) * 0.5, jnp.bfloat16
    )
    skip = jnp.asarray(r.randn(X, T, Y, 2 * co) * 0.5, jnp.bfloat16)
    wd = jnp.asarray(r.randn(8, ci, co) * 0.1, jnp.float32)
    bd = jnp.asarray(r.randn(co) * 0.1, jnp.float32)
    a1 = jnp.asarray(r.rand(2 * co) + 0.5, jnp.float32)
    c1 = jnp.asarray(r.randn(2 * co) * 0.1, jnp.float32)
    a2 = jnp.asarray(r.rand(2 * (co + 3)) + 0.5, jnp.float32)
    c2 = jnp.asarray(r.randn(2 * (co + 3)) * 0.1, jnp.float32)
    wr = jnp.asarray(r.randn(co + 3, co) * 0.1, jnp.float32)
    br = jnp.asarray(r.randn(co) * 0.1, jnp.float32)
    gmin = jnp.asarray([-8, 4, 2], jnp.int32)
    box = Box.create(gmin, (X * scale, Y * scale, Z * scale))

    ref = jax.jit(
        lambda: xla_preamble(
            xm, skip, box, scale, wd, bd, a1, c1, a2, c2, wr, br
        )
    )()

    occ_xy = jnp.ones((X, Y), bool)       # all tiles active
    cm8 = padded_child_m8(jnp.ones((X, T, Y), bool), 2 * co)
    with pltpu.force_tpu_interpret_mode():
        got_pad = jax.jit(
            lambda: up_preamble_padded(
                xm, skip, occ_xy, gmin, scale, wd, bd, (a1, c1), (a2, c2),
                wr, br, child_m8=cm8,
            )
        )()
    got = got_pad[1 : 1 + X, 1 : 1 + T, 16 : 16 + Y]

    d = np.abs(
        np.asarray(got.astype(jnp.float32)) - np.asarray(ref.astype(jnp.float32))
    )
    scale_ref = np.abs(np.asarray(ref.astype(jnp.float32))).max()
    assert d.max() <= 0.05 * max(scale_ref, 1.0), (d.max(), scale_ref)


def test_up_preamble_partial_tiles():
    """Inactive tiles are skipped; active interior matches."""
    r = np.random.RandomState(1)
    X, Z, Y = 16, 4, 64
    T = Z // 2
    ci, co = 4, 4
    scale = 1
    xm = jnp.asarray(r.randn(X // 2, T // 2, Y // 2, 2 * ci), jnp.bfloat16)
    skip = jnp.asarray(r.randn(X, T, Y, 2 * co), jnp.bfloat16)
    wd = jnp.asarray(r.randn(8, ci, co) * 0.2, jnp.float32)
    bd = jnp.zeros((co,), jnp.float32)
    a1 = jnp.ones((2 * co,), jnp.float32)
    c1 = jnp.zeros((2 * co,), jnp.float32)
    a2 = jnp.ones((2 * (co + 3),), jnp.float32)
    c2 = jnp.zeros((2 * (co + 3),), jnp.float32)
    wr = jnp.asarray(r.randn(co + 3, co) * 0.2, jnp.float32)
    br = jnp.zeros((co,), jnp.float32)
    gmin = jnp.zeros((3,), jnp.int32)
    box = Box.create(gmin, (X, Y, Z))

    occ = np.zeros((X, Y), bool)
    occ[:XW, :YT] = True                  # exactly one active tile
    ref = jax.jit(
        lambda: xla_preamble(
            xm, skip, box, scale, wd, bd, a1, c1, a2, c2, wr, br
        )
    )()
    cm8 = padded_child_m8(jnp.ones((X, T, Y), bool), 2 * co)
    with pltpu.force_tpu_interpret_mode():
        got_pad = jax.jit(
            lambda: up_preamble_padded(
                xm, skip, jnp.asarray(occ), gmin, scale, wd, bd,
                (a1, c1), (a2, c2), wr, br, child_m8=cm8,
            )
        )()
    got = got_pad[1 : 1 + XW, 1 : 1 + T, 16 : 16 + YT]
    exp = ref[:XW, :, :YT]
    d = np.abs(
        np.asarray(got.astype(jnp.float32)) - np.asarray(exp.astype(jnp.float32))
    )
    assert d.max() < 0.05, d.max()


@pytest.mark.slow  # multi-minute-class compile; fast tier keeps one guard per kernel family
def test_up_preamble_reduced_tile_plan(monkeypatch):
    """xw=4 (VMEM-ladder fallback) matches the default xw=8 plan."""
    import pasco_tpu.ops.pallas_deconv as pdc

    r = np.random.RandomState(3)
    X2, T2, Y2, ci, co = 8, 4, 32, 8, 8
    parent = jnp.asarray(r.randn(X2, T2, Y2, 2 * ci), jnp.bfloat16)
    skip = jnp.asarray(
        r.randn(2 * X2, 2 * T2, 2 * Y2, 2 * co), jnp.bfloat16
    )
    occ = jnp.ones((2 * X2, 2 * Y2), bool)
    gmin = jnp.zeros((3,), jnp.int32)
    wd = jnp.asarray(r.randn(8, ci, co) * 0.1, jnp.float32)
    bd = jnp.asarray(r.randn(co) * 0.1, jnp.float32)
    a1 = jnp.asarray(r.rand(2 * co) + 0.5, jnp.float32)
    c1 = jnp.asarray(r.randn(2 * co) * 0.1, jnp.float32)
    a2 = jnp.asarray(r.rand(2 * (co + 3)) + 0.5, jnp.float32)
    c2 = jnp.asarray(r.randn(2 * (co + 3)) * 0.1, jnp.float32)
    wr = jnp.asarray(r.randn(co + 3, co) * 0.1, jnp.float32)
    br = jnp.asarray(r.randn(co) * 0.1, jnp.float32)

    cm8 = padded_child_m8(
        jnp.ones((2 * X2, 2 * T2, 2 * Y2), bool), 2 * co
    )

    def run():
        jax.clear_caches()   # _up_call derives xw inside its jit trace
        with pltpu.force_tpu_interpret_mode():
            return jax.jit(
                lambda: up_preamble_padded(
                    parent, skip, occ, gmin, 1, wd, bd, (a1, c1),
                    (a2, c2), wr, br, child_m8=cm8,
                )
            )()

    base = np.asarray(run().astype(jnp.float32))
    monkeypatch.setattr(pdc, "up_plan", lambda *a: 4)
    small = np.asarray(run().astype(jnp.float32))
    itr = np.s_[1 : 1 + 2 * X2, 1 : 1 + 2 * T2, 16 : 16 + 2 * Y2]
    assert np.abs(base[itr] - small[itr]).max() < 1e-5

def test_up_preamble_union_skip_cells():
    """Cells in the skip but NOT generated as children must carry the
    shortcut features alone (ME union-add, decoder_v3.py:163): the kernel
    zeros the dec-side preamble outside the child mask before the add."""
    r = np.random.RandomState(4)
    X, Z, Y = 16, 8, 64
    T = Z // 2
    ci, co = 8, 8
    scale = 1
    xm = jnp.asarray(r.randn(X // 2, T // 2, Y // 2, 2 * ci), jnp.bfloat16)
    skip = jnp.asarray(r.randn(X, T, Y, 2 * co), jnp.bfloat16)
    wd = jnp.asarray(r.randn(8, ci, co) * 0.1, jnp.float32)
    bd = jnp.asarray(r.randn(co) * 0.1, jnp.float32)
    a1 = jnp.asarray(r.rand(2 * co) + 0.5, jnp.float32)
    c1 = jnp.asarray(r.randn(2 * co) * 0.5, jnp.float32)  # big BN bias:
    #   an unmasked dec side would visibly corrupt skip-only cells
    a2 = jnp.asarray(r.rand(2 * (co + 3)) + 0.5, jnp.float32)
    c2 = jnp.asarray(r.randn(2 * (co + 3)) * 0.5, jnp.float32)
    wr = jnp.asarray(r.randn(co + 3, co) * 0.1, jnp.float32)
    br = jnp.asarray(r.randn(co) * 0.1, jnp.float32)
    gmin = jnp.zeros((3,), jnp.int32)
    box = Box.create(gmin, (X, Y, Z))
    child = jnp.asarray(r.rand(X, T, Y) < 0.6)

    ref = jax.jit(
        lambda: xla_preamble(
            xm, skip, box, scale, wd, bd, a1, c1, a2, c2, wr, br,
            child=child,
        )
    )()
    occ_xy = jnp.ones((X, Y), bool)
    cm8 = padded_child_m8(child, 2 * co)
    with pltpu.force_tpu_interpret_mode():
        got_pad = jax.jit(
            lambda: up_preamble_padded(
                xm, skip, occ_xy, gmin, scale, wd, bd, (a1, c1), (a2, c2),
                wr, br, child_m8=cm8,
            )
        )()
    got = got_pad[1 : 1 + X, 1 : 1 + T, 16 : 16 + Y]
    d = np.abs(
        np.asarray(got.astype(jnp.float32))
        - np.asarray(ref.astype(jnp.float32))
    )
    scale_ref = np.abs(np.asarray(ref.astype(jnp.float32))).max()
    assert d.max() <= 0.05 * max(scale_ref, 1.0), (d.max(), scale_ref)
    # skip-only cells: exactly the shortcut features
    so = np.asarray(~child)
    g32 = np.asarray(got.astype(jnp.float32))
    s32 = np.asarray(skip.astype(jnp.float32))
    assert np.abs(g32[so] - s32[so]).max() < 1e-6
