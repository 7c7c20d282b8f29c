"""Fused down-step kernel vs the XLA composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from pasco_tpu.ops.dense_ops import (
    down2_packed_to_packed, mask_mul_z2, maxpool2_mask)
from pasco_tpu.ops.pallas_conv import pad_stage, stage_mask8
from pasco_tpu.ops.pallas_down import down_padded_to_padded


def xla_down(x, mask, wd, bd, a1, c1, a2, c2):
    """DenseDown at inference: masked input, conv, bn1, leaky, bn2, relu."""
    cd = jnp.bfloat16
    lo, hi = mask[:, 0::2], mask[:, 1::2]
    xm = mask_mul_z2(x, lo, hi)
    out = down2_packed_to_packed(xm, wd, bd, cd)
    y = out.astype(jnp.float32) * a1 + c1
    y = jnp.where(y > 0, y, 0.01 * y)
    y = y * a2 + c2
    return jnp.maximum(y, 0).astype(cd)


def test_down_padded_matches_xla():
    r = np.random.RandomState(0)
    X, Z, Y = 32, 8, 64          # producer stage extents (T = 4)
    T = Z // 2
    ci, co = 8, 16
    x = jnp.asarray(r.randn(X, T, Y, 2 * ci), jnp.bfloat16)
    mask = jnp.asarray(r.rand(X, Z, Y) < 0.5)
    wd = jnp.asarray(r.randn(8, ci, co) * 0.1, jnp.float32)
    bd = jnp.asarray(r.randn(co) * 0.1, jnp.float32)
    a1 = jnp.asarray(r.rand(2 * co) + 0.5, jnp.float32)
    c1 = jnp.asarray(r.randn(2 * co) * 0.1, jnp.float32)
    a2 = jnp.asarray(r.rand(2 * co) + 0.5, jnp.float32)
    c2 = jnp.asarray(r.randn(2 * co) * 0.1, jnp.float32)

    ref = jax.jit(lambda: xla_down(x, mask, wd, bd, a1, c1, a2, c2))()
    new_mask = maxpool2_mask(mask)        # [X/2, Z/2, Y/2] (xzy)

    # the producer chain's buffer: pad_stage of the (masked) features —
    # the kernel's prologue re-masks, so pre-masking only mimics the
    # chain contract (valid cells correct, invalid cells arbitrary)
    lo, hi = mask[:, 0::2], mask[:, 1::2]
    xpad = pad_stage(mask_mul_z2(x, lo, hi))
    m8 = stage_mask8(mask, 2 * ci)
    occ_xy = jnp.any(new_mask, axis=1)
    with pltpu.force_tpu_interpret_mode():
        got_pad = jax.jit(
            lambda: down_padded_to_padded(
                xpad, m8, occ_xy, wd, bd, (a1, c1), (a2, c2), Y // 2
            )
        )()
    got = got_pad[1 : 1 + X // 2, 1 : 1 + T // 2, 16 : 16 + Y // 2]

    # compare at cells of ACTIVE output tiles only (inactive = garbage),
    # which at this density is everywhere
    d = np.abs(
        np.asarray(got.astype(jnp.float32)) - np.asarray(ref.astype(jnp.float32))
    )
    assert d.max() < 0.05, d.max()


def test_down_padded_partial_tiles():
    r = np.random.RandomState(1)
    X, Z, Y = 32, 4, 64
    T = Z // 2
    ci = co = 4
    x = jnp.asarray(r.randn(X, T, Y, 2 * ci), jnp.bfloat16)
    occ = np.zeros((X, Z, Y), bool)
    occ[:16, :, :32] = r.rand(16, Z, 32) < 0.6   # one output tile's worth
    mask = jnp.asarray(occ)
    wd = jnp.asarray(r.randn(8, ci, co) * 0.2, jnp.float32)
    bd = jnp.zeros((co,), jnp.float32)
    ident = jnp.ones((2 * co,), jnp.float32)
    zero = jnp.zeros((2 * co,), jnp.float32)

    ref = jax.jit(lambda: xla_down(x, mask, wd, bd, ident, zero, ident, zero))()
    lo, hi = mask[:, 0::2], mask[:, 1::2]
    xpad = pad_stage(mask_mul_z2(x, lo, hi))
    m8 = stage_mask8(mask, 2 * ci)
    new_mask = maxpool2_mask(mask)
    occ_xy = jnp.any(new_mask, axis=1)
    with pltpu.force_tpu_interpret_mode():
        got_pad = jax.jit(
            lambda: down_padded_to_padded(
                xpad, m8, occ_xy, wd, bd, (ident, zero), (ident, zero),
                Y // 2,
            )
        )()
    got = got_pad[1 : 1 + 8, 1 : 1 + T // 2, 16 : 16 + 16]
    exp = ref[:8, :, :16]
    d = np.abs(
        np.asarray(got.astype(jnp.float32)) - np.asarray(exp.astype(jnp.float32))
    )
    assert d.max() < 0.05, d.max()


def test_down_padded_reduced_tile_plan(monkeypatch):
    """The VMEM-ladder fallback (xw=4, single-buffered) computes the
    same output as the default (8, double-buffered) plan."""
    import pasco_tpu.ops.pallas_down as pd

    r = np.random.RandomState(2)
    X, Z, Y = 32, 8, 64
    T = Z // 2
    ci, co = 8, 16
    x = jnp.asarray(r.randn(X, T, Y, 2 * ci), jnp.bfloat16)
    mask = jnp.asarray(r.rand(X, Z, Y) < 0.5)
    wd = jnp.asarray(r.randn(8, ci, co) * 0.1, jnp.float32)
    bd = jnp.asarray(r.randn(co) * 0.1, jnp.float32)
    a1 = jnp.asarray(r.rand(2 * co) + 0.5, jnp.float32)
    c1 = jnp.asarray(r.randn(2 * co) * 0.1, jnp.float32)
    lo, hi = mask[:, 0::2], mask[:, 1::2]
    xpad = pad_stage(mask_mul_z2(x, lo, hi))
    m8 = stage_mask8(mask, 2 * ci)
    occ_xy = jnp.any(maxpool2_mask(mask), axis=1)

    def run():
        with pltpu.force_tpu_interpret_mode():
            return jax.jit(
                lambda: down_padded_to_padded(
                    xpad, m8, occ_xy, wd, bd, (a1, c1), (a1, c1), Y // 2
                )
            )()

    base = np.asarray(run().astype(jnp.float32))
    monkeypatch.setattr(pd, "down_plan", lambda *a: (4, False))
    small = np.asarray(run().astype(jnp.float32))
    itr = np.s_[1 : 1 + X // 2, 1 : 1 + T // 2, 16 : 16 + Y // 2]
    assert np.abs(base[itr] - small[itr]).max() < 1e-5
