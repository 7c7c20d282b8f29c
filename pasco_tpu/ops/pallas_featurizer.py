"""Fused featurizer: point paste-max + occupancy + enc_in, one kernel.

Replaces the XLA chain  scatter-max -> table init -> row-max occupancy ->
sentinel select -> enc_in 1x1 einsum -> pad_stage -> stage_mask8  for the
inference S == 1 z-packed path (reference: the CylinderFeat scatter +
``Augmenter.merge`` densify + ``enc_in`` stem of
``pasco/models/unet3d_sparse_v2.py:216-238``).

XLA:TPU lowers the 160k-point scatter-max into a 4M-row table to a
serialised per-row read-modify-write (profiled 11.2 ms/scan at 5 GB/s),
and every consumer pass (init broadcast, occupancy reduce, enc_in dot,
pad, mask build) re-reads the ~508 MB volume.  This kernel walks the
volume once in x-slab windows:

* points are pre-sorted (XLA) by ``slot-major key = slot * ncells + cell``
  so each (window, z-slot) is a contiguous point range — the kernel
  paste-maxes them into a VMEM-resident window at ~100M pts/s via
  dynamic sublane stores (the XLA scatter's per-row HBM round-trip
  becomes a VMEM store);
* per-cell occupancy falls out of a lane-group max over the window;
* empty cells are zeroed (the ``Augmenter.merge`` densify contract) and
  the enc_in 1x1 blockdiag weight is applied as one MXU dot;
* the window writes straight into the enc_s1 chain's PADDED input
  buffer plus the stage's lane-expanded int8 mask (borders zeroed), so
  ``pad_stage`` and ``stage_mask8`` never materialise.

Layouts match ops/pallas_conv.py: z-pair packing in lanes (slot halves),
fixed HY=16 y-halo, y rounded to the stage plan's yt.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from pasco_tpu.ops.pallas_conv import HY, _compiler_params

XW = 8          # x columns per window (gates require X % 8 == 0)


def _featurizer_kernel(
    keys_ref,               # SMEM [P] int32 sorted slot-major keys
    starts_ref,             # SMEM [2*NW + 1] int32 window point offsets
    f_ref,                  # VMEM [P, F] sorted point features (cd)
    w_ref,                  # VMEM [2F, 2C] enc_in blockdiag weight (cd)
    b_ref,                  # VMEM [1, 2C] f32 enc_in bias (tiled)
    xpad_ref,               # HBM [X+2, T+2, Ypad, 2C] chain input (out)
    m8_ref,                 # HBM [X+2, T+2, Ypad, 2C] int8 stage mask (out)
    occ_ref,                # HBM [2, NW, R//128, 128] int8 occupancy (out)
    win,                    # VMEM [R, 2F] paste window
    ebuf,                   # VMEM [XW, T, Y, 2C] enc_in output tile
    mbuf,                   # VMEM [XW, T+2, Ypad, 2C] int8
    zbuf,                   # VMEM [1, T+2, Ypad, 2C] int8 zeros
    obuf,                   # VMEM [2, R//128, 128] int8
    sems,                   # DMA sems (4,)
    *,
    T: int, Y: int, Ypad: int, NW: int, neg: float,
):
    g = pl.program_id(0)
    F = f_ref.shape[-1]
    R = win.shape[0]
    C2 = win.shape[-1]
    ncells = NW * R

    win[...] = jnp.full((R, C2), neg, win.dtype)

    def paste(slot):
        base = slot * ncells + g * R
        s = starts_ref[slot * NW + g]
        e = starts_ref[slot * NW + g + 1]

        def body(i, _):
            rl = keys_ref[i] - base
            v = f_ref[pl.ds(i, 1), :]
            if slot == 0:
                cur = win[pl.ds(rl, 1), :F]
                win[pl.ds(rl, 1), :F] = jnp.maximum(cur, v)
            else:
                cur = win[pl.ds(rl, 1), F:]
                win[pl.ds(rl, 1), F:] = jnp.maximum(cur, v)
            return 0

        jax.lax.fori_loop(s, e, body, 0)

    paste(0)
    paste(1)

    # Occupancy per (cell, slot): lane-group max over the window.  The
    # [R, 2F] -> [R//128, 128, 2F] reshape splits sublanes (free); the
    # lane reduce leaves lane = cell % 128 — the compact layout occ_ref
    # stores (XLA unpacks it to the logical [X, Z, Y] mask).
    w3 = win[...].reshape(R // 128, 128, C2)
    occ_lo = jnp.max(w3[:, :, :F], axis=2) > neg
    occ_hi = jnp.max(w3[:, :, F:], axis=2) > neg
    obuf[0] = occ_lo.astype(jnp.int8)
    obuf[1] = occ_hi.astype(jnp.int8)
    occ_dma = pltpu.make_async_copy(
        obuf, occ_ref.at[:, g], sems.at[2]
    )
    occ_dma.start()

    # Zero empty cells (Augmenter.merge densify: empty slots contribute
    # exact zeros to enc_in) and lane-expand the int8 stage mask.
    mask_l = jnp.broadcast_to(occ_lo[:, :, None], (R // 128, 128, F))
    mask_h = jnp.broadcast_to(occ_hi[:, :, None], (R // 128, 128, F))
    m2 = jnp.concatenate([mask_l, mask_h], axis=-1)
    wz = jnp.where(m2, w3, 0).reshape(R, C2)

    # enc_in 1x1: one MXU dot on the resident window.
    enc = (
        jnp.dot(wz, w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[0]
    ).astype(xpad_ref.dtype)

    x0 = g * XW
    co2 = ebuf.shape[-1]
    ebuf[...] = enc.reshape(XW, T, Y, co2)
    enc_dma = pltpu.make_async_copy(
        ebuf,
        xpad_ref.at[pl.ds(x0 + 1, XW), pl.ds(1, T), pl.ds(HY, Y)],
        sems.at[0],
    )
    enc_dma.start()

    # Stage mask slab: zero borders + rounding, interior from occupancy.
    mbuf[...] = jnp.zeros(mbuf.shape, jnp.int8)
    mbuf[:, 1 : T + 1, HY : HY + Y, :] = (
        m2.astype(jnp.int8).reshape(R, C2).reshape(XW, T, Y, C2)
    )
    m_dma = pltpu.make_async_copy(
        mbuf, m8_ref.at[pl.ds(x0 + 1, XW)], sems.at[1]
    )
    m_dma.start()

    enc_dma.wait()
    m_dma.wait()
    occ_dma.wait()

    # x borders of the mask volume (the chain's halo reads trust them).
    @pl.when(jnp.logical_or(g == 0, g == NW - 1))
    def _():
        zbuf[...] = jnp.zeros(zbuf.shape, jnp.int8)
        xb = jnp.where(g == 0, 0, NW * XW + 1)
        zdma = pltpu.make_async_copy(
            zbuf, m8_ref.at[pl.ds(xb, 1)], sems.at[3]
        )
        zdma.start()
        zdma.wait()


@functools.partial(
    jax.jit, static_argnames=("X", "T", "Y", "Ypad", "neg")
)
def _featurizer_call(keys, starts, fs, wbd, b2, X, T, Y, Ypad, neg):
    P, F = fs.shape
    C2 = 2 * F
    R = XW * T * Y
    NW = X // XW
    cd = fs.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NW,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sorted features
            pl.BlockSpec(memory_space=pltpu.VMEM),   # enc_in weight
            pl.BlockSpec(memory_space=pltpu.VMEM),   # enc_in bias
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, C2), cd),
            pltpu.VMEM((XW, T, Y, C2), cd),
            pltpu.VMEM((XW, T + 2, Ypad, C2), jnp.int8),
            pltpu.VMEM((1, T + 2, Ypad, C2), jnp.int8),
            pltpu.VMEM((2, R // 128, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    def kernel(keys_ref, starts_ref, f_ref, w_ref, b_ref,
               xpad_ref, m8_ref, occ_ref, win, ebuf, mbuf, zbuf, obuf,
               sems):
        _featurizer_kernel(
            keys_ref, starts_ref, f_ref, w_ref, b_ref,
            xpad_ref, m8_ref, occ_ref, win, ebuf, mbuf, zbuf, obuf, sems,
            T=T, Y=Y, Ypad=Ypad, NW=NW, neg=neg,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((X + 2, T + 2, Ypad, C2), cd),
            jax.ShapeDtypeStruct((X + 2, T + 2, Ypad, C2), jnp.int8),
            jax.ShapeDtypeStruct((2, NW, R // 128, 128), jnp.int8),
        ],
        compiler_params=_compiler_params(),
    )(keys, starts, fs, wbd, b2)


def featurizer_fused(
    f: jnp.ndarray,           # [P, F] point MLP features
    rel: jnp.ndarray,         # [P, 3] in-box voxel coords (x, y, z)
    in_box: jnp.ndarray,      # [P] bool valid-and-inside
    wbd: jnp.ndarray,         # [2F, 2C] enc_in blockdiag weight
    b2: jnp.ndarray,          # [2C] f32 enc_in bias (both slots)
    extent: Tuple[int, int, int],   # (ex, ey, ez) working box
    yt: int,                  # enc_s1 plan's y rounding
    neg: float,
    compute_dtype,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(xpad, m8, occ): the enc_s1 chain input (padded, borders garbage),
    its int8 stage mask (borders zero), and the logical z-pair occupancy
    as ``occ[slot, x, t, y]`` bool.

    Requires S == 1, z-packing, ``ex % 8 == 0``.  ``wbd``/``b2`` come
    from ``blockdiag2_weight`` exactly like the XLA enc_in path.
    """
    ex, ey, ez = extent
    T = ez // 2
    assert ex % XW == 0, (extent,)
    ncells = ex * T * ey
    cd = jnp.dtype(compute_dtype)

    cell = (rel[:, 0] * T + rel[:, 2] // 2) * ey + rel[:, 1]
    slot = rel[:, 2] % 2
    key = jnp.where(in_box, slot * ncells + cell, 2 * ncells).astype(
        jnp.int32
    )
    order = jnp.argsort(key)
    ks = key[order]
    fs = jnp.take(f, order, axis=0).astype(cd)

    NW = ex // XW
    R = XW * T * ey
    bounds = jnp.concatenate(
        [
            jnp.arange(NW, dtype=jnp.int32) * R,
            ncells + jnp.arange(NW, dtype=jnp.int32) * R,
            jnp.asarray([2 * ncells], jnp.int32),
        ]
    )
    starts = jnp.searchsorted(ks, bounds).astype(jnp.int32)

    Ypad = ey + (-ey) % yt + 2 * HY
    from pasco_tpu.ops.pallas_batch import cached_sequential_vmap

    xpad, m8, occ = cached_sequential_vmap(
        _featurizer_call, ex, T, ey, Ypad, float(neg)
    )(ks, starts, fs, wbd.astype(cd),
      b2.astype(jnp.float32).reshape(1, -1))
    # occ[slot, w, r, l] -> [slot, x, t, y] (cell = ((x*T + t)*ey + y))
    occ_l = occ.reshape(2, ex, T, ey) != 0
    return xpad, m8, occ_l
