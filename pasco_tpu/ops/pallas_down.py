"""Fused encoder down step: strided conv + BN/leaky/BN/relu from the
padded chain buffer into the next stage's padded chain buffer.

The XLA form between two fused encoder chains runs: unpad + mask select
(for the down conv's benefit), the down conv's group relayout + matmul,
two BN elementwise passes, and the next stage's ``pad_stage`` — ~7-8
ms/scan of full-volume passes at enc_s2 + echoes at s4/s8.  This kernel
reads (8, 16)-output tiles straight from the producer chain's PADDED
buffer (input masking by the producer stage's int8 mask rides the
prologue, so the chain's uninitialised inactive tiles are never
trusted), does the stride-2 conv as ONE MXU dot against the grouped
weight, applies both inference BN affines + leaky/relu on the resident
tile, and writes the interior of the consumer chain's padded buffer
(its ``pad_stage`` disappears).  Mirrors the reference's strided
``MinkowskiConvolution`` + BN pairs in ``Encoder3DSepV2``
(``pasco/models/encoder_v2.py``), restructured for the MXU.

Inference-only, like the fused chain.  All flagship stage shapes
qualify (offsets stay 16-aligned because output y tiles are 16 rows =
32 input rows); stages whose chain buffers lane-fold keep the XLA form.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

XW = 8     # default output-tile x extent (input 16)
YT = 16    # output-tile y extent (input 32; y stays 16 so the padded
           # output writes keep their 16-row sublane alignment)


def down_plan(c2: int, co2: int, T: int) -> Tuple[int, bool]:
    """Pick ``(xw, double_buffer)`` so the kernel fits scoped VMEM.

    The Mosaic scoped-vmem accounting covers the declared scratch PLUS
    the kernel's live value stack (the masked tile, the grouped-relayout
    copies, the f32 accumulator) — at the flagship enc_s4 shape the
    naive (8, double-buffered) layout measured 19.46M > the 16M limit
    on-chip, so the ladder trades DMA/compute overlap for footprint
    exactly like ``pallas_conv.conv_plan``.
    """
    from pasco_tpu.ops.pallas_conv import _SCOPED_VMEM_BUDGET, _pad128

    # Mosaic lane-pads every VMEM buffer to 128 lanes, so the lane dims
    # (c2, co2, the grouped weight's 2co) must be padded in the estimate
    # too — conv_plan does the same (ADVICE r2: raw lane dims undercount
    # by up to 128/c2x for narrow-channel stages).
    c2x, co2x = _pad128(c2), _pad128(co2)
    T2 = T // 2
    for xw, db in (
        (8, True), (8, False), (4, True), (4, False), (2, False)
    ):
        tile_in = (2 * xw) * T * 32 * c2x * 2         # one bf16 in-slot
        inb = (2 if db else 1) * tile_in
        mb = inb // 2                                  # int8 mask mirror
        outb = xw * T2 * YT * co2x * 2
        acc = xw * T2 * YT * co2x * 4                  # f32 accumulator
                      # value stack: masked tile + grouped copies + temps
        interm = 3 * tile_in + 2 * outb + acc
        wkb = 8 * c2 * _pad128(co2) * 2
        total = inb + mb + interm + outb + wkb + 2**20
        if total <= _SCOPED_VMEM_BUDGET:
            return xw, db
    # The ladder has no budget-checked rung left: surface it instead of
    # silently compiling an over-budget (2, False) config (ADVICE r2).
    import warnings

    warnings.warn(
        f"down_plan: no (xw, db) config fits scoped VMEM for "
        f"(c2={c2}, co2={co2}, T={T}); falling back to (2, False) which "
        f"may exceed the budget",
        stacklevel=2,
    )
    return 2, False


def pack_down_weight(weight: jnp.ndarray, dtype) -> jnp.ndarray:
    """[8, Ci, Co] -> [(ix, it, iy, 2Ci), 2Co] grouped stride-2 weight
    (same math as ``dense_ops.down2_packed_to_packed``)."""
    ci, co = weight.shape[1], weight.shape[2]
    w3 = weight.reshape(2, 2, 2, ci, co)
    wk = jnp.zeros((2, 2, 2, 2 * ci, 2 * co), weight.dtype)
    for it in range(2):
        for pz in range(2):
            wk = wk.at[
                :, it, :, pz * ci : (pz + 1) * ci, it * co : (it + 1) * co
            ].set(w3[:, :, pz])
    return wk.reshape(8 * 2 * ci, 2 * co).astype(dtype)


def _group_tile(xt, T2, c2, xw=XW):
    """[2*xw, 2*T2, 32, c2] input tile -> [xw, T2, 16, 8*c2] grouped
    rows with lane order (ix, it, iy, c2).  ix/it interleaves live on
    untiled dims; the iy unzip is the one tiled-dim relayout."""
    v = xt.reshape(xw, 2, T2, 2, 16, 2, c2)
    v = v.transpose(0, 2, 4, 1, 3, 5, 6)
    return v.reshape(xw, T2, 16, 8 * c2)


def _down_kernel(
    ids_ref, n_ref,
    xp_ref,                   # HBM [X+2, T+2, Ypad_in, c2] producer chain
    m_ref,                    # HBM same-shape int8 producer stage mask
    wk_ref,                   # VMEM [8*c2, 2co]
    b_ref,                    # VMEM [1, 2co] f32
    aff_ref,                  # VMEM [4, 2co] f32: a1, c1, a2, c2
    out_ref,                  # HBM [X2+2, T2+2, Ypad_out, 2co]
    in_bufs,                  # VMEM [slots, 2*xw, T, 32, c2]
    m_bufs,                   # VMEM [slots, 2*xw, T, 32, c2] int8
    obuf,                     # VMEM [xw, T2, YT, 2co]
    in_sems, m_sems, out_sem,
    *,
    T: int, by: int, xw: int, db: bool,
):
    g = pl.program_id(0)
    n_act = n_ref[0]
    T2 = T // 2

    def dma(src, bufs, sems, slot, idx):
        tid = ids_ref[idx]
        return pltpu.make_async_copy(
            src.at[
                pl.ds(1 + (tid // by) * (2 * xw), 2 * xw), pl.ds(1, T),
                pl.ds(16 + (tid % by) * 32, 32),
            ],
            bufs.at[slot],
            sems.at[slot],
        )

    if db:
        @pl.when(g == 0)
        def _():
            @pl.when(n_act > 0)
            def _():
                dma(xp_ref, in_bufs, in_sems, 0, 0).start()
                dma(m_ref, m_bufs, m_sems, 0, 0).start()

    @pl.when(g < n_act)
    def _():
        tid = ids_ref[g]
        x0 = (tid // by) * xw
        y0 = (tid % by) * YT
        slot = jax.lax.rem(g, 2) if db else 0
        if not db:     # single-buffered: serial DMA per step
            dma(xp_ref, in_bufs, in_sems, 0, g).start()
            dma(m_ref, m_bufs, m_sems, 0, g).start()
        dma(xp_ref, in_bufs, in_sems, slot, g).wait()
        dma(m_ref, m_bufs, m_sems, slot, g).wait()

        if db:
            @pl.when(g + 1 < n_act)
            def _():
                dma(xp_ref, in_bufs, in_sems, 1 - slot, g + 1).start()
                dma(m_ref, m_bufs, m_sems, 1 - slot, g + 1).start()

        c2 = in_bufs.shape[-1]
        co2 = obuf.shape[-1]
        f32 = jnp.float32
        # Producer-chain buffers are uninitialised outside active tiles:
        # select by the stage mask (0 * NaN = NaN, so select not multiply).
        xt = jnp.where(m_bufs[slot] != 0, in_bufs[slot], 0)
        lhs = _group_tile(xt, T2, c2, xw).reshape(xw * T2 * YT, 8 * c2)
        acc = jnp.dot(
            lhs, wk_ref[...], preferred_element_type=f32
        ) + b_ref[0]
        a1, c1, a2, c2r = aff_ref[0], aff_ref[1], aff_ref[2], aff_ref[3]
        y = acc * a1 + c1
        y = jnp.where(y > 0, y, 0.01 * y)
        y = y * a2 + c2r
        y = jnp.maximum(y, 0)
        obuf[...] = y.reshape(xw, T2, YT, co2).astype(obuf.dtype)
        copy = pltpu.make_async_copy(
            obuf,
            out_ref.at[
                pl.ds(x0 + 1, xw), pl.ds(1, T2), pl.ds(16 + y0, YT)
            ],
            out_sem,
        )
        copy.start()
        copy.wait()


@functools.partial(jax.jit, static_argnames=("ypad_out", "xw", "db"))
def _down_call(xp, m8, wk, b2, aff, ids, n_active, ypad_out, xw, db):
    Xp, Tp, Ypad_in, c2 = xp.shape
    X, T = Xp - 2, Tp - 2
    X2, T2 = X // 2, T // 2
    co2 = wk.shape[-1]
    Y2 = (Ypad_in - 32)            # input interior incl. y rounding
    by = -(-(Y2 // 2) // YT)       # output y tiles (rounded up)
    slots = 2 if db else 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((X2 // xw) * by,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # chain buffer
            pl.BlockSpec(memory_space=pltpu.ANY),   # int8 stage mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # grouped weight
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # affines
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((slots, 2 * xw, T, 32, c2), xp.dtype),
            pltpu.VMEM((slots, 2 * xw, T, 32, c2), jnp.int8),
            pltpu.VMEM((xw, T2, YT, co2), xp.dtype),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(ids_ref, n_ref, xp_ref, m_ref, wk_ref, b_ref, aff_ref,
               out_ref, in_bufs, m_bufs, obuf, in_sems, m_sems, out_sem):
        _down_kernel(
            ids_ref, n_ref, xp_ref, m_ref, wk_ref, b_ref, aff_ref,
            out_ref, in_bufs, m_bufs, obuf, in_sems, m_sems, out_sem,
            T=T, by=by, xw=xw, db=db,
        )

    from pasco_tpu.ops.pallas_conv import _compiler_params

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (X2 + 2, T2 + 2, ypad_out, co2), xp.dtype
        ),
        compiler_params=_compiler_params(),
    )(ids, n_active, xp, m8, wk, b2, aff)


def down_padded_to_padded(
    xpad: jnp.ndarray,         # producer chain's padded buffer
    mask8: jnp.ndarray,        # producer stage's int8 mask (stage_mask8)
    new_occ_xy: jnp.ndarray,   # [X/2, Y/2] any-z occupancy of the new mask
    wd: jnp.ndarray,           # [8, Ci, Co]
    bd: jnp.ndarray,           # [Co]
    aff1: Tuple[jnp.ndarray, jnp.ndarray],   # bn1 (a, c) [2Co] f32
    aff2: Tuple[jnp.ndarray, jnp.ndarray],   # bn2 (a, c) [2Co] f32
    y_out: int,                # unpadded output Y extent
    y_round: int = 16,         # consumer chain's y rounding (plan yt)
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Padded next-chain input [X/2+2, T/2+2, y_out(+rounding)+32, 2Co].

    Cells outside the new mask hold garbage — every consumer (the next
    chain's prologue) masks; the next stage's ``stage_mask8``/actives are
    built from the new mask in XLA as before.  ``y_round`` must be the
    CONSUMER plan's ``yt`` so the output buffer matches its
    ``pad_stage`` rounding; rounding rows beyond the kernel's write
    range stay uninitialised (mask-dead for the consumer).
    """
    from pasco_tpu.ops.pallas_conv import active_tiles_xy

    co = wd.shape[-1]
    wk = pack_down_weight(wd, compute_dtype)
    b2 = jnp.concatenate([bd, bd]).astype(jnp.float32).reshape(1, 2 * co)
    aff = jnp.stack(
        [
            aff1[0].astype(jnp.float32), aff1[1].astype(jnp.float32),
            aff2[0].astype(jnp.float32), aff2[1].astype(jnp.float32),
        ]
    )
    # y_round is a 16-multiple, so this matches the consumer's pad_stage
    # shape exactly (and always covers the kernel's 16-row write tiles).
    ypad_out = y_out + (-y_out) % y_round + 32
    c2 = xpad.shape[-1]
    T = xpad.shape[1] - 2
    xw, db = down_plan(c2, 2 * co, T)
    # The kernel's y-tile count comes from the PRODUCER buffer's rounded
    # interior (Ypad_in - 32) / 2; pad the occupancy map to that extent so
    # the flat tile ids decode with the same ``by``.
    y2h = (xpad.shape[2] - 32) // 2
    occ = jnp.pad(
        new_occ_xy, ((0, 0), (0, y2h - new_occ_xy.shape[1]))
    )
    ids, n_active = active_tiles_xy(occ, xw, YT)
    from pasco_tpu.ops.pallas_batch import cached_sequential_vmap

    return cached_sequential_vmap(_down_call, ypad_out, xw, db)(
        xpad.astype(compute_dtype), mask8, wk, b2, aff, ids, n_active
    )
