"""Stream-compact extraction: replace per-row payload gathers with MXU dots.

Profiling the flagship forward showed the scale-1 extraction gathers are
*per-row latency bound* on this chip (~36 ns/row regardless of width):
the dec-s1 sem-payload gather alone was 23.9 ms/scan, plus a 6.1 ms
XLA while-loop transposing the [N, 40] payload into the gather's
preferred layout (``fused_computation.25`` / ``dynamic-update-slice.419``
in the HLO).  Mirrors the reference's sparse ``features_at_coordinates``
extraction (``pasco/models/decoder_v3.py`` prune/extract sites), but
TPU-native: no random row traffic at all.

Scheme
------
The volume is streamed in blocks of 128 consecutive packed rows
(= 256 logical cells, z-pair slots).  Per active block, ONE contiguous
DMA fetches the payload tile; compaction ranks come from exclusive
cumsums computed as dots with a lower-triangular constant; the
gather+compact itself is two one-hot MXU dots ([256,128] @ [128,Lp]);
a VPU lane-select folds the z-slot halves.  Each block writes a fixed
256-row window at its (16-aligned) output offset — the window's garbage
tail is overwritten by the next block because the TPU grid executes
sequentially, so outputs land exactly compacted.

Output order is (packed-row, slot) instead of ``compact_src``'s
(logical z)-order; extraction order is free — every consumer is
coords/mask-driven.  Per-cell bookkeeping (source row, slot, validity)
rides the same dots as three extra payload lanes, so the XLA side
computes coords with zero per-cell gathers.

Blocks' kept-cell counts are padded to a multiple of 16 (the bf16
sublane tile, so window offsets stay DMA-legal): the pad rows are
all-zero (their one-hot rows are zero) and masked invalid.  Worst-case
capacity waste is 15 rows per active block (~7% at flagship shapes);
``capacity_pad`` reports the slack the output buffer carries.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - import guard mirrors pallas_conv
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

BLOCK_ROWS = 128                  # packed rows per block
BLOCK_CELLS = 2 * BLOCK_ROWS      # z-pair slots per block
_PAD16 = 16                       # output-offset alignment (bf16 sublane)


def _pad128(v: int) -> int:
    return -(-v // 128) * 128


def extract_plan(
    keep: jnp.ndarray,            # [X, 2T, Y] bool logical keeps
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(block_ids, r16, n_active, blk_of_row) for the stream kernel.

    ``block_ids[g]``/``r16[g]``: the g-th active block's index and its
    16-aligned output offset (clamped so the 256-row window stays inside
    the padded output).  ``blk_of_row[j]``: covering active-slot index of
    output row j (for coords reconstruction).
    """
    X, Z, Y = keep.shape
    lo = keep[:, 0::2].reshape(-1)
    hi = keep[:, 1::2].reshape(-1)
    n_rows = lo.shape[0]
    nblk = -(-n_rows // BLOCK_ROWS)
    pad = nblk * BLOCK_ROWS - n_rows
    if pad:
        lo = jnp.pad(lo, (0, pad))
        hi = jnp.pad(hi, (0, pad))
    m_b = (
        lo.reshape(nblk, BLOCK_ROWS).sum(axis=1, dtype=jnp.int32)
        + hi.reshape(nblk, BLOCK_ROWS).sum(axis=1, dtype=jnp.int32)
    )
    m16 = ((m_b + _PAD16 - 1) // _PAD16) * _PAD16
    occ = m_b > 0
    coff = jnp.cumsum(jnp.where(occ, m16, 0))
    r16_all = coff - jnp.where(occ, m16, 0)             # exclusive
    live = occ & (r16_all < capacity)
    # compact active blocks to the front (same scatter-rank pattern as
    # dense_ops.compact_src).
    rank = jnp.cumsum(live.astype(jnp.int32)) - 1
    dest = jnp.where(live, rank, nblk)
    block_ids = (
        jnp.zeros((nblk + 1,), jnp.int32)
        .at[dest].set(jnp.arange(nblk, dtype=jnp.int32), mode="drop")
    )[:nblk]
    r16 = (
        jnp.zeros((nblk + 1,), jnp.int32)
        .at[dest].set(r16_all.astype(jnp.int32), mode="drop")
    )[:nblk]
    n_active = (rank[-1] + 1).reshape(1).astype(jnp.int32)

    # covering active slot of each output row: +1 marks at each active
    # block's r16, cumsum-1 (rows before the first mark get slot 0 and
    # are invalidated by the kernel's zero indicator lane anyway).
    cap_pad = capacity + BLOCK_CELLS
    marks = (
        jnp.zeros((cap_pad + 1,), jnp.int32)
        .at[jnp.where(live, r16_all, cap_pad)].add(1, mode="drop")
    )
    blk_of_row = jnp.cumsum(marks[:capacity]) - 1
    return block_ids, r16, n_active, blk_of_row


def _extract_kernel(
    ids_ref,                  # SMEM [nblk] active block ids
    r16_ref,                  # SMEM [nblk] output offsets
    n_ref,                    # SMEM [1]
    pay_ref,                  # HBM [n_rows, L] payload (+2 keep lanes)
    lt_ref,                   # VMEM [BLOCK_ROWS, BLOCK_ROWS] strict lower tri
    out_ref,                  # HBM [cap_pad, Lout]
    in_buf,                   # VMEM [2, BLOCK_ROWS, L]
    out_buf,                  # VMEM [BLOCK_CELLS, Lout]
    in_sems, out_sem,
    *,
    e2: int,                  # payload lanes (keep lanes at e2, e2+1)
    lout: int,
):
    g = pl.program_id(0)
    n_act = n_ref[0]

    def in_dma(slot, idx):
        return pltpu.make_async_copy(
            pay_ref.at[pl.ds(ids_ref[idx] * BLOCK_ROWS, BLOCK_ROWS)],
            in_buf.at[slot],
            in_sems.at[slot],
        )

    @pl.when(g == 0)
    def _():
        @pl.when(n_act > 0)
        def _():
            in_dma(0, 0).start()

    @pl.when(g < n_act)
    def _():
        slot = jax.lax.rem(g, 2)
        in_dma(slot, g).wait()

        @pl.when(g + 1 < n_act)
        def _():
            in_dma(1 - slot, g + 1).start()

        blk = in_buf[slot]                       # [128, L]
        e = e2 // 2
        f32 = jnp.float32
        # bf16 comparisons are unsupported on this target ("Target does
        # not support this comparison") — compare in f32.
        bit_lo = (blk[:, e2 : e2 + 1].astype(f32) > 0).astype(f32)  # [128, 1]
        bit_hi = (blk[:, e2 + 1 : e2 + 2].astype(f32) > 0).astype(f32)
        row_n = (bit_lo + bit_hi).astype(jnp.bfloat16)
        # exclusive per-row prefix over (lo+hi): one strict-LT dot.
        pref = jnp.dot(
            lt_ref[...], row_n, preferred_element_type=f32
        )                                        # [128, 1] f32
        rank_lo = pref
        rank_hi = pref + bit_lo
        # int32 iota + cast: Mosaic's on-chip tpu.iota must be integer.
        o = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_CELLS, BLOCK_ROWS), 0
        ).astype(f32)
        oh_lo = jnp.where(
            (o == rank_lo[:, 0][None, :]) & (bit_lo[:, 0][None, :] > 0),
            1.0, 0.0,
        ).astype(jnp.bfloat16)
        oh_hi = jnp.where(
            (o == rank_hi[:, 0][None, :]) & (bit_hi[:, 0][None, :] > 0),
            1.0, 0.0,
        ).astype(jnp.bfloat16)
        # Per-slot RHS: [kept-masked payload half | local row | slot
        # one-hot] — the bookkeeping columns ride the SAME two dots.
        # Kept-masking matters: non-kept rows may hold garbage (chain
        # buffers are uninitialised outside active tiles) and
        # 0 * NaN = NaN in the dot.
        r_iota = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_ROWS, 1), 0
        ).astype(jnp.bfloat16)
        ones = jnp.ones((BLOCK_ROWS, 1), jnp.bfloat16)
        zeros = jnp.zeros((BLOCK_ROWS, 1), jnp.bfloat16)
        blk_lo = jnp.concatenate(
            [
                jnp.where(bit_lo > 0, blk[:, :e], 0),
                r_iota, ones, zeros,
            ],
            axis=-1,
        )
        blk_hi = jnp.concatenate(
            [
                jnp.where(bit_hi > 0, blk[:, e:e2], 0),
                r_iota, zeros, ones,
            ],
            axis=-1,
        )
        t = jnp.dot(
            oh_lo, blk_lo, preferred_element_type=f32
        ) + jnp.dot(oh_hi, blk_hi, preferred_element_type=f32)
        # output lanes keep t's order: [E vals | local row | is_lo | is_hi]
        # The output ref is [cap16, 16, lout] (leading dim untiled) so the
        # dynamic window offset needs no tile-divisibility proof; r16 is
        # 16-aligned by construction (extract_plan), so r16/16 is exact.
        out_buf[...] = (
            jnp.pad(t, ((0, 0), (0, lout - (e + 3))))
            .astype(out_buf.dtype)
            .reshape(BLOCK_CELLS // 16, 16, lout)
        )
        copy = pltpu.make_async_copy(
            out_buf,
            out_ref.at[pl.ds(r16_ref[g] // 16, BLOCK_CELLS // 16)],
            out_sem,
        )
        copy.start()
        copy.wait()


def _extract_kernel_sepk(
    ids_ref, r16_ref, n_ref,
    pay_ref,                  # HBM [n_rows, e2] payload (native lanes)
    k_ref,                    # HBM [nblk, 2, 128] bf16 keep bits (lo, hi)
    ut_ref,                   # VMEM [128, 128] strict upper triangular
    out_ref,                  # HBM [cap16, 16, lout]
    in_buf,                   # VMEM [2, BLOCK_ROWS, e2]
    k_buf,                    # VMEM [2, 1, 2, 128]
    out_buf,                  # VMEM [BLOCK_CELLS//16, 16, lout]
    in_sems, k_sems, out_sem,
    *,
    e2: int,
    lout: int,
):
    """Separate-keep variant: the keep bits arrive as a tiny side array
    instead of extra payload lanes, so 128-aligned payloads (the s1/s2
    feature volumes) are DMAed straight from the chain buffers — the
    [payload | keep] lane-concat this replaces was a ~1 GB HBM pass per
    scale-1 extraction.  Ranks are computed in ROW form (keep bits on
    lanes): the exclusive prefix is one strict-UT dot on the right, and
    the per-sublane bit columns (payload NaN-masking needs them) come
    from a diagonal mask + lane reduction — a cheap in-VMEM transpose."""
    g = pl.program_id(0)
    n_act = n_ref[0]

    def in_dma(slot, idx):
        return pltpu.make_async_copy(
            pay_ref.at[pl.ds(ids_ref[idx] * BLOCK_ROWS, BLOCK_ROWS)],
            in_buf.at[slot],
            in_sems.at[slot],
        )

    def k_dma(slot, idx):
        return pltpu.make_async_copy(
            k_ref.at[pl.ds(ids_ref[idx], 1)],
            k_buf.at[slot],
            k_sems.at[slot],
        )

    @pl.when(g == 0)
    def _():
        @pl.when(n_act > 0)
        def _():
            in_dma(0, 0).start()
            k_dma(0, 0).start()

    @pl.when(g < n_act)
    def _():
        slot = jax.lax.rem(g, 2)
        in_dma(slot, g).wait()
        k_dma(slot, g).wait()

        @pl.when(g + 1 < n_act)
        def _():
            in_dma(1 - slot, g + 1).start()
            k_dma(1 - slot, g + 1).start()

        blk = in_buf[slot]                       # [128, e2]
        kr = k_buf[slot][0]                      # [2, 128]
        e = e2 // 2
        f32 = jnp.float32
        klo = (kr[0:1].astype(f32) > 0).astype(f32)     # [1, 128]
        khi = (kr[1:2].astype(f32) > 0).astype(f32)
        rown = (klo + khi).astype(jnp.bfloat16)
        # exclusive prefix over source rows (rows live on LANES here)
        pref = jnp.dot(
            rown, ut_ref[...], preferred_element_type=f32
        )                                        # [1, 128]
        rank_lo = pref
        rank_hi = pref + klo
        o = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_CELLS, BLOCK_ROWS), 0
        ).astype(f32)
        oh_lo = jnp.where(
            (o == rank_lo) & (klo > 0), 1.0, 0.0
        ).astype(jnp.bfloat16)
        oh_hi = jnp.where(
            (o == rank_hi) & (khi > 0), 1.0, 0.0
        ).astype(jnp.bfloat16)
        # bit COLUMNS (sublane-form) for NaN-masking the payload halves:
        # diagonal select + lane reduce == transpose of the [1, 128] rows.
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_ROWS, BLOCK_ROWS), 0
        )
        jj = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_ROWS, BLOCK_ROWS), 1
        )
        diag = ii == jj
        bcol_lo = jnp.sum(
            jnp.where(diag, jnp.broadcast_to(klo, diag.shape), 0.0),
            axis=1, keepdims=True,
        )
        bcol_hi = jnp.sum(
            jnp.where(diag, jnp.broadcast_to(khi, diag.shape), 0.0),
            axis=1, keepdims=True,
        )
        r_iota = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_ROWS, 1), 0
        ).astype(jnp.bfloat16)
        ones = jnp.ones((BLOCK_ROWS, 1), jnp.bfloat16)
        zeros = jnp.zeros((BLOCK_ROWS, 1), jnp.bfloat16)
        blk_lo = jnp.concatenate(
            [jnp.where(bcol_lo > 0, blk[:, :e], 0), r_iota, ones, zeros],
            axis=-1,
        )
        blk_hi = jnp.concatenate(
            [jnp.where(bcol_hi > 0, blk[:, e:e2], 0), r_iota, zeros, ones],
            axis=-1,
        )
        t = jnp.dot(
            oh_lo, blk_lo, preferred_element_type=f32
        ) + jnp.dot(oh_hi, blk_hi, preferred_element_type=f32)
        out_buf[...] = (
            jnp.pad(t, ((0, 0), (0, lout - (e + 3))))
            .astype(out_buf.dtype)
            .reshape(BLOCK_CELLS // 16, 16, lout)
        )
        copy = pltpu.make_async_copy(
            out_buf,
            out_ref.at[pl.ds(r16_ref[g] // 16, BLOCK_CELLS // 16)],
            out_sem,
        )
        copy.start()
        copy.wait()


@functools.partial(jax.jit, static_argnames=("e2", "capacity"))
def _extract_call_sepk(payload, krows, block_ids, r16, n_active, e2,
                       capacity):
    """Separate-keep dispatch: ``payload`` [n_rows, e2] with e2 % 128 == 0
    (DMAed at native lanes), ``krows`` [nblk, 2, 128] bf16 keep bits."""
    nblk = block_ids.shape[0]
    e = e2 // 2
    lout = _pad128(e + 3)
    cap_pad = -(-(capacity + BLOCK_CELLS) // _PAD16) * _PAD16
    cap16 = cap_pad // _PAD16
    iu = jnp.triu(jnp.ones((BLOCK_ROWS, BLOCK_ROWS), jnp.bfloat16), 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # payload
            pl.BlockSpec(memory_space=pltpu.ANY),    # keep rows
            pl.BlockSpec(memory_space=pltpu.VMEM),   # UT constant
            pl.BlockSpec(memory_space=pltpu.ANY),    # donated zero output
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK_ROWS, e2), payload.dtype),
            pltpu.VMEM((2, 1, 2, 128), krows.dtype),
            pltpu.VMEM((BLOCK_CELLS // 16, 16, lout), payload.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(ids_ref, r16_ref, n_ref, pay_ref, k_ref, ut_ref, out_in_ref,
               out_ref, in_buf, k_buf, out_buf, in_sems, k_sems, out_sem):
        del out_in_ref
        _extract_kernel_sepk(
            ids_ref, r16_ref, n_ref, pay_ref, k_ref, ut_ref, out_ref,
            in_buf, k_buf, out_buf, in_sems, k_sems, out_sem,
            e2=e2, lout=lout,
        )

    out0 = jnp.zeros((cap16, _PAD16, lout), payload.dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # operand order: ids, r16, n_active, payload, krows, ut, out0
        input_output_aliases={6: 0},
        out_shape=jax.ShapeDtypeStruct((cap16, _PAD16, lout), payload.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_ids, r16, n_active, payload, krows, iu, out0)
    return out.reshape(cap_pad, lout)


@functools.partial(jax.jit, static_argnames=("e2", "capacity"))
def _extract_call(payload, block_ids, r16, n_active, e2, capacity):
    n_rows, L = payload.shape
    nblk = block_ids.shape[0]
    e = e2 // 2
    lout = _pad128(e + 3)
    # 16-row groups (output written as [cap16, 16, lout]; see kernel).
    cap_pad = -(-(capacity + BLOCK_CELLS) // _PAD16) * _PAD16
    cap16 = cap_pad // _PAD16
    lt = jnp.tril(jnp.ones((BLOCK_ROWS, BLOCK_ROWS), jnp.bfloat16), -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # payload
            pl.BlockSpec(memory_space=pltpu.VMEM),   # LT constant
            pl.BlockSpec(memory_space=pltpu.ANY),    # donated zero output
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK_ROWS, L), payload.dtype),
            pltpu.VMEM((BLOCK_CELLS // 16, 16, lout), payload.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(ids_ref, r16_ref, n_ref, pay_ref, lt_ref, out_in_ref,
               out_ref, in_buf, out_buf, in_sems, out_sem):
        del out_in_ref
        _extract_kernel(
            ids_ref, r16_ref, n_ref, pay_ref, lt_ref, out_ref,
            in_buf, out_buf, in_sems, out_sem, e2=e2, lout=lout,
        )

    # Rows the active blocks never write stay zero: indicator lane 0 ->
    # invalid, exactly like the one-hot pad rows.
    out0 = jnp.zeros((cap16, _PAD16, lout), payload.dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # operand order: ids, r16, n_active, payload, lt, out0
        input_output_aliases={5: 0},
        out_shape=jax.ShapeDtypeStruct((cap16, _PAD16, lout), payload.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_ids, r16, n_active, payload, lt, out0)
    return out.reshape(cap_pad, lout)


def stream_extract_z2(
    keep: jnp.ndarray,            # [X, 2T, Y] bool
    capacity: int,
    payload: jnp.ndarray,         # [X, T, Y, 2E] packed payload
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(vals [cap, E], src [cap] flat logical index, valid [cap], total).

    ``vals``/``src`` are in (packed-row, slot) order with interleaved
    invalid pad rows — consumers must treat ``valid`` as a general mask,
    not a prefix.  ``total`` counts kept cells (pre-capacity clamp).
    """
    X, T, Y, e2 = payload.shape
    e = e2 // 2
    Z = 2 * T
    n_rows = X * T * Y
    block_ids, r16, n_active, blk_of_row = extract_plan(keep, capacity)
    nblk = block_ids.shape[0]
    if e2 % 128 == 0 and n_rows == nblk * BLOCK_ROWS:
        # 128-aligned payloads DMA straight from the volume; the keep
        # bits ride a tiny [nblk, 2, 128] side array instead of two extra
        # payload lanes (the lane-concat below is a ~1 GB HBM pass at the
        # scale-1 feature extraction).
        krows = jnp.stack(
            [
                keep[:, 0::2].reshape(nblk, BLOCK_ROWS),
                keep[:, 1::2].reshape(nblk, BLOCK_ROWS),
            ],
            axis=1,
        ).astype(jnp.bfloat16)
        from pasco_tpu.ops.pallas_batch import cached_sequential_vmap

        out = cached_sequential_vmap(_extract_call_sepk, e2, capacity)(
            payload.reshape(n_rows, e2), krows, block_ids, r16, n_active
        )
    else:
        lo = keep[:, 0::2].reshape(n_rows, 1)
        hi = keep[:, 1::2].reshape(n_rows, 1)
        # Mosaic requires every memref slice's lane dim to be a multiple
        # of the 128-lane tile (HBM DMA slices AND the [2, 128, L] VMEM
        # scratch's slot slice), so the payload+keep lanes are zero-padded
        # to 128 here.  The padded bytes are physically present in the
        # (8, 128)-tiled layout either way, so the DMA moves no extra HBM
        # traffic.
        lane_pad = _pad128(e2 + 2) - (e2 + 2)
        pay = jnp.concatenate(
            [
                payload.reshape(n_rows, e2),
                lo.astype(payload.dtype),
                hi.astype(payload.dtype),
            ]
            + (
                [jnp.zeros((n_rows, lane_pad), payload.dtype)]
                if lane_pad
                else []
            ),
            axis=-1,
        )
        pad = nblk * BLOCK_ROWS - n_rows
        if pad:
            pay = jnp.pad(pay, ((0, pad), (0, 0)))
        from pasco_tpu.ops.pallas_batch import cached_sequential_vmap

        out = cached_sequential_vmap(_extract_call, e2, capacity)(
            pay, block_ids, r16, n_active
        )
    out = out[:capacity]
    # lanes: [E vals | local row | is_lo | is_hi] (+ tile padding)
    vals = out[:, :e]
    loc = out[:, e].astype(jnp.int32)
    slot = (out[:, e + 2] > 0).astype(jnp.int32)
    valid = (out[:, e + 1] + out[:, e + 2]) > 0
    # r16 here is indexed by ACTIVE slot (the kernel's g), matching
    # blk_of_row; block_ids maps back to the block index.
    a = jnp.clip(blk_of_row, 0, nblk - 1)
    prow = block_ids[a] * BLOCK_ROWS + loc
    sy = prow % Y
    st = (prow // Y) % T
    sx = prow // (Y * T)
    sz = 2 * st + slot
    src = (sx * Z + sz) * Y + sy
    total = (
        keep[:, 0::2].sum(dtype=jnp.int32) + keep[:, 1::2].sum(dtype=jnp.int32)
    )
    return vals, jnp.where(valid, src, 0), valid, total
