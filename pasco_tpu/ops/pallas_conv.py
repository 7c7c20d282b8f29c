"""Block-sparse dense 3D convolution as a Pallas TPU kernel.

The dense-with-masks substrate wastes FLOPs on the empty majority of the
working box.  This kernel exploits *column* sparsity: the volume is tiled
into 8x8x(full-Z) columns (urban LiDAR scenes are z-dense where occupied,
so column occupancy tracks footprint occupancy); only columns containing
occupied voxels are visited.  Each grid step DMAs its column plus a
1-voxel x/y halo from the padded HBM volume into VMEM, accumulates the 27
shifted ``[8*8*Z, C] @ [C, D]`` MXU taps in f32, and DMAs the result back
— no scatters, no random gathers, dead columns cost nothing.

TPU tiling notes: x/y are leading (unconstrained) dims so their halo
slices are free-form; z is the sublane dim, so z taps use ``pltpu.roll``
plus an offset-0 aligned slice, and the z extent is padded to a multiple
of 8.  Active column offsets arrive via scalar prefetch; the list is
padded to a static capacity and surplus programs are skipped.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8  # x/y tile


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def _kernel(
    ids_ref,                # SMEM [B_cap] flat column id
    n_active_ref,           # SMEM [1]
    xp_ref,                 # HBM [X+2, Y+2, Zp, C] padded input
    w_ref,                  # VMEM [27, C, D]
    out_ref,                # HBM [X, Y, Z, D]
    in_buf,                 # VMEM [BLOCK+2, BLOCK+2, Zp, C]
    out_buf,                # VMEM [BLOCK, BLOCK, Z, D]
    in_sem,
    out_sem,
    *,
    z_out: int,
    by: int,
):
    b = pl.program_id(0)

    @pl.when(b < n_active_ref[0])
    def _():
        cid = ids_ref[b]
        ox = (cid // by) * BLOCK
        oy = (cid % by) * BLOCK
        h = BLOCK + 2
        copy_in = pltpu.make_async_copy(
            xp_ref.at[pl.ds(ox, h), pl.ds(oy, h)],
            in_buf,
            in_sem,
        )
        copy_in.start()
        copy_in.wait()

        c = in_buf.shape[-1]
        d = out_buf.shape[-1]
        n = BLOCK * BLOCK * z_out
        acc = jnp.zeros((n, d), jnp.float32)
        # Tap order matches kernel_offsets(3): x-major, z fastest.
        for k in range(27):
            dz = k % 3
            dy = (k // 3) % 3
            dx = k // 9
            sl = in_buf[dx : dx + BLOCK, dy : dy + BLOCK]
            if dz:
                # Left-roll by dz expressed as a (non-negative) right-roll.
                sl = pltpu.roll(sl, in_buf.shape[2] - dz, axis=2)
            tap = sl[:, :, 0:z_out, :].reshape(n, c)
            acc = acc + jnp.dot(
                tap, w_ref[k], preferred_element_type=jnp.float32
            )
        out_buf[...] = acc.reshape(BLOCK, BLOCK, z_out, d).astype(
            out_buf.dtype
        )

        copy_out = pltpu.make_async_copy(
            out_buf,
            out_ref.at[pl.ds(ox, BLOCK), pl.ds(oy, BLOCK)],
            out_sem,
        )
        copy_out.start()
        copy_out.wait()


def active_columns(
    mask: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Origins of occupied 8x8 columns, padded to ``capacity``."""
    X, Y, Z = mask.shape
    bx, by = X // BLOCK, Y // BLOCK
    occ = mask.reshape(bx, BLOCK, by, BLOCK, Z).any(axis=(1, 3, 4))
    occ_f = occ.reshape(-1)
    new_pos = jnp.cumsum(occ_f.astype(jnp.int32)) - 1
    total = new_pos[-1] + 1
    dest = jnp.where(occ_f & (new_pos < capacity), new_pos, capacity)
    src = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[dest].set(jnp.arange(occ_f.shape[0], dtype=jnp.int32), mode="drop")
    )[:capacity]
    n_active = jnp.minimum(total, capacity).reshape(1)
    return src.astype(jnp.int32), n_active.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_capacity",))
def _block_conv_call(x, weight, ids, n_active, block_capacity):
    # Kernel buffers are f32: Mosaic's sublane rotate (the z-tap shift)
    # only supports 32-bit data.  Channels pad to the 128-lane tile (DMA
    # slices must be lane-aligned; the MXU runs 128-wide regardless).
    x = x.astype(jnp.float32)
    weight = weight.astype(jnp.float32)
    X, Y, Z, c = x.shape
    d = weight.shape[-1]
    cpad = -(-c // 128) * 128
    dpad = -(-d // 128) * 128
    zp = _round8(Z + 2)
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, zp - Z - 1), (0, cpad - c)))
    weight = jnp.pad(weight, ((0, 0), (0, cpad - c), (0, dpad - d)))
    out0 = jnp.zeros((X, Y, Z, dpad), x.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(block_capacity,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.ANY),   # donated zero output
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((BLOCK + 2, BLOCK + 2, zp, cpad), x.dtype),
            pltpu.VMEM((BLOCK, BLOCK, Z, dpad), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    by = Y // BLOCK

    def kernel(ids_ref, n_active_ref, xp_ref, w_ref, out_in_ref, out_ref,
               in_buf, out_buf, in_sem, out_sem):
        _kernel(ids_ref, n_active_ref, xp_ref, w_ref, out_ref,
                in_buf, out_buf, in_sem, out_sem, z_out=Z, by=by)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, dpad), x.dtype),
        input_output_aliases={4: 0},  # 2 prefetch + xp + w, then out0
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, n_active, xp, weight, out0)
    return out[..., :d]


# ---------------------------------------------------------------------------
# Block-sparse conv over z-pair-PACKED volumes ([X, T, Y, 2C], bf16)
#
# The packed layout puts z-pairs in lanes and Y in sublanes, so inside a
# VMEM block the x and t axes are free dims: x-shifts and the z(-pair)
# window taps are plain slices (no pltpu.roll, hence no f32 restriction —
# this kernel runs bf16 on the MXU, unlike :func:`block_sparse_conv3`).
# The remaining y-shifts are handled by DMAing the tile plus a full
# y-tile of halo from HBM; each dy tap is a VMEM-local sublane shift.
#
# Two tap formulations, chosen per stage by :func:`conv_plan`:
#
#   * ``slot_split=False`` (per-slot channels not 128-aligned, the s1
#     stages): 6 dots per tile — 3 fully-live at=0 window dots
#     ``[n, 3*2Ci] @ [3*2Ci, 2Co]`` plus 3 combined neighbour-window dots
#     against a per-dy ``[prev-pair HI | next-pair LO]`` lane buffer with
#     a block-diagonal weight (:func:`pm_tap_weights`) — 4/3x the logical
#     27-tap MACs (the neighbour dot is half dead), vs 2x for the naive
#     9-dot t-banded form.  Thinner dots can't do better here: with
#     Co < 128 they'd pad their output lanes to the 128 tile anyway.
#   * ``slot_split=True`` (per-slot channels a multiple of 128, the s2/s4
#     stages): the shift buffer is built as separate lo/hi slot halves
#     (lane slices at Ci alignment — legal only when Ci % 128 == 0), the
#     at=0 window uses two half-K dots ``[n, 3Ci] @ [3Ci, 2Co]`` (all 4
#     slot blocks live -> zero waste) and the at=+-1 windows use one
#     quarter dot ``[n, 3Ci] @ [3Ci, Co]`` each (their single live
#     block).  Total MACs drop to exactly the logical 27-tap count (2x
#     fewer than the dense form) and weight VMEM halves — which is also
#     what keeps the 512-lane s4 stage inside the 16 MB scoped-VMEM
#     limit (the dense-form packed weight alone is 14.2 MB there).
#
# :func:`conv_plan` additionally picks the x tile width and whether the
# input DMA is double-buffered so total kernel VMEM fits the scoped
# limit with headroom.
# ---------------------------------------------------------------------------


def packed_tap_weight(weight: jnp.ndarray) -> jnp.ndarray:
    """[27, Ci, Co] (z-fastest taps) -> [3(at), 3(ax), 3(ay), 2Ci, 2Co].

    Output slot oz of packed cell t draws logical tap ``dz = 2*at + pz -
    oz`` from input slot pz of packed cell t+at; blocks outside
    ``|dz| <= 1`` are zero (same convention as
    :func:`pasco_tpu.ops.dense_ops.packed2_conv_weight`).
    """
    ci, co = weight.shape[1], weight.shape[2]
    w3 = weight.reshape(3, 3, 3, ci, co)        # [dx, dy, dz+1, ci, co]
    wp = jnp.zeros((3, 3, 3, 2 * ci, 2 * co), weight.dtype)
    for at in (-1, 0, 1):
        for pz in range(2):
            for oz in range(2):
                dz = 2 * at + pz - oz
                if -1 <= dz <= 1:
                    wp = wp.at[
                        at + 1, :, :,
                        pz * ci : (pz + 1) * ci,
                        oz * co : (oz + 1) * co,
                    ].set(w3[:, :, dz + 1])
    return wp


def split_tap_weights(weight: jnp.ndarray):
    """[27, Ci, Co] -> the slot-split tap blocks (see module docstring).

    Returns ``(w0lo, w0hi, wm, wp)``:

    * ``w0lo [3(ax), 3(ay)*Ci, 2Co]`` — at=0 window, input slot LO rows:
      oz=0 cols get dz=0 taps, oz=1 cols get dz=-1 taps.
    * ``w0hi`` — at=0 window, input slot HI rows: oz=0 <- dz=+1,
      oz=1 <- dz=0.
    * ``wm [3, 3*Ci, Co]`` — at=-1 window's single live block
      (input HI -> output LO via dz=-1).
    * ``wp [3, 3*Ci, Co]`` — at=+1 window's single live block
      (input LO -> output HI via dz=+1).

    Row layout is the dy-lane-concat of single-slot Ci lanes, matching
    the kernel's per-slot shift buffers.
    """
    ci, co = weight.shape[1], weight.shape[2]
    w3 = weight.reshape(3, 3, 3, ci, co)        # [dx, dy, dz+1, ci, co]
    w0lo = jnp.stack(
        [
            jnp.concatenate([w3[:, dy, 1], w3[:, dy, 0]], axis=-1)
            for dy in range(3)
        ],
        axis=1,
    ).reshape(3, 3 * ci, 2 * co)
    w0hi = jnp.stack(
        [
            jnp.concatenate([w3[:, dy, 2], w3[:, dy, 1]], axis=-1)
            for dy in range(3)
        ],
        axis=1,
    ).reshape(3, 3 * ci, 2 * co)
    wm = w3[:, :, 0].reshape(3, 3 * ci, co)
    wp = w3[:, :, 2].reshape(3, 3 * ci, co)
    return w0lo, w0hi, wm, wp


def pm_tap_weights(weight: jnp.ndarray):
    """[27, Ci, Co] -> the combined-window tap blocks for the non-split
    formulation: ``(w0, wpm)``, each ``[3(ax), 3(ay)*2Ci, 2Co]``.

    * ``w0`` — the at=0 (same z-pair) window.  All four (slot, oz) blocks
      are live: per dy the [2Ci, 2Co] block is
      ``[[dz0, dz-1], [dz+1, dz0]]`` (rows = input lo|hi, cols = out
      lo|hi) — zero wasted MACs.
    * ``wpm`` — ONE dot covering both neighbour windows, fed by the
      kernel's combined buffer whose per-dy lanes hold
      ``[prev-pair HI | next-pair LO]`` (the only live slots of the at=-1
      / at=+1 windows).  Per dy the block is block-diagonal
      ``[[dz-1, 0], [0, dz+1]]`` — 2x fewer MACs than giving each
      neighbour window its own dense [3*2Ci, 2Co] dot, which brings the
      formulation's total waste from 2x down to 4/3x of the logical
      27-tap count.
    """
    ci, co = weight.shape[1], weight.shape[2]
    w3 = weight.reshape(3, 3, 3, ci, co)        # [dx, dy, dz+1, ci, co]
    z = jnp.zeros((3, ci, co), weight.dtype)
    w0 = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.concatenate([w3[:, dy, 1], w3[:, dy, 0]], axis=-1),
                    jnp.concatenate([w3[:, dy, 2], w3[:, dy, 1]], axis=-1),
                ],
                axis=1,
            )                                    # [3ax, 2ci, 2co]
            for dy in range(3)
        ],
        axis=1,
    ).reshape(3, 6 * ci, 2 * co)
    wpm = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.concatenate([w3[:, dy, 0], z], axis=-1),
                    jnp.concatenate([z, w3[:, dy, 2]], axis=-1),
                ],
                axis=1,
            )
            for dy in range(3)
        ],
        axis=1,
    ).reshape(3, 6 * ci, 2 * co)
    return w0, wpm


# Scoped-VMEM budget for one packed-kernel program.  The TPU compiler's
# DEFAULT scoped-vmem limit is 16 MB, but Mosaic accepts a per-kernel
# override (``CompilerParams.vmem_limit_bytes``) up to the physical VMEM
# (128 MB on v5e).  Every kernel in this family passes
# :data:`_VMEM_LIMIT_BYTES`; the plan budget leaves headroom for Mosaic's
# value-stack temporaries the byte models underestimate.
_SCOPED_VMEM_BUDGET = 60 * 2**20
_VMEM_LIMIT_BYTES = 100 * 2**20

# Fixed y-halo rows per side of a padded chain buffer.  The y (sublane)
# dim only supports tile-granular HBM slices, so the halo is one 16-row
# sublane tile per side regardless of the plan's y-tile extent ``yt`` —
# the wide DMA reads ``yt + 2*HY`` rows for ``yt`` produced.  Larger
# ``yt`` therefore directly cuts the y over-read (16 -> 3x, 64 -> 1.5x),
# which is what lets the fused convs beat the round-4 DMA wall.
HY = 16


def _compiler_params():
    return pltpu.CompilerParams(
        has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT_BYTES
    )


def _pad128(v: int) -> int:
    return -(-v // 128) * 128


def lane_fold(ci2: int, co2: int, t_out: int) -> int:
    """HBM lane-fold factor for a packed-conv stage.

    Narrow stages (2Ci < 128 lanes) get their HBM buffers lane-PADDED to
    the 128 tile by Mosaic — a [.., 32]-lane bf16 chain volume physically
    stores (and every tile DMA moves) 4x its logical bytes (measured: the
    s1 memref compiles as ``[.., 384, 128] bf16``).  Folding ``p`` z-pair
    rows into those otherwise-dead lanes (t = p*(t'-1) + q for lane block
    q) makes the DMA move useful data only; the kernel unpacks to the
    z-pair compute layout in VMEM (free-dim lane-slice copies, the same
    class of op as the combined-window buffer build).
    """
    if ci2 != co2 or ci2 >= 128 or 128 % ci2 != 0:
        return 1
    p = 128 // ci2
    return p if t_out % p == 0 else 1


def band_rows(t_rows: int, p: int) -> int:
    """T-band height (folded interior rows per grid step).

    Scans are z-sparse INSIDE occupied xy columns (ground plane at the
    bottom, sparse structure above): at the flagship s1 shape the (8, 16)
    xy tiles are ~59% occupied but (8, 16, 8-z) bands only ~16% — banding
    the grid over (xy tile, t band) skips ~3x the FLOPs of xy tiles alone
    on real occupancy, and far more once trained decoders prune.  Bands
    apply only to the unfolded layout (p == 1; folded stages interleave
    z-pairs across lanes, and their T/p is tiny anyway)."""
    if p > 1 or t_rows <= 4 or t_rows % 4 != 0:
        return t_rows
    return 4


def conv_plan(
    ci2: int, co2: int, t_padded: int, fused: bool,
    X: int = None, Y: int = None,
) -> Tuple[int, int, int, bool, bool, int]:
    """Pick ``(xw, yt, tb, double_buffer, slot_split, p)`` for a
    packed-conv stage so the kernel's VMEM scratch fits
    :data:`_SCOPED_VMEM_BUDGET` while minimising HBM tile traffic.

    ``tb`` is the t-band height (:func:`band_rows`): each grid step
    computes one (xw, tb, yt) sub-block and the grid runs over ACTIVE
    (xy tile, band) pairs — :func:`active_tiles` needs (xw, yt, tb, p)
    from the same plan.  ``slot_split`` is availability-driven (per-slot
    lane slices need Ci % 128 == 0).  ``p`` is the stage's HBM
    :func:`lane_fold` factor.  All convs of one stage share a plan (same
    channel count AND stage extents), so active-tile ids — and the
    stage's padded-buffer y rounding (:func:`pad_stage` with the plan's
    ``yt``) — are computed once per stage.

    ``X``/``Y`` are the stage's spatial extents.  They drive the halo
    over-read model: the wide DMA reads ``(xw+2, tb+2, yt+2*HY)`` per
    ``(xw, tb, yt)`` tile, so the plan picks the feasible ``(xw, yt)``
    with the least total bytes (x tiles must divide ``X``; y rounds up,
    so any ``yt`` is legal).  ``X=None`` restricts ``xw`` to the legacy
    8/4 ladder; ``Y=None`` pins ``yt=16`` (the legacy rounding every
    pre-plan caller assumed).
    """
    ci, co = ci2 // 2, co2 // 2
    slot_split = ci % 128 == 0 and co % 128 == 0
    if slot_split:
        wbytes = (
            2 * 3 * (3 * ci) * _pad128(2 * co)
            + 2 * 3 * (3 * ci) * _pad128(co)
        ) * 2
    else:
        wbytes = 2 * 3 * (3 * ci2) * _pad128(co2) * 2
    t_out = t_padded - 2
    p = lane_fold(ci2, co2, t_out)
    tb = band_rows(t_out // p, p)         # folded interior rows per step
    tl = tb * p                           # logical t rows per step

    def fits(xw, yt, db):
        yw = yt + 2 * HY                  # wide-buffer y rows per tile
        inb = (2 if db else 1) * (xw + 2) * (tb + 2) * yw * p * ci2 * 2
        mb = (inb // 2) if fused else 0      # int8 mask mirrors the input
        # unpacked compute view (lane-padded in VMEM like all buffers)
        comp = (xw + 2) * (tl + 2) * yw * _pad128(ci2) * 2 if p > 1 else 0
        shift = (xw + 2) * (tl + 2) * yt * 3 * ci2 * 2
        if not slot_split:                   # + the combined-window buffer
            shift += (xw + 2) * tl * yt * 3 * ci2 * 2
        outb = xw * tl * yt * _pad128(co2) * 2
        skipb = outb if fused else 0
        accb = xw * tl * yt * _pad128(co2) * 4
        total = inb + mb + comp + shift + outb + skipb + accb + wbytes
        return total <= _SCOPED_VMEM_BUDGET

    xws = (
        [w for w in (16, 8, 4) if X % w == 0]
        if X is not None
        else [8, 4]
    )
    # yt candidates stay 32-multiples (plus the legacy 16): the int8 mask
    # DMA offsets are yi*yt, and 48 breaks the (32, 128) int8 tile
    # alignment — measured +28% on the s4 stages when 48 was allowed.
    yts = (64, 32, 16) if Y is not None else (16,)
    best = None
    for yt in yts:
        nty = -(-(Y if Y is not None else yt) // yt)   # y tiles (rounded)
        for xw in xws:
            db = True
            if not fits(xw, yt, db):
                db = False
                if not fits(xw, yt, db):
                    continue
            ntx = (X // xw) if X is not None else 1
            vol = (
                ntx * (xw + 2) * nty * (yt + 2 * HY)
                if X is not None
                else (xw + 2) * (yt + 2 * HY) * nty / xw
            )
            # Single-buffered tiles serialise DMA with compute — charge
            # them ~1.5x so a smaller double-buffered tile wins unless
            # the wide tile's traffic advantage is real.
            key = (vol * (1.0 if db else 1.5), yt, xw)
            if best is None or key < best[0]:
                best = (key, (xw, yt, tb, db, slot_split, p))
    if best is not None:
        return best[1]
    return 4, 16, tb, False, slot_split, p


def _tap_dots(
    ib,                       # VMEM value [xw+2, Tp, yt+2*HY, ci2] (masked,
    #                           unless ``pro`` applies the prologue here)
    shift_bufs,               # tuple of shift scratch refs
    w_refs,                   # tuple of weight refs (layout per slot_split)
    bias_ref,                 # VMEM [1, co2] f32
    *,
    xw: int,
    yt: int,
    t_out: int,
    slot_split: bool,
    pro=None,                 # (a|None, c|None, relu, mask value): fused
    #                           prologue applied on the dy slices — the
    #                           shift copies touch exactly the 3 y-shifted of the
    #                           wide-buffer y columns the taps read, so
    #                           riding the prologue on them skips a full
    #                           wide-tile VPU pass + write-back per conv
):
    """All 27 taps of one tile as MXU dots; returns acc [n, co2] f32."""
    ci2 = ib.shape[-1]
    n = xw * t_out * yt

    def _pslice(dy):
        # Interior y rows start at HY in the wide buffer (fixed 16-row
        # halo tile per side, independent of yt).
        s = ib[:, :, HY - 1 + dy : HY - 1 + yt + dy]
        if pro is None:
            return s
        a, c, relu, mb = pro
        if a is not None:
            s = s * a + c
        if relu:
            s = jnp.maximum(s, 0)
        return jnp.where(
            mb[:, :, HY - 1 + dy : HY - 1 + yt + dy] != 0, s, 0
        )

    if slot_split:
        shift_lo, shift_hi = shift_bufs
        w0lo, w0hi, wm, wp = w_refs
        ci = ci2 // 2
        co2 = w0lo.shape[-1]
        for dy in range(3):
            s = _pslice(dy)
            shift_lo[:, :, :, dy * ci : (dy + 1) * ci] = s[..., :ci]
            shift_hi[:, :, :, dy * ci : (dy + 1) * ci] = s[..., ci:]
        acc = jnp.broadcast_to(bias_ref[0].astype(jnp.float32), (n, co2))
        for ax in range(3):
            tl = shift_lo[ax : ax + xw]
            th = shift_hi[ax : ax + xw]
            acc = acc + jnp.dot(
                tl[:, 1 : 1 + t_out].reshape(n, 3 * ci), w0lo[ax],
                preferred_element_type=jnp.float32,
            )
            acc = acc + jnp.dot(
                th[:, 1 : 1 + t_out].reshape(n, 3 * ci), w0hi[ax],
                preferred_element_type=jnp.float32,
            )
            dm = jnp.dot(
                th[:, 0:t_out].reshape(n, 3 * ci), wm[ax],
                preferred_element_type=jnp.float32,
            )
            dp = jnp.dot(
                tl[:, 2 : 2 + t_out].reshape(n, 3 * ci), wp[ax],
                preferred_element_type=jnp.float32,
            )
            acc = acc + jnp.concatenate([dm, dp], axis=-1)
        return acc
    shift_buf, comb_buf = shift_bufs
    w0_ref, wpm_ref = w_refs
    co2 = w0_ref.shape[-1]
    ci = ci2 // 2
    for dy in range(3):
        shift_buf[:, :, :, dy * ci2 : (dy + 1) * ci2] = _pslice(dy)
    # Combined neighbour-window buffer: per dy, lanes [prev HI | next LO]
    # (the single live slot of each neighbour z-pair) so BOTH windows ride
    # one block-diagonal dot (see pm_tap_weights).  Sub-tile (Ci-wide)
    # lane slices, but plain VMEM copies off the already-built shift rows.
    for dy in range(3):
        comb_buf[:, :, :, dy * ci2 : dy * ci2 + ci] = shift_buf[
            :, 0:t_out, :, dy * ci2 + ci : (dy + 1) * ci2
        ]
        comb_buf[:, :, :, dy * ci2 + ci : (dy + 1) * ci2] = shift_buf[
            :, 2 : 2 + t_out, :, dy * ci2 : dy * ci2 + ci
        ]
    acc = jnp.broadcast_to(bias_ref[0].astype(jnp.float32), (n, co2))
    for ax in range(3):
        acc = acc + jnp.dot(
            shift_buf[ax : ax + xw, 1 : 1 + t_out].reshape(n, 3 * ci2),
            w0_ref[ax],
            preferred_element_type=jnp.float32,
        )
        acc = acc + jnp.dot(
            comb_buf[ax : ax + xw].reshape(n, 3 * ci2),
            wpm_ref[ax],
            preferred_element_type=jnp.float32,
        )
    return acc


def _unfold_halo(y, p, t_padded, c2):
    """[xw+2, T/p+2, yw, p*c2] lane-folded value -> [xw+2, t_padded, yw, c2]
    z-pair compute view; logical t = p*(t'-1) + q for lane block q (row 0 /
    last-row surplus blocks are zero padding by construction)."""
    if p == 1:
        return y
    cols = []
    for tt in range(t_padded):            # tt = logical t + 1
        r, q = (tt - 1 + p) // p, (tt - 1 + p) % p
        cols.append(y[:, r, :, q * c2 : (q + 1) * c2])
    return jnp.stack(cols, axis=1)


def _unfold_interior(y, p, t_out, c2):
    """[xw, T/p, yw, p*c2] interior-rows value -> [xw, T, yw, c2]."""
    if p == 1:
        return y
    cols = [
        y[:, tt // p, :, (tt % p) * c2 : (tt % p + 1) * c2]
        for tt in range(t_out)
    ]
    return jnp.stack(cols, axis=1)


def _fold_interior(a, p, c2):
    """[xw, T, yw, c2] -> [xw, T/p, yw, p*c2] (inverse of
    :func:`_unfold_interior`)."""
    if p == 1:
        return a
    rows = [
        jnp.concatenate(
            [a[:, p * r + q] for q in range(p)], axis=-1
        )
        for r in range(a.shape[1] // p)
    ]
    return jnp.stack(rows, axis=1)


def _decode_tid(tid, by: int, nb: int, xw: int, yt: int, tb: int):
    """Flat (xy tile, t band) id -> (x0, y0, t0) block corner.  Band is
    the fastest-varying component so consecutive grid steps share halo
    rows (tid = (xi * by + yi) * nb + band)."""
    band = jax.lax.rem(tid, nb)
    xy = tid // nb
    return (xy // by) * xw, jax.lax.rem(xy, by) * yt, band * tb


def _packed_kernel(
    ids_ref,                # SMEM [n_tiles*nb] flat (tile, band) id
    n_active_ref,           # SMEM [1]
    xp_ref,                 # HBM [X+2, T/p+2, Y+2*HY, p*2Ci] padded masked
    w_refs,                 # VMEM weight refs (layout per slot_split)
    bias_ref,               # VMEM [1, 2Co] (zeros when no bias)
    out_ref,                # HBM [X, T/p, Y, p*2Co]
    in_bufs,                # VMEM [nbuf, xw+2, tb+2, yt+2*HY, p*2Ci]
    shift_bufs,             # VMEM y-shift scratch (1 or 2 refs)
    out_buf,                # VMEM [xw, tb, yt, p*2Co]
    in_sems,                # DMA sems (nbuf,)
    out_sem,
    *,
    xw: int,
    yt: int,
    tb: int,                # folded interior t rows per grid step
    by: int,
    nb: int,                # t bands per xy tile
    slot_split: bool,
    db: bool,
    p: int = 1,
):
    g = pl.program_id(0)
    n_act = n_active_ref[0]
    t_out = tb * p          # logical t rows per step

    def in_dma(slot, t_idx):
        # One wide DMA covering the tile plus ONE 16-row halo tile per
        # side: HBM slices must be sublane(Y)-tile aligned, so the +-1 y
        # taps are taken as VMEM-local slices instead.  The t band rides a
        # dynamic offset on a free (untiled) dim: padded rows [t0, t0+tb+2)
        # hold the band's interior plus its +-1 halo rows.
        x0, y0, t0 = _decode_tid(ids_ref[t_idx], by, nb, xw, yt, tb)
        return pltpu.make_async_copy(
            xp_ref.at[
                pl.ds(x0, xw + 2), pl.ds(t0, tb + 2),
                pl.ds(y0, yt + 2 * HY),
            ],
            in_bufs.at[slot],
            in_sems.at[slot],
        )

    if db:
        @pl.when(g == 0)
        def _():
            @pl.when(n_act > 0)
            def _():
                in_dma(0, 0).start()

    @pl.when(g < n_act)
    def _():
        if db:
            slot = jax.lax.rem(g, 2)
            in_dma(slot, g).wait()

            # Prefetch the next tile while this one computes.
            @pl.when(g + 1 < n_act)
            def _():
                in_dma(1 - slot, g + 1).start()
        else:
            slot = 0
            dma = in_dma(0, g)
            dma.start()
            dma.wait()

        co2 = out_buf.shape[-1] // p
        ib = _unfold_halo(in_bufs[slot], p, t_out + 2, in_bufs.shape[-1] // p)
        acc = _tap_dots(
            ib, shift_bufs, w_refs, bias_ref,
            xw=xw, yt=yt, t_out=t_out, slot_split=slot_split,
        )
        out_buf[...] = _fold_interior(
            acc.reshape(xw, t_out, yt, co2).astype(out_buf.dtype), p, co2
        )
        x0, y0, t0 = _decode_tid(ids_ref[g], by, nb, xw, yt, tb)
        copy_out = pltpu.make_async_copy(
            out_buf,
            out_ref.at[pl.ds(x0, xw), pl.ds(t0, tb), pl.ds(y0, yt)],
            out_sem,
        )
        copy_out.start()
        copy_out.wait()


def _compact_ids(occ: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ids, count): flat indices of the True entries of ``occ``, packed
    to the front of a capacity-sized id vector."""
    cap = occ.shape[0]
    new_pos = jnp.cumsum(occ.astype(jnp.int32)) - 1
    dest = jnp.where(occ, new_pos, cap)
    src = (
        jnp.zeros((cap + 1,), jnp.int32)
        .at[dest].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    )[:cap]
    return src.astype(jnp.int32), (new_pos[-1] + 1).reshape(1).astype(jnp.int32)


def active_tiles_xy(
    occ_xy: jnp.ndarray, xw: int, yt: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat ids of occupied (xw, yt) xy tiles, padded to the tile count.
    Y rounds up to a tile multiple (matching :func:`pad_stage`); the
    rounding tiles are unoccupied by construction."""
    occ_xy = jnp.pad(occ_xy, ((0, 0), (0, (-occ_xy.shape[1]) % yt)))
    X, Y = occ_xy.shape
    bx, by = X // xw, Y // yt
    occ = occ_xy.reshape(bx, xw, by, yt).any(axis=(1, 3)).reshape(-1)
    return _compact_ids(occ)


def active_tiles(
    mask: jnp.ndarray,        # [X, Z, Y] logical occupancy
    xw: int, yt: int, tb: int,
    p: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat ids of occupied (xw, tb, yt) blocks for the t-banded grid
    (tid = (xi * by + yi) * nb + band — band fastest, matching
    :func:`_decode_tid`).  A band is active iff any cell of the stage
    mask falls in it; the submanifold contract (outputs read at
    mask-true cells only) makes skipping the rest exact.  ``tb`` is in
    FOLDED rows (logical z per band = 2 * p * tb)."""
    X, Z, Y = mask.shape
    m = jnp.pad(mask, ((0, 0), (0, 0), (0, (-Y) % yt)))
    Yp = m.shape[2]
    bx, by = X // xw, Yp // yt
    zb = 2 * p * tb                       # logical z per band
    nb = Z // zb
    occ = (
        m.reshape(bx, xw, nb, zb, by, yt)
        .any(axis=(1, 3, 5))              # [bx, nb, by]
        .transpose(0, 2, 1)               # [bx, by, nb]
        .reshape(-1)
    )
    return _compact_ids(occ)


@functools.partial(
    jax.jit, static_argnames=("xw", "yt", "tb", "slot_split", "db", "p")
)
def _packed_conv_call(
    xp, weights, bias2, ids, n_active, xw, yt, tb, slot_split, db, p=1
):
    """``weights`` is the tuple from :func:`split_tap_weights` when
    ``slot_split`` else a 1-tuple of the dense packed weight.  ``p`` is the
    HBM lane-fold factor (:func:`lane_fold`): ``xp``/output rows carry
    ``p`` z-pair slots in their lanes.  ``tb`` is the t-band height in
    folded rows; ``ids`` must come from :func:`active_tiles` with the
    same (xw, yt, tb, p)."""
    Xp, Tpf, Yp, cif = xp.shape
    ci2 = cif // p
    X, T, Y = Xp - 2, (Tpf - 2) * p, Yp - 2 * HY
    tl = tb * p                        # logical t rows per grid step
    co2 = weights[0].shape[-1]
    by = Y // yt
    nb = (Tpf - 2) // tb
    nw = len(weights)
    nbuf = 2 if db else 1

    if slot_split:
        shift_shapes = [
            pltpu.VMEM((xw + 2, tl + 2, yt, 3 * (ci2 // 2)), xp.dtype)
            for _ in range(2)
        ]
    else:
        shift_shapes = [
            pltpu.VMEM((xw + 2, tl + 2, yt, 3 * ci2), xp.dtype),
            pltpu.VMEM((xw + 2, tl, yt, 3 * ci2), xp.dtype),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((X // xw) * by * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # xp stays in HBM
            *[pl.BlockSpec(memory_space=pltpu.VMEM)] * nw,  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias row
            pl.BlockSpec(memory_space=pltpu.ANY),   # donated zero output
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((nbuf, xw + 2, tb + 2, yt + 2 * HY, cif), xp.dtype),
            *shift_shapes,
            pltpu.VMEM((xw, tb, yt, p * co2), xp.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    ns = len(shift_shapes)

    def kernel(ids_ref, n_ref, xp_ref, *rest):
        w_refs = rest[:nw]
        b_ref, out_in_ref, out_ref = rest[nw], rest[nw + 1], rest[nw + 2]
        in_bufs = rest[nw + 3]
        shift_bufs = rest[nw + 4 : nw + 4 + ns]
        out_buf, in_sems, out_sem = rest[nw + 4 + ns : nw + 7 + ns]
        _packed_kernel(ids_ref, n_ref, xp_ref, w_refs, b_ref, out_ref,
                       in_bufs, shift_bufs, out_buf, in_sems, out_sem,
                       xw=xw, yt=yt, tb=tb, by=by, nb=nb,
                       slot_split=slot_split, db=db, p=p)

    out0 = jnp.zeros((X, T // p, Y, p * co2), xp.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # operand order: ids, n_active, xp, *weights, bias2, out0
        input_output_aliases={4 + nw: 0},
        out_shape=jax.ShapeDtypeStruct((X, T // p, Y, p * co2), xp.dtype),
        compiler_params=_compiler_params(),
    )(ids, n_active, xp, *weights, bias2, out0)


# ---------------------------------------------------------------------------
# V2: fused-chain packed conv
#
# Residual-block chains at inference reduce to back-to-back kernel calls
# with ZERO interleaving XLA passes:
#   - the BN affine (running stats), relu, and occupancy mask run as the
#     kernel *prologue* on the DMA'd tile (mask = a lane-expanded int8
#     array built once per stage — lane-padding economics rule out any
#     thinner encoding);
#   - bias, the residual skip-add, and the block-end relu run as the
#     *epilogue* (the skip tile DMAs from the block's padded input);
#   - outputs write into the interior of a donated zero-padded buffer, so
#     the next conv consumes them directly (no pad/mask staging pass).
# Active tiles are computed once per stage and shared by every conv.
# ---------------------------------------------------------------------------


def _fused_kernel(
    ids_ref, n_active_ref,
    xp_ref,                 # HBM [X+2, T+2, Y+2*HY, 2Ci] padded input
    m_ref,                  # HBM [X+2, T+2, Y+2*HY, 2Ci] int8 mask
    w_refs,                 # VMEM weight refs (layout per slot_split)
    aff_ref,                # VMEM [2, 2Ci] f32 (a, c) rows
    bias_ref,               # VMEM [1, 2Co] f32
    skip_ref,               # HBM padded [X+2, T+2, Y+2*HY, 2Co] (or dummy)
    out_ref,                # HBM padded or interior output
    in_bufs,                # VMEM [nbuf, xw+2, tb+2, yt+2*HY, 2Ci]
    m_bufs,                 # VMEM [nbuf, xw+2, tb+2, yt+2*HY, 2Ci] int8
    shift_bufs,             # VMEM y-shift scratch (1 or 2 refs)
    skip_buf,               # VMEM [xw, tb, yt, 2Co]
    out_buf,                # VMEM [xw, tb, yt, 2Co]
    in_sems, m_sems, skip_sem, out_sem,
    *,
    xw: int, yt: int, tb: int, by: int, nb: int,
    apply_affine: bool, apply_relu: bool, has_skip: bool, out_padded: bool,
    slot_split: bool, db: bool, p: int = 1,
):
    g = pl.program_id(0)
    n_act = n_active_ref[0]
    t_out = tb * p          # logical t rows per step

    def wide_dma(src_ref, bufs, sems, slot, t_idx):
        x0, y0, t0 = _decode_tid(ids_ref[t_idx], by, nb, xw, yt, tb)
        return pltpu.make_async_copy(
            src_ref.at[
                pl.ds(x0, xw + 2), pl.ds(t0, tb + 2),
                pl.ds(y0, yt + 2 * HY),
            ],
            bufs.at[slot],
            sems.at[slot],
        )

    if db:
        @pl.when(g == 0)
        def _():
            @pl.when(n_act > 0)
            def _():
                wide_dma(xp_ref, in_bufs, in_sems, 0, 0).start()
                wide_dma(m_ref, m_bufs, m_sems, 0, 0).start()

    @pl.when(g < n_act)
    def _():
        x0, y0, t0 = _decode_tid(ids_ref[g], by, nb, xw, yt, tb)
        if has_skip:
            skip_dma = pltpu.make_async_copy(
                skip_ref.at[
                    pl.ds(x0 + 1, xw), pl.ds(1 + t0, tb),
                    pl.ds(HY + y0, yt),
                ],
                skip_buf,
                skip_sem,
            )
            skip_dma.start()
        if db:
            slot = jax.lax.rem(g, 2)
            wide_dma(xp_ref, in_bufs, in_sems, slot, g).wait()
            wide_dma(m_ref, m_bufs, m_sems, slot, g).wait()

            @pl.when(g + 1 < n_act)
            def _():
                wide_dma(xp_ref, in_bufs, in_sems, 1 - slot, g + 1).start()
                wide_dma(m_ref, m_bufs, m_sems, 1 - slot, g + 1).start()
        else:
            slot = 0
            d1 = wide_dma(xp_ref, in_bufs, in_sems, 0, g)
            d2 = wide_dma(m_ref, m_bufs, m_sems, 0, g)
            d1.start()
            d2.start()
            d1.wait()
            d2.wait()

        co2 = out_buf.shape[-1] // p
        ci2 = in_bufs.shape[-1] // p
        n = xw * t_out * yt

        # Prologue: y = [relu](a*x + c) masked.  Select (not multiply):
        # the chain's HBM buffers are uninitialised outside active tiles,
        # and NaN*0 would be NaN.  For p == 1 the prologue rides the
        # y-shift copies inside _tap_dots — they touch exactly the 18 of
        # wide-buffer column windows the taps read, so fusing it there
        # skips a full wide-tile VPU pass + write-back per conv.  The
        # lane-folded path (p > 1) keeps the whole-buffer form (the
        # affine rows arrive pre-tiled to the folded lane count).
        x = in_bufs[slot]
        if p == 1:
            a = aff_ref[0].astype(x.dtype) if apply_affine else None
            c = aff_ref[1].astype(x.dtype) if apply_affine else None
            pro = (a, c, apply_relu, m_bufs[slot])
            ib = x
        else:
            if apply_affine:
                a = aff_ref[0].astype(x.dtype)
                c = aff_ref[1].astype(x.dtype)
                y = x * a + c
            else:
                y = x
            if apply_relu:
                y = jnp.maximum(y, 0)
            in_bufs[slot] = jnp.where(m_bufs[slot] != 0, y, 0)
            pro = None
            ib = _unfold_halo(in_bufs[slot], p, t_out + 2, ci2)

        acc = _tap_dots(
            ib, shift_bufs, w_refs, bias_ref,
            xw=xw, yt=yt, t_out=t_out, slot_split=slot_split, pro=pro,
        )
        if has_skip:
            skip_dma.wait()
            sk = _unfold_interior(skip_buf[...], p, t_out, co2)
            acc = acc + sk.reshape(n, co2).astype(jnp.float32)
            acc = jnp.maximum(acc, 0)
        out_buf[...] = _fold_interior(
            acc.reshape(xw, t_out, yt, co2).astype(out_buf.dtype), p, co2
        )
        if out_padded:
            dst = out_ref.at[
                pl.ds(x0 + 1, xw), pl.ds(1 + t0, tb), pl.ds(HY + y0, yt)
            ]
        else:
            dst = out_ref.at[pl.ds(x0, xw), pl.ds(t0, tb), pl.ds(y0, yt)]
        copy_out = pltpu.make_async_copy(out_buf, dst, out_sem)
        copy_out.start()
        copy_out.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "xw", "yt", "tb", "apply_affine", "apply_relu", "has_skip",
        "out_padded", "slot_split", "db", "p",
    ),
)
def _fused_conv_call(
    xp, m8, weights, aff, bias2, skip, ids, n_active,
    xw, yt, tb, apply_affine, apply_relu, has_skip, out_padded, slot_split,
    db, p=1,
):
    Xp, Tpf, Yp, cif = xp.shape
    ci2 = cif // p
    X, T, Y = Xp - 2, (Tpf - 2) * p, Yp - 2 * HY
    tl = tb * p                        # logical t rows per grid step
    co2 = weights[0].shape[-1]
    by = Y // yt
    nb = (Tpf - 2) // tb
    nw = len(weights)
    nbuf = 2 if db else 1

    if slot_split:
        shift_shapes = [
            pltpu.VMEM((xw + 2, tl + 2, yt, 3 * (ci2 // 2)), xp.dtype)
            for _ in range(2)
        ]
    else:
        shift_shapes = [
            pltpu.VMEM((xw + 2, tl + 2, yt, 3 * ci2), xp.dtype),
            pltpu.VMEM((xw + 2, tl, yt, 3 * ci2), xp.dtype),
        ]
    ns = len(shift_shapes)

    out_shape = (
        (Xp, Tpf, Yp, p * co2)
        if out_padded
        else (X, T // p, Y, p * co2)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((X // xw) * by * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # xp
            pl.BlockSpec(memory_space=pltpu.ANY),   # mask int8
            *[pl.BlockSpec(memory_space=pltpu.VMEM)] * nw,  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # affine rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias row
            pl.BlockSpec(memory_space=pltpu.ANY),   # skip (padded)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((nbuf, xw + 2, tb + 2, yt + 2 * HY, cif), xp.dtype),
            pltpu.VMEM((nbuf, xw + 2, tb + 2, yt + 2 * HY, cif), jnp.int8),
            *shift_shapes,
            pltpu.VMEM((xw, tb, yt, p * co2), xp.dtype),
            pltpu.VMEM((xw, tb, yt, p * co2), xp.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(ids_ref, n_ref, xp_ref, m_ref, *rest):
        w_refs = rest[:nw]
        aff_ref, b_ref, skip_ref, out_ref = rest[nw : nw + 4]
        in_bufs, m_bufs = rest[nw + 4], rest[nw + 5]
        shift_bufs = rest[nw + 6 : nw + 6 + ns]
        skip_buf, out_buf, in_sems, m_sems, skip_sem, out_sem = rest[
            nw + 6 + ns :
        ]
        _fused_kernel(
            ids_ref, n_ref, xp_ref, m_ref, w_refs, aff_ref, b_ref, skip_ref,
            out_ref, in_bufs, m_bufs, shift_bufs, skip_buf, out_buf,
            in_sems, m_sems, skip_sem, out_sem,
            xw=xw, yt=yt, tb=tb, by=by, nb=nb,
            apply_affine=apply_affine, apply_relu=apply_relu,
            has_skip=has_skip, out_padded=out_padded,
            slot_split=slot_split, db=db, p=p,
        )

    # The output buffer is deliberately UNINITIALISED outside active tiles
    # (the donated-zeros form cost a full-buffer memset per conv); every
    # chain consumer selects by mask or gathers kept cells only.
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, xp.dtype),
        compiler_params=_compiler_params(),
    )(ids, n_active, xp, m8, *weights, aff, bias2, skip)


def _fold_t(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[X, T, Y, c] -> [X, T/p, Y, p*c]: lane block q of row t' holds
    logical t = p*t' + q (one relayout pass; see :func:`lane_fold`)."""
    if p == 1:
        return x
    X, T, Y, c = x.shape
    return (
        x.reshape(X, T // p, p, Y, c)
        .transpose(0, 1, 3, 2, 4)
        .reshape(X, T // p, Y, p * c)
    )


def _unfold_t(x: jnp.ndarray, p: int, c: int) -> jnp.ndarray:
    """Inverse of :func:`_fold_t`."""
    if p == 1:
        return x
    X, Tf, Y, _ = x.shape
    return (
        x.reshape(X, Tf, Y, p, c)
        .transpose(0, 1, 3, 2, 4)
        .reshape(X, Tf * p, Y, c)
    )


def stage_mask8(
    mask: jnp.ndarray,        # [X, 2T, Y] logical occupancy
    channels2: int,           # 2C lane count of the stage
    yt: int = 16,
) -> jnp.ndarray:
    """Lane-expanded padded int8 mask [X+2, T/p+2, Y+2*HY, p*2C] for the
    fused kernel's prologue; built once per stage and shared by all its
    convs.  Narrow stages lane-fold p z-pair rows (:func:`lane_fold`);
    the zero t'-padding doubles as the fold's surplus-slot zeros."""
    X, Z, Y = mask.shape
    c = channels2 // 2
    p = lane_fold(channels2, channels2, Z // 2)
    if p == 1:
        # Single-pass build: pad the (tiny, i1) logical mask first, then
        # one fused iota-select-convert writes the padded int8 volume
        # directly.  The previous concat(broadcast, broadcast) + convert +
        # pad chain ran as three separate ~254 MB HBM passes at the s1
        # shape (profiled at ~15 ms/scan across the three s1 builds).
        mp = jnp.pad(mask, ((1, 1), (2, 2), (HY, HY + (-Y) % yt)))
        Xp, Zp, Yp = mp.shape
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (Xp, Zp // 2, Yp, channels2), 3
        )
        return jnp.where(
            lane < c, mp[:, 0::2, :, None], mp[:, 1::2, :, None]
        ).astype(jnp.int8)
    lo, hi = mask[:, 0::2], mask[:, 1::2]
    m = jnp.concatenate(
        [
            jnp.broadcast_to(lo[..., None], (X, Z // 2, Y, c)),
            jnp.broadcast_to(hi[..., None], (X, Z // 2, Y, c)),
        ],
        axis=-1,
    ).astype(jnp.int8)
    m = _fold_t(m, p)
    return jnp.pad(m, ((1, 1), (1, 1), (HY, HY + (-Y) % yt), (0, 0)))


def pad_stage(x: jnp.ndarray, yt: int = 16) -> jnp.ndarray:
    """[X, T, Y, 2C] -> padded [X+2, T/p+2, Ypad+2*HY, p*2C] (fused-kernel
    input; p = :func:`lane_fold`).  The y halo pad is the fixed
    :data:`HY` tile per side; Y additionally rounds UP to a multiple of
    the STAGE PLAN's ``yt`` (pass ``conv_plan(...)[1]``) so the banded
    grid tiles evenly — the rounding cells are mask/tile-dead."""
    c2 = x.shape[-1]
    p = lane_fold(c2, c2, x.shape[1])
    xf = _fold_t(x, p)
    return jnp.pad(
        xf, ((1, 1), (1, 1), (HY, HY + (-x.shape[2]) % yt), (0, 0))
    )


def unpad_stage(
    xp: jnp.ndarray, y: int = None, c2: int = None
) -> jnp.ndarray:
    """Interior of a padded stage buffer (``y`` = unpadded Y extent; None
    means Y had no rounding).  ``c2`` = the stage's logical lane count —
    pass it for stages that may be lane-folded."""
    inner = (
        xp[1:-1, 1:-1, HY:-HY] if y is None else xp[1:-1, 1:-1, HY : HY + y]
    )
    if c2 is None or xp.shape[-1] == c2:
        return inner
    return _unfold_t(inner, xp.shape[-1] // c2, c2)


def _plan_weights(weight: jnp.ndarray, slot_split: bool, cd):
    """Weight tuple for a plan: split blocks or the combined-window form."""
    if slot_split:
        return tuple(w.astype(cd) for w in split_tap_weights(weight))
    return tuple(w.astype(cd) for w in pm_tap_weights(weight))


def fused_packed_conv(
    xp: jnp.ndarray,           # [X+2, T+2, Y+2*HY, 2Ci] padded bf16
    weight: jnp.ndarray,       # [27, Ci, Co]
    mask8: jnp.ndarray,        # from stage_mask8 (matching 2Ci)
    ids: jnp.ndarray,
    n_active: jnp.ndarray,
    affine: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (a, c) [2Ci]
    relu: bool = False,
    bias: Optional[jnp.ndarray] = None,       # [Co]
    skip: Optional[jnp.ndarray] = None,       # padded [.., 2Co]
    out_padded: bool = True,
    compute_dtype=None,
    plan: Optional[Tuple[int, int, bool, bool]] = None,
) -> jnp.ndarray:
    """One fused conv of a residual chain: prologue
    ``y = [relu](a*x + c) * mask`` -> packed 3^3 conv -> epilogue
    ``[relu](acc + bias [+ skip])``; optionally writes a padded output the
    next fused conv consumes directly.

    ``plan`` must be the :func:`conv_plan` tuple the caller used to build
    ``ids`` (tile ids depend on the plan's tile width); None recomputes it
    here — only valid when the caller also used the default plan.
    """
    cd = compute_dtype or xp.dtype
    ci = weight.shape[1]
    co = weight.shape[-1]
    p = xp.shape[-1] // (2 * ci)        # lane fold of the chain buffers
    t_logical = (xp.shape[1] - 2) * p
    if plan is None:
        # No-plan calls can't recover the unrounded Y, so they pin the
        # legacy yt=16 rounding (any 16-multiple Y divides evenly).
        plan = conv_plan(
            2 * ci, 2 * co, t_logical + 2, fused=True, X=xp.shape[0] - 2
        )
    xw, yt, tb, db, slot_split = plan[:5]
    weights = _plan_weights(weight, slot_split, cd)
    if affine is not None:
        aff = jnp.stack(
            [
                jnp.tile(affine[0].astype(jnp.float32), p),
                jnp.tile(affine[1].astype(jnp.float32), p),
            ]
        )
    else:
        aff = jnp.zeros((2, p * 2 * ci), jnp.float32)
    b2 = (
        jnp.concatenate([bias, bias]).astype(jnp.float32)
        if bias is not None
        else jnp.zeros((2 * co,), jnp.float32)
    ).reshape(1, 2 * co)
    if skip is None:
        # tiny dummy: with has_skip=False the kernel never touches it
        skip_arr = jnp.zeros((1, 1, 1, p * 2 * co), xp.dtype)
    else:
        skip_arr = skip.astype(xp.dtype)
    from pasco_tpu.ops.pallas_batch import cached_sequential_vmap

    out = cached_sequential_vmap(
        _fused_conv_call,
        xw, yt, tb, affine is not None, relu, skip is not None, out_padded,
        slot_split, db, p,
    )(xp.astype(cd), mask8, weights, aff, b2, skip_arr, ids, n_active)
    if out_padded or p == 1:
        return out
    return _unfold_t(out, p, 2 * co)


def block_sparse_packed_conv(
    x: jnp.ndarray,            # [X, T, Y, 2C] z-pair-packed volume
    weight: jnp.ndarray,       # [27, Ci, Co] sparse-layout kernel
    mask: jnp.ndarray,         # [X, 2T, Y] logical occupancy
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """'Same' 3^3 submanifold conv on a packed volume over occupied
    (xw, yt) xy tiles only; drop-in for
    :func:`pasco_tpu.ops.dense_ops.conv3_packed_z2` with ``mask`` applied
    to the input (fused into the padded staging copy).  Cells in inactive
    tiles come back exactly zero.  Inference path (no custom VJP).
    """
    X, T, Y, c2 = x.shape
    cd = compute_dtype or x.dtype
    co = weight.shape[-1]
    xw, yt, tb, db, slot_split = conv_plan(
        c2, 2 * co, T + 2, fused=False, X=X, Y=Y
    )[:5]
    assert X % xw == 0, (x.shape, xw)
    p = lane_fold(c2, 2 * co, T)
    xm = _mask_slots(x, mask).astype(cd)
    # y pads one 16-row halo tile per side (plus rounding to a plan-yt
    # multiple) so every tile's wide halo DMA slice stays sublane-tile
    # aligned (Mosaic requires it for HBM slices).
    xp = jnp.pad(
        _fold_t(xm, p), ((1, 1), (1, 1), (HY, HY + (-Y) % yt), (0, 0))
    )
    weights = _plan_weights(weight, slot_split, cd)
    b2 = (
        jnp.concatenate([bias, bias]).astype(jnp.float32)
        if bias is not None
        else jnp.zeros((2 * co,), jnp.float32)
    ).reshape(1, 2 * co)
    ids, n_active = active_tiles(mask, xw, yt, tb, p)
    from pasco_tpu.ops.pallas_batch import cached_sequential_vmap

    out = cached_sequential_vmap(
        _packed_conv_call, xw, yt, tb, slot_split, db, p
    )(xp, weights, b2, ids, n_active)
    return _unfold_t(out, p, 2 * co)[:, :, :Y].astype(x.dtype)


# ---------------------------------------------------------------------------
# Custom VJP: the packed block-sparse conv as a TRAINING op.
#
# Declared semantics (the contract every caller of the packed path already
# honours): ``y = conv3(M (.) x, w) + b``, read only at mask-valid cells —
# cells outside active tiles come back zero from the kernel, the XLA
# formulation computes (never-read) values there, and consumers mask or
# gather valid cells only.  The backward therefore zeroes the incoming
# cotangent at invalid cells first; after that:
#
#   dx = M (.) conv3(dy_masked, flip(w))      <- ANOTHER packed conv: the
#        transpose of a 'same' 3^3 conv is a 'same' 3^3 conv with
#        spatially flipped taps and transposed channel blocks, so the
#        backward data pass rides the same Pallas kernel (same active
#        tiles — submanifold output mask == input mask);
#   dw[k] = sum_cells tap_k(M (.) x) (x) dy   <- via jax.vjp of the XLA
#        formulation restricted to the weight (27 [N,Ci]^T @ [N,Co] dots);
#   db = sum_cells dy_masked (slot halves folded).
#
# This lets training (including every remat re-forward) run the fused
# tile-skipping kernel where round 1 had to fall back to XLA
# ("Training always uses XLA", core/config.py r1).  Gradients are
# checked against the XLA formulation's autodiff in
# tests/test_pallas_conv.py::test_packed_conv_vjp_matches_xla.
# ---------------------------------------------------------------------------


def _mask_slots(v: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    from pasco_tpu.ops.dense_ops import mask_mul_z2

    return mask_mul_z2(v, mask[:, 0::2], mask[:, 1::2])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def packed_conv_trainable(x, weight, bias, mask, has_bias, compute_dtype):
    """Differentiable ``block_sparse_packed_conv`` (bias must be an array;
    pass zeros with ``has_bias=False`` to drop its gradient)."""
    return block_sparse_packed_conv(
        x, weight, mask,
        bias=bias if has_bias else None,
        compute_dtype=compute_dtype,
    )


def _pct_fwd(x, weight, bias, mask, has_bias, compute_dtype):
    y = packed_conv_trainable(x, weight, bias, mask, has_bias, compute_dtype)
    return y, (x, weight, mask)


def _pct_bwd(has_bias, compute_dtype, res, dy):
    from pasco_tpu.ops.dense_ops import conv3_packed_z2

    x, weight, mask = res
    dym = _mask_slots(dy, mask)
    # Data gradient: flipped-tap conv through the same Pallas kernel.
    w_t = weight[::-1].swapaxes(1, 2)
    dx = block_sparse_packed_conv(dym, w_t, mask, compute_dtype=compute_dtype)
    dx = _mask_slots(dx, mask).astype(x.dtype)
    # Weight gradient via the XLA formulation's own vjp (reuses its
    # shifted-input build; 27 K=N contraction dots on the MXU).
    _, vjp_w = jax.vjp(
        lambda w_: conv3_packed_z2(
            x, w_, None, compute_dtype=compute_dtype, mask=mask
        ),
        weight,
    )
    (dw,) = vjp_w(dym)
    if has_bias:
        db2 = dym.astype(jnp.float32).sum(axis=(0, 1, 2))
        co = weight.shape[-1]
        db = (db2[:co] + db2[co:]).astype(weight.dtype)
    else:
        db = jnp.zeros((weight.shape[-1],), weight.dtype)
    return dx, dw, db, None


packed_conv_trainable.defvjp(_pct_fwd, _pct_bwd)


def block_sparse_conv3(
    x: jnp.ndarray,          # [X, Y, Z, C] masked dense volume
    weight: jnp.ndarray,     # [27, Cin, Cout] (kernel_offsets(3) order)
    mask: jnp.ndarray,       # [X, Y, Z] occupancy
    block_capacity: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """'Same'-padded 3^3 conv over occupied 8x8xZ columns only.

    Cells outside active columns stay zero (the output buffer is donated
    zeros); callers re-mask outputs anyway, which also zeroes the bias at
    empty cells, matching the masked-dense contract.  Z must be a multiple
    of 8.
    """
    assert x.shape[2] % 8 == 0, "z extent must be sublane-aligned"
    cd = compute_dtype or x.dtype
    ids, n_active = active_columns(mask, block_capacity)
    out = _block_conv_call(
        x.astype(cd), weight.astype(cd), ids, n_active, block_capacity
    )
    if bias is not None:
        out = jnp.where(
            mask[..., None], out + bias.astype(out.dtype), out
        )
    return out.astype(x.dtype)
