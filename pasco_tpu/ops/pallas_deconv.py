"""Fused decoder up-preamble: deconv -> BN-affine -> leaky -> coords ->
resize 1x1 -> +skip, written straight into the padded chain-input layout.

The decoder stage preamble between the parent features and the fused
residual chain ran as ~6 separate XLA passes over the scale-1 volume
(deconv relayout 2.4 ms, coords concat, up_bn add, leaky select, resize
dot, pad_stage — ~10 ms/scan at dec_s1 in the round-2 profile).  This
kernel runs the whole preamble per (8, 32) xy tile of the output stage:
ONE parent DMA (stride-2 deconv needs no halo), one MXU dot against the
pre-packed deconv weight, the two inference BN affines + leaky-ReLU on
the resident tile, coordinates from iota + the (scalar-prefetched) box
corner, the resize 1x1 as a second dot, the skip add, and a direct
write into the interior of the padded buffer the chain consumes — so
``pad_stage`` disappears too.

Mirrors the reference decoder's generative up step
(``pasco/models/decoder_v3.py`` up conv + ``resize`` feature concat),
restructured for the MXU.  Inference-only, like the fused chain; v1
requires the stage's Y extent to be a multiple of 32 (the parent DMA's
sublane alignment) — other shapes keep the XLA formulation.
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

XW = 8          # output-tile x extent (parent 4)
YT = 32         # output-tile y extent (parent 16 — sublane aligned)


def _iota_f32(shape, dim):
    # Mosaic's tpu.iota only produces integer vectors on-chip (a float
    # iota passes interpret mode but fails hardware lowering), so build
    # int32 and convert.
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32
    )


def pack_deconv_weight(
    weight: jnp.ndarray,       # [8, Ci, Co] (kernel_offsets(2) order)
    dtype,
) -> jnp.ndarray:
    """[2Ci, (ix, pt, iy, 2Co)] packed deconv weight: parent slot pz's
    children land in output pair 2t+pz (block-diagonal over slots), child
    z parity dz selects the output lane half.  Same math as
    ``dense_ops.deconv2_packed_to_packed``, lane order chosen so the
    kernel's child unfold keeps x/t interleaves on untiled dims."""
    ci, co = weight.shape[1], weight.shape[2]
    w3 = weight.reshape(2, 2, 2, ci, co)       # (ix, iy, dz, ci, co)
    wk = jnp.zeros((2 * ci, 2, 2, 2, 2 * co), weight.dtype)
    for pz in range(2):
        for dz in range(2):
            wk = wk.at[
                pz * ci : (pz + 1) * ci, :, pz, :, dz * co : (dz + 1) * co
            ].set(w3[:, :, dz].transpose(2, 0, 1, 3))
    # [2ci, ix, pt, iy, 2co] -> flat lane order (ix, pt, iy, 2co)
    return wk.reshape(2 * ci, 16 * co).astype(dtype)


def _unfold_children(v, T2, co2):
    """[4, T2, 16, 16co] deconv output -> [8, 2*T2, 32, 2co] child tile.

    Lane blocks are (ix, pt, iy, 2co); ix joins x and pt joins t (both
    untiled dims — free vreg reordering), iy zips into the sublane (y)
    dim — the one real relayout.
    """
    x2, t2, y2 = v.shape[0], v.shape[1], v.shape[2]
    v = v.reshape(x2, t2, y2, 2, 2, 2, co2)
    # -> [x2, ix, t2, pt, y2, iy, co2]
    v = v.transpose(0, 3, 1, 4, 2, 5, 6)
    return v.reshape(2 * x2, 2 * t2, 2 * y2, co2)


def _up_kernel(
    ids_ref, n_ref, gmin_ref,
    par_ref,                  # HBM [X2, T2, Y2, 2ci]
    skip_ref,                 # HBM [X, T, Y32, 2co]
    cm_ref,                   # HBM [X+2, T+2, Ypad, 2co] int8 CHILD mask
    wk_ref,                   # VMEM [2ci, 16co]
    bd_ref,                   # VMEM [1, 16co] f32 deconv bias (tiled)
    aff1_ref,                 # VMEM [2, 2co] f32 (a, c) up_bn
    aff2_ref,                 # VMEM [2, L2] f32 (a, c) resize_bn
    wr_ref,                   # VMEM [L2, 2co] resize weight (blockdiag)
    br_ref,                   # VMEM [1, 2co] f32 resize bias
    out_ref,                  # HBM [X+2, T+2, Ypad, 2co]
    pbuf,                     # VMEM [2, 4, T2, 16, 2ci]
    sbuf,                     # VMEM [XW, T, YT, 2co]
    mbuf,                     # VMEM [XW, T, YT, 2co] int8
    obuf,                     # VMEM [XW, T, YT, 2co]
    in_sems, skip_sem, m_sem, out_sem,
    *,
    T: int, by: int, co: int, scale: int, xw: int = XW,
):
    g = pl.program_id(0)
    n_act = n_ref[0]
    T2 = T // 2
    co2 = 2 * co
    f32 = jnp.float32

    def par_dma(slot, idx):
        tid = ids_ref[idx]
        return pltpu.make_async_copy(
            par_ref.at[
                pl.ds((tid // by) * (xw // 2), xw // 2), :,
                pl.ds((tid % by) * (YT // 2), YT // 2),
            ],
            pbuf.at[slot],
            in_sems.at[slot],
        )

    @pl.when(g == 0)
    def _():
        @pl.when(n_act > 0)
        def _():
            par_dma(0, 0).start()

    @pl.when(g < n_act)
    def _():
        tid = ids_ref[g]
        x0 = (tid // by) * xw
        y0 = (tid % by) * YT
        skip_dma = pltpu.make_async_copy(
            skip_ref.at[pl.ds(x0, xw), :, pl.ds(y0, YT)],
            sbuf,
            skip_sem,
        )
        skip_dma.start()
        # Child mask (interior slice of the padded stage_mask8 volume):
        # the deconv/BN/coords/resize side exists only at generated-child
        # cells — union cells contributed by the skip alone must carry
        # the shortcut features only (ME ``dec + shortcut`` union add).
        m_dma = pltpu.make_async_copy(
            cm_ref.at[pl.ds(x0 + 1, xw), pl.ds(1, T), pl.ds(16 + y0, YT)],
            mbuf,
            m_sem,
        )
        m_dma.start()
        slot = jax.lax.rem(g, 2)
        par_dma(slot, g).wait()

        @pl.when(g + 1 < n_act)
        def _():
            par_dma(1 - slot, g + 1).start()

        ci2 = pbuf.shape[-1]
        n2 = (xw // 2) * T2 * (YT // 2)
        v = jnp.dot(
            pbuf[slot].reshape(n2, ci2), wk_ref[...],
            preferred_element_type=f32,
        ) + bd_ref[0]
        child = _unfold_children(
            v.astype(jnp.bfloat16).reshape(xw // 2, T2, YT // 2, 16 * co),
            T2, co2,
        )                                          # [XW, T, YT, 2co] bf16

        # up_bn affine + leaky (0.01), f32 math like the XLA path.
        a1 = aff1_ref[0]
        c1 = aff1_ref[1]
        y1 = child.astype(f32) * a1 + c1
        y1 = jnp.where(y1 > 0, y1, 0.01 * y1).astype(jnp.bfloat16)

        # normalised cell coords (x, y, z)/1 at this stride: f32 math,
        # bf16 rounding — identical to cell_coords()/scale .astype(bf16).
        gx = (
            gmin_ref[0].astype(f32)
            + scale * (x0 + _iota_f32((xw, T, YT), 0))
        ) / scale
        gy = (
            gmin_ref[1].astype(f32)
            + scale * (y0 + _iota_f32((xw, T, YT), 2))
        ) / scale
        tz = 2.0 * _iota_f32((xw, T, YT), 1)
        gz_lo = (gmin_ref[2].astype(f32) + scale * tz) / scale
        gz_hi = (gmin_ref[2].astype(f32) + scale * (tz + 1.0)) / scale
        cl = [c[..., None].astype(jnp.bfloat16) for c in (gx, gy, gz_lo)]
        ch = [c[..., None].astype(jnp.bfloat16) for c in (gx, gy, gz_hi)]
        xc = jnp.concatenate(
            [y1[..., :co], *cl, y1[..., co:], *ch], axis=-1
        )                                          # [XW, T, YT, 2(co+3)]

        a2 = aff2_ref[0]
        c2 = aff2_ref[1]
        xc = (xc.astype(f32) * a2 + c2).astype(jnp.bfloat16)

        n = xw * T * YT
        r = jnp.dot(
            xc.reshape(n, xc.shape[-1]), wr_ref[...],
            preferred_element_type=f32,
        ) + br_ref[0]
        skip_dma.wait()
        m_dma.wait()
        dec = jnp.where(
            mbuf[...] != 0, r.astype(jnp.bfloat16).reshape(xw, T, YT, co2), 0
        )
        res = dec + sbuf[...].astype(jnp.bfloat16)
        obuf[...] = res.astype(obuf.dtype)
        copy = pltpu.make_async_copy(
            obuf,
            out_ref.at[
                pl.ds(x0 + 1, xw), pl.ds(1, T), pl.ds(16 + y0, YT)
            ],
            out_sem,
        )
        copy.start()
        copy.wait()


def up_plan(ci2: int, co2: int, T: int) -> int:
    """Pick the output-tile x extent ``xw`` so the kernel's scratch plus
    Mosaic's value-stack intermediates (the unfolded child tile, its f32
    BN/coords/resize temps) fit scoped VMEM — same budget discipline as
    ``pallas_conv.conv_plan`` / ``pallas_down.down_plan``."""
    from pasco_tpu.ops.pallas_conv import _SCOPED_VMEM_BUDGET, _pad128

    # Lane dims padded to the 128-lane VMEM tile, like conv_plan /
    # down_plan (ADVICE r2).
    for xw in (8, 4, 2):
        ob = xw * T * YT * _pad128(co2) * 2  # one bf16 output-tile volume
        pslot = (xw // 2) * (T // 2) * (YT // 2) * _pad128(ci2) * 2
        wkb = ci2 * _pad128(8 * co2) * 2
        # + ob // 2: the int8 child-mask tile (union-add semantics)
        total = 2 * pslot + 2 * ob + ob // 2 + wkb + 9 * ob + 2**20
        if total <= _SCOPED_VMEM_BUDGET:
            return xw
    import warnings

    warnings.warn(
        f"up_plan: no xw fits scoped VMEM for (ci2={ci2}, co2={co2}, "
        f"T={T}); falling back to xw=2 which may exceed the budget",
        stacklevel=2,
    )
    return 2


@functools.partial(jax.jit, static_argnames=("scale", "ypad", "xw"))
def _up_call(
    parent, skip, cm8, wk, bd16, aff1, aff2, wr2, br2, ids, n_active, gmin,
    scale, ypad, xw,
):
    # ``xw`` is passed explicitly by up_preamble_padded (which builds the
    # tile ids with the same plan) so the grid and the ids can never
    # silently desynchronise (ADVICE r2).
    X2, T2, Y2, ci2 = parent.shape
    X, T = 2 * X2, 2 * T2
    co2 = wr2.shape[-1]
    co = co2 // 2
    y32 = skip.shape[2]
    by = y32 // YT

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((X // xw) * by,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # parent
            pl.BlockSpec(memory_space=pltpu.ANY),   # skip
            pl.BlockSpec(memory_space=pltpu.ANY),   # child mask int8
            *[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, xw // 2, T2, YT // 2, ci2), parent.dtype),
            pltpu.VMEM((xw, T, YT, co2), parent.dtype),
            pltpu.VMEM((xw, T, YT, co2), jnp.int8),
            pltpu.VMEM((xw, T, YT, co2), parent.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(ids_ref, n_ref, gmin_ref, par_ref, skip_ref, cm_ref, wk_ref,
               bd_ref, aff1_ref, aff2_ref, wr_ref, br_ref, out_ref,
               pbuf, sbuf, mbuf, obuf, in_sems, skip_sem, m_sem, out_sem):
        _up_kernel(
            ids_ref, n_ref, gmin_ref, par_ref, skip_ref, cm_ref, wk_ref,
            bd_ref, aff1_ref, aff2_ref, wr_ref, br_ref, out_ref,
            pbuf, sbuf, mbuf, obuf, in_sems, skip_sem, m_sem, out_sem,
            T=T, by=by, co=co, scale=scale, xw=xw,
        )

    # Padded chain layout [X+2, T+2, ypad, 2co]; non-active tiles and the
    # border stay UNINITIALISED — the chain prologue masks by its int8
    # mask volume, exactly as with pad_stage + uninitialised chain bufs.
    from pasco_tpu.ops.pallas_conv import _compiler_params

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X + 2, T + 2, ypad, co2), skip.dtype),
        compiler_params=_compiler_params(),
    )(ids, n_active, gmin, parent, skip, cm8, wk, bd16, aff1, aff2, wr2, br2)


def up_preamble_padded(
    parent_masked: jnp.ndarray,   # [X/2, T/2, Y/2, 2Ci] masked parent
    skip: jnp.ndarray,            # [X, T, Y, 2Co] (enc output, masked)
    occ_xy: jnp.ndarray,          # [X, Y] any-z occupancy of the stage mask
    box_min: jnp.ndarray,         # [3] int32 box corner (stride-1 units)
    scale: int,
    wd: jnp.ndarray,              # [8, Ci, Co] deconv weight
    bd: jnp.ndarray,              # [Co] deconv bias
    aff1: Tuple[jnp.ndarray, jnp.ndarray],   # up_bn (a, c) [2Co] f32
    aff2: Tuple[jnp.ndarray, jnp.ndarray],   # resize_bn (a, c) [2(Co+3)]
    wr: jnp.ndarray,              # [Co + 3, Co] resize weight
    br: jnp.ndarray,              # [Co] resize bias
    child_m8: jnp.ndarray = None,  # padded int8 CHILD mask (stage_mask8 of
    #                                upsample2_mask(parent_keep) & bbox)
    y_round: int = 16,             # consumer chain's y rounding (plan yt)
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Padded chain input [X+2, T+2, Y + 2*16 (+y rounding), 2Co].

    The dec-side preamble is zeroed outside ``child_m8`` before the skip
    add, so union cells the skip alone contributes carry the shortcut
    features only (ME semantics, ``decoder_v3.py:163``).

    Requires Y % 32 == 0 and X % xw == 0 (xw from :func:`up_plan`; see
    module docstring).
    """
    from pasco_tpu.ops.dense_ops import blockdiag2_weight
    from pasco_tpu.ops.pallas_conv import active_tiles_xy

    X2, T2, Y2, ci2 = parent_masked.shape
    X, T, Y = 2 * X2, 2 * T2, 2 * Y2
    co = wd.shape[-1]
    # Same plan _up_call derives from the argument shapes — the tile ids
    # must be built with the identical x extent.
    xw = up_plan(ci2, 2 * co, T)
    assert Y % YT == 0 and X % xw == 0, (X, Y)
    # The chain pads y by a 16-row halo tile each side plus rounding to
    # the CONSUMER plan's yt (``y_round``); the kernel's interior offset
    # is 16, so ypad must match pad_stage's shape.  Rounding rows beyond
    # the write tiles stay uninitialised (mask-dead for the chain).
    ypad = Y + (-Y) % y_round + 32

    wk = pack_deconv_weight(wd, compute_dtype)
    bd16 = jnp.tile(
        jnp.concatenate([bd, bd]).astype(jnp.float32), 8
    ).reshape(1, 16 * co)
    a1 = jnp.stack([aff1[0].astype(jnp.float32), aff1[1].astype(jnp.float32)])
    a2 = jnp.stack([aff2[0].astype(jnp.float32), aff2[1].astype(jnp.float32)])
    wr2 = blockdiag2_weight(wr).astype(compute_dtype)
    br2 = jnp.concatenate([br, br]).astype(jnp.float32).reshape(1, 2 * co)
    ids, n_active = active_tiles_xy(occ_xy, xw, YT)
    assert child_m8 is not None
    from pasco_tpu.ops.pallas_batch import cached_sequential_vmap

    return cached_sequential_vmap(_up_call, scale, ypad, xw)(
        parent_masked.astype(compute_dtype), skip.astype(compute_dtype),
        child_m8, wk, bd16, a1, a2, wr2, br2, ids, n_active,
        box_min.astype(jnp.int32),
    )
