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
