"""Sparse 3D convolutions as gather-matmul-scatter on padded voxel sets.

TPU-native replacement for MinkowskiEngine's convolution stack (reference:
``ME.MinkowskiConvolution``, ``ME.MinkowskiConvolutionTranspose(
expand_coordinates=True)``, ``ME.MinkowskiMaxPooling`` — used throughout
``pasco/maskpls/mink.py`` and ``pasco/models/{encoder_v2,decoder_v3}.py``).

Design notes
------------
* The "rulebook" (kernel map) of a sparse conv is expressed as, per kernel
  offset, a gather of neighbour features followed by a ``[N, Cin] @ [Cin,
  Cout]`` matmul accumulated into the output.  Offsets are a static python
  loop, so XLA sees K independent MXU matmuls plus gathers it can overlap.
* Neighbour lookup uses a dense cell->row table over the bounded working
  box (see ``core.sparse``): one scatter to build, one gather per query —
  no sorting or hashing, and one table serves all K offsets.
* The *generative* transposed conv with kernel 2, stride 2 has the key
  property that every child voxel has exactly one parent, so coordinate
  expansion is a reshape — ``[N, Cin] @ [Cin, 8*Cout]`` in a single MXU
  matmul, no deduplication.  This is the op that dominates the reference
  decoder (``decoder_v3.py:148-172``).

Weight layouts: ``[K, Cin, Cout]`` with offsets ordered by
:func:`kernel_offsets` (x-major, z-fastest).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pasco_tpu.core.sparse import (
    Box,
    SparseGrid,
    build_dense_table,
    build_table,
    linear_keys,
    lookup,
    lookup_dense_table,
    unique,
)


class Rulebook(NamedTuple):
    """Precomputed kernel map (MinkowskiEngine "rulebook") for one
    coordinate set: for every kernel offset k and output row n, the input
    row to gather and whether it exists.

    Built once per coordinate set and reused by every conv on those
    coordinates (the reference's CoordinateManager caches kernel maps the
    same way).
    """

    rows: jnp.ndarray   # [K, N] int32 gather row (0 where absent)
    found: jnp.ndarray  # [K, N] bool


def build_rulebook(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    box: Box,
    stride: int,
    kernel_size: int,
) -> Rulebook:
    """Rulebook for a submanifold conv (output coords == input coords).

    Uses a dense cell->row table (one scatter) and K gathers — no sorting;
    on this TPU backend each sort/searchsorted costs ~10-20 s of compile
    and a binary search per probe, while the dense table is one O(1)
    gather per query (the box is bounded, so the table is tens of MB).
    """
    offsets = kernel_offsets(kernel_size)
    table = build_dense_table(coords, mask, box, stride)
    rows, founds = [], []
    for k in range(offsets.shape[0]):
        off = offsets[k]
        if (off == 0).all():
            n = coords.shape[0]
            rows.append(jnp.arange(n, dtype=jnp.int32))
            founds.append(mask)
            continue
        shift = jnp.asarray(
            [0, off[0] * stride, off[1] * stride, off[2] * stride], jnp.int32
        )
        row, found = lookup_dense_table(
            table, coords + shift[None, :], mask, box, stride
        )
        rows.append(row.astype(jnp.int32))
        founds.append(found)
    return Rulebook(rows=jnp.stack(rows), found=jnp.stack(founds))


def conv_with_rulebook(
    feats: jnp.ndarray,       # [N, Cin] (masked)
    rb: Rulebook,
    weight: jnp.ndarray,      # [K, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Gather-matmul-accumulate sparse conv over a precomputed rulebook.

    The K kernel taps run as a ``lax.scan`` so every conv contributes one
    compiled tap body instead of K inlined gather+matmul pairs — with ~30
    convs of K=27 in the network this is the difference between minutes and
    seconds of XLA compile, and the per-tap matmul still saturates the MXU.
    """
    k, cin, cout = weight.shape
    cd = compute_dtype or feats.dtype
    f = feats.astype(cd)
    w = weight.astype(cd)
    n_out = rb.rows.shape[1]  # may differ from len(feats) for strided convs

    # Group taps per scan step: the f32 accumulator is the largest array in
    # the conv ([N, Cout]); with one tap per step it round-trips HBM K
    # times.  G unrolled taps per step fuse into one accumulator pass,
    # cutting that traffic by G while keeping compile size ~K/G bodies.
    group = 9 if k % 9 == 0 else (k if k <= 9 else 1)
    n_steps = k // group
    rows_g = rb.rows.reshape(n_steps, group, n_out)
    found_g = rb.found.reshape(n_steps, group, n_out)
    w_g = w.reshape(n_steps, group, cin, cout)

    def step(acc, inp):
        rows, found, wk = inp
        partial = 0.0
        for g in range(group):
            t = jnp.where(found[g][:, None], f[rows[g]], 0)
            partial = partial + jnp.dot(
                t, wk[g], preferred_element_type=jnp.float32
            )
        return acc + partial, None

    out0 = jnp.zeros((n_out, cout), jnp.float32)
    out, _ = jax.lax.scan(step, out0, (rows_g, found_g, w_g))
    if bias is not None:
        out = out + bias[None, :]
    return out


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """Static kernel offset list ``[K, 3]`` in stride units.

    Odd kernels are centred (e.g. ks=3 -> offsets in {-1, 0, 1}^3); even
    kernels are forward (ks=2 -> {0, 1}^3), matching MinkowskiEngine's
    convention for stride-2 down/up-sampling convolutions.
    """
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        rng = range(-r, r + 1)
    else:
        rng = range(kernel_size)
    return np.array(list(itertools.product(rng, rng, rng)), dtype=np.int32)


def submanifold_conv3d(
    grid: SparseGrid,
    box: Box,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
    rulebook: Optional[Rulebook] = None,
) -> SparseGrid:
    """Submanifold (stride-1) sparse conv: output coords == input coords.

    ``weight``: ``[K, Cin, Cout]`` with K = ks^3 ordered by
    :func:`kernel_offsets`.  Pass a precomputed ``rulebook`` to share the
    neighbour lookup between all convs on the same coordinates.
    """
    ks = round(weight.shape[0] ** (1.0 / 3.0))
    assert ks**3 == weight.shape[0], weight.shape
    if ks == 1:
        out = jnp.dot(
            grid.masked_feats().astype(compute_dtype or grid.feats.dtype),
            weight[0].astype(compute_dtype or grid.feats.dtype),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            out = out + bias[None, :]
    else:
        if rulebook is None:
            rulebook = build_rulebook(grid.coords, grid.mask, box, grid.stride, ks)
        out = conv_with_rulebook(
            grid.masked_feats(), rulebook, weight, bias, compute_dtype
        )
    out = jnp.where(grid.mask[:, None], out, 0).astype(grid.feats.dtype)
    return grid.with_feats(out)


def strided_conv3d(
    grid: SparseGrid,
    box: Box,
    weight: jnp.ndarray,
    out_capacity: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> SparseGrid:
    """Kernel-2 stride-2 downsampling conv (the encoder's down blocks,
    reference ``encoder_v2.py:124,133,142`` via ``BasicConvolutionBlock(ks=2,
    stride=2)``).

    Output coordinates are the unique parents ``floor(c / 2s) * 2s``; each
    parent gathers its up-to-8 children.
    """
    assert weight.shape[0] == 8, "strided_conv3d implements ks=2, stride=2"
    in_stride = grid.stride
    out_stride = in_stride * 2
    parent_xyz = (grid.coords[:, 1:] // out_stride) * out_stride
    parents = jnp.concatenate([grid.coords[:, :1], parent_xyz], axis=-1)
    out_coords, out_mask, _, _ = unique(
        parents, grid.mask, box, out_stride, out_capacity
    )

    table = build_dense_table(grid.coords, grid.mask, box, in_stride)
    offsets = kernel_offsets(2)
    rows, founds = [], []
    for k in range(8):
        off = offsets[k]
        shift = jnp.asarray(
            [0, off[0] * in_stride, off[1] * in_stride, off[2] * in_stride],
            jnp.int32,
        )
        row, found = lookup_dense_table(
            table, out_coords + shift[None, :], out_mask, box, in_stride
        )
        rows.append(row.astype(jnp.int32))
        founds.append(found)
    rb = Rulebook(rows=jnp.stack(rows), found=jnp.stack(founds))
    out = conv_with_rulebook(
        grid.masked_feats(), rb, weight, None, compute_dtype
    )
    if bias is not None:
        out = out + bias[None, :]
    out = jnp.where(out_mask[:, None], out, 0).astype(grid.feats.dtype)
    return SparseGrid(coords=out_coords, feats=out, mask=out_mask, stride=out_stride)


def generative_deconv3d(
    grid: SparseGrid,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> SparseGrid:
    """Kernel-2 stride-2 *generative* transposed conv.

    Every input voxel emits 8 children at ``c + offset * (stride/2)``; since
    a child determines its parent uniquely, the whole op is one matmul
    ``[N, Cin] @ [Cin, 8*Cout]`` plus a coordinate reshape.  Replacement for
    ``ME.MinkowskiConvolutionTranspose(ks=2, stride=2,
    expand_coordinates=True)`` (reference ``mink.py:520-534``).

    Output capacity is ``8 * input capacity``; callers prune/compact next.
    """
    assert weight.shape[0] == 8
    assert grid.stride % 2 == 0, "cannot upsample below stride 1"
    out_stride = grid.stride // 2
    n, c_in = grid.feats.shape
    c_out = weight.shape[-1]
    cd = compute_dtype or grid.feats.dtype
    w = weight.astype(cd).transpose(1, 0, 2).reshape(c_in, 8 * c_out)
    out = jnp.dot(grid.masked_feats().astype(cd), w, preferred_element_type=jnp.float32)
    out = out.reshape(n, 8, c_out)
    if bias is not None:
        out = out + bias[None, None, :]

    offsets = jnp.asarray(kernel_offsets(2), jnp.int32) * out_stride  # [8, 3]
    child_xyz = grid.coords[:, None, 1:] + offsets[None, :, :]  # [N, 8, 3]
    child_b = jnp.broadcast_to(grid.coords[:, None, :1], (n, 8, 1))
    out_coords = jnp.concatenate([child_b, child_xyz], axis=-1).reshape(n * 8, 4)
    out_mask = jnp.broadcast_to(grid.mask[:, None], (n, 8)).reshape(n * 8)
    out = jnp.where(out_mask[:, None], out.reshape(n * 8, c_out), 0)
    return SparseGrid(
        coords=out_coords,
        feats=out.astype(grid.feats.dtype),
        mask=out_mask,
        stride=out_stride,
    )


def sparse_max_pool(
    grid: SparseGrid,
    factor: int,
    box: Box,
    out_capacity: int,
) -> SparseGrid:
    """Non-overlapping max pooling with kernel = stride = ``factor``.

    Replacement for ``ME.MinkowskiMaxPooling`` as used to downscale attention
    masks (reference ``transformer_predictor_v2.py:100-102,233-238``).
    """
    out_stride = grid.stride * factor
    parent_xyz = (grid.coords[:, 1:] // out_stride) * out_stride
    parents = jnp.concatenate([grid.coords[:, :1], parent_xyz], axis=-1)
    out_coords, out_mask, seg_ids, out_feats = unique(
        parents,
        grid.mask,
        box,
        out_stride,
        out_capacity,
        feats=grid.masked_feats(),
        reduce="max",
    )
    return SparseGrid(
        coords=out_coords,
        feats=out_feats.astype(grid.feats.dtype),
        mask=out_mask,
        stride=out_stride,
    )


def lookup_features(
    src: SparseGrid,
    query_coords: jnp.ndarray,
    query_mask: jnp.ndarray,
    box: Box,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather ``src`` features at ``query_coords`` (same stride).

    Returns ``(feats [Nq, C], found [Nq])``; missing queries get zeros.  Used
    for U-Net skip connections: the reference adds sparse tensors on a shared
    coordinate manager (``decoder_v3.py:163``); here the encoder shortcut is
    looked up at the decoder's generated coordinates.
    """
    table = build_dense_table(src.coords, src.mask, box, src.stride)
    row, found = lookup_dense_table(
        table, query_coords, query_mask, box, src.stride
    )
    feats = jnp.where(found[:, None], src.feats[row], 0)
    return feats, found
