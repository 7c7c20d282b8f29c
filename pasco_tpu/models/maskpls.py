"""MaskPLS legacy building blocks and U-Net (auxiliary path).

TPU-native equivalents of the remaining ``pasco/maskpls/mink.py`` blocks
that the PaSCo main path does not use but the reference ships: ``ASPP``
(``mink.py:11-49``), post-activation ``ResidualBlockOriginal``
(``mink.py:577-616``), ``BasicDeconvolutionBlock`` (non-generative
transposed conv, ``mink.py:537-549``), and the ``MinkEncoderDecoder``
U-Net (``mink.py:79-502``) whose forward interpolates voxel features back
onto the input points with inverse-distance kNN (``knn_up``) and
pad-batches per-cloud features.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pasco_tpu.core.sparse import Box, SparseGrid, global_pool
from pasco_tpu.models.blocks import (
    BasicConvBlock,
    SparseConv,
    SparseGenerativeDeconv,
)
from pasco_tpu.models.norm import MaskedBatchNorm
from pasco_tpu.ops.knn import knn_up
from pasco_tpu.ops.sparse_conv import build_rulebook


class ResidualBlockOriginal(nn.Module):
    """Post-activation residual block (reference ``mink.py:577-616``):
    Conv-BN-ReLU-Conv-BN + (1x1-BN skip) -> ReLU."""

    out_channels: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: SparseGrid, box: Box, train: bool) -> SparseGrid:
        rb = build_rulebook(grid.coords, grid.mask, box, grid.stride, 3)
        in_ch = grid.num_channels
        if in_ch == self.out_channels:
            skip = grid.feats
        else:
            s = SparseConv(
                self.out_channels, 1, compute_dtype=self.compute_dtype,
                name="down_conv",
            )(grid, box)
            skip = MaskedBatchNorm(axis_name=self.axis_name, name="down_bn")(
                s.feats, s.mask, train
            )
        g = SparseConv(
            self.out_channels, 3, compute_dtype=self.compute_dtype, name="conv1"
        )(grid, box, rb)
        f = MaskedBatchNorm(axis_name=self.axis_name, name="bn1")(
            g.feats, g.mask, train
        )
        g = g.with_feats(jnp.where(g.mask[:, None], nn.relu(f), 0))
        g = SparseConv(
            self.out_channels, 3, compute_dtype=self.compute_dtype, name="conv2"
        )(g, box, rb)
        f = MaskedBatchNorm(axis_name=self.axis_name, name="bn2")(
            g.feats, g.mask, train
        )
        out = nn.relu(f + skip)
        return g.with_feats(jnp.where(g.mask[:, None], out, 0))


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling over a sparse grid
    (reference ``mink.py:11-49``): parallel dilated 3x3 branches + global
    pooled branch, concatenated and projected."""

    out_channels: int
    dilations: Sequence[int] = (1, 2, 3)
    batch_size: int = 1
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: SparseGrid, box: Box, train: bool) -> SparseGrid:
        branches = []
        for d in self.dilations:
            # Dilated conv: same rulebook machinery with stretched offsets.
            from pasco_tpu.ops.sparse_conv import Rulebook, kernel_offsets
            from pasco_tpu.core.sparse import build_dense_table, lookup_dense_table

            table = build_dense_table(grid.coords, grid.mask, box, grid.stride)
            offsets = kernel_offsets(3) * d
            rows, founds = [], []
            for k in range(27):
                off = offsets[k]
                shift = jnp.asarray(
                    [0, off[0] * grid.stride, off[1] * grid.stride,
                     off[2] * grid.stride], jnp.int32,
                )
                row, found = lookup_dense_table(
                    table, grid.coords + shift[None, :], grid.mask, box,
                    grid.stride,
                )
                rows.append(row)
                founds.append(found)
            rb = Rulebook(jnp.stack(rows), jnp.stack(founds))
            b = SparseConv(
                self.out_channels, 3, compute_dtype=self.compute_dtype,
                name=f"branch_d{d}",
            )(grid, box, rb)
            branches.append(b.feats)
        pooled = global_pool(grid, self.batch_size, reduce="mean")
        pooled = nn.Dense(self.out_channels, name="pool_proj")(pooled)
        gate = pooled[jnp.clip(grid.coords[:, 0], 0, self.batch_size - 1)]
        branches.append(gate.astype(grid.feats.dtype))
        cat = jnp.concatenate(branches, axis=-1)
        out = nn.Dense(self.out_channels, name="proj")(cat)
        return grid.with_feats(jnp.where(grid.mask[:, None], out, 0))


class MaskPLSEncoderDecoder(nn.Module):
    """Compact MaskPLS-style sparse U-Net (reference
    ``MinkEncoderDecoder``, ``mink.py:79-502``): encoder stages with
    post-act residual blocks, generative decoder stages, then kNN
    interpolation of multi-scale voxel features back onto the points."""

    channels: Sequence[int] = (32, 64, 128, 256)
    out_dim: int = 256
    capacities: Sequence[int] = (65536, 32768, 16384, 8192)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        grid: SparseGrid,
        box: Box,
        point_xyz: jnp.ndarray,     # [M, 3] float (voxel units)
        train: bool = False,
    ) -> Tuple[jnp.ndarray, List[SparseGrid]]:
        ch = self.channels
        x = SparseConv(ch[0], 1, name="stem")(grid, box)
        feats = [x]
        for i in range(1, len(ch)):
            x = BasicConvBlock(
                ch[i], self.capacities[i], extra_norm=False,
                axis_name=self.axis_name, name=f"down{i}",
            )(x, box, train)
            x = ResidualBlockOriginal(
                ch[i], axis_name=self.axis_name, name=f"res{i}"
            )(x, box, train)
            feats.append(x)

        outs = []
        for i in range(len(ch) - 1, 0, -1):
            up = SparseGenerativeDeconv(ch[i - 1], name=f"up{i}")(x)
            # Keep only voxels that existed at the finer scale.
            from pasco_tpu.ops.sparse_conv import lookup_features

            skip_f, found = lookup_features(feats[i - 1], up.coords, up.mask, box)
            up = up.replace(
                feats=up.feats + skip_f.astype(up.feats.dtype),
                mask=up.mask & found,
            )
            from pasco_tpu.core.sparse import compact

            x = compact(up, up.mask, feats[i - 1].capacity)
            x = x.replace(stride=feats[i - 1].stride)
            outs.append(x)

        final = outs[-1]
        pt_feats = knn_up(
            final.coords[:, 1:].astype(jnp.float32),
            nn.Dense(self.out_dim, name="out_proj")(
                final.feats.astype(jnp.float32)
            ),
            final.mask,
            point_xyz.astype(jnp.float32),
        )
        return pt_feats, outs
