"""Point-to-voxel featurizer and MIMO input fusion.

TPU-native equivalents of:

* ``CylinderFeat`` (reference ``pasco/models/unet3d_sparse_v2.py:15-86``):
  per-point MLP -> ``torch.unique`` on (subnet, x, y, z) ->
  ``torch_scatter.scatter_max`` pooling into unique voxels.  Here the
  unique+pool is one sort-based :func:`pasco_tpu.core.sparse.unique` with a
  ``segment_max`` reduction — the op the BASELINE north star calls out.

* ``Augmenter.merge`` (reference ``pasco/models/augmenter.py:13-27``): the
  MIMO input trick.  The reference densifies the n_subnets-batch sparse
  tensor and concatenates subnets along channels to get ONE batch-1 sparse
  tensor with ``n_infers * f`` channels on the *union* of subnet coords.
  Densifying a 256^2x32 grid just to take a union is wasteful on TPU; we
  compute the union directly with a second dense-table unique and scatter
  each subnet's features into its channel block.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pasco_tpu.core.sparse import Box, SparseGrid, unique
from pasco_tpu.models.norm import MaskedBatchNorm


class CylinderFeat(nn.Module):
    """Per-point MLP + max-pooling into per-subnet voxels.

    Input points carry ``coords [P, 4]`` rows of ``(subnet, x, y, z)`` and
    ``feats [P, in_ch]`` with a validity ``mask [P]``; all subnets'
    points are concatenated in one padded array (the reference concatenates
    per-batch lists the same way, ``unet3d_sparse_v2.py:57-64``).
    """

    out_dim: int = 64
    voxel_capacity: int = 131072
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        point_feats: jnp.ndarray,   # [P, in_ch]
        point_coords: jnp.ndarray,  # [P, 4] (subnet, x, y, z)
        point_mask: jnp.ndarray,    # [P] bool
        box: Box,
        n_infers: int,
        train: bool,
    ) -> SparseGrid:
        bn = lambda name: MaskedBatchNorm(axis_name=self.axis_name, name=name)
        f = bn("bn_in")(point_feats, point_mask, train)
        f = nn.Dense(64, name="fc1")(f)
        f = nn.relu(bn("bn1")(f, point_mask, train))
        f = nn.Dense(128, name="fc2")(f)
        f = nn.relu(bn("bn2")(f, point_mask, train))
        f = nn.Dense(256, name="fc3")(f)
        f = nn.relu(bn("bn3")(f, point_mask, train))
        f = nn.Dense(self.out_dim, name="fc4")(f)
        f = jnp.where(point_mask[:, None], f, 0)

        # Per-(subnet, voxel) unique + max-pool.  The subnet id rides in the
        # batch column, exactly as the reference pads batch indices into the
        # unique key (``unet3d_sparse_v2.py:58-74``).
        coords, mask, _, feats = unique(
            point_coords,
            point_mask,
            box,
            stride=1,
            capacity=self.voxel_capacity,
            feats=f,
            reduce="max",
            max_batch=n_infers,
        )
        return SparseGrid(coords=coords, feats=feats, mask=mask, stride=1)


def mimo_merge(
    per_subnet: SparseGrid,
    box: Box,
    n_infers: int,
    out_capacity: int,
) -> SparseGrid:
    """Fuse the per-subnet voxel grid into one batch-1 MIMO tensor.

    ``per_subnet`` holds voxels of all subnets, the subnet index in the
    batch column.  Output: batch-1 grid on the union of subnet coords with
    ``n_infers * C`` channels; subnet i's features occupy channel block
    ``[i*C, (i+1)*C)`` and are zero where subnet i has no voxel — identical
    to the reference dense concat (``augmenter.py:17-27``) without the
    densify round-trip.
    """
    c = per_subnet.num_channels
    union_coords_in = per_subnet.coords.at[:, 0].set(0)
    union_coords, union_mask, seg_ids, _ = unique(
        union_coords_in, per_subnet.mask, box, per_subnet.stride, out_capacity
    )
    subnet = jnp.clip(per_subnet.coords[:, 0], 0, n_infers - 1)
    out = jnp.zeros((out_capacity + 1, n_infers * c), per_subnet.feats.dtype)
    # Column block of each row = its subnet; at most one row per (cell,
    # subnet) after the per-subnet unique, so a scatter-add is exact.
    col_one_hot = jax.nn.one_hot(subnet, n_infers, dtype=per_subnet.feats.dtype)
    contrib = (
        col_one_hot[:, :, None] * per_subnet.masked_feats()[:, None, :]
    ).reshape(-1, n_infers * c)
    out = out.at[seg_ids].add(contrib, mode="drop")
    return SparseGrid(
        coords=union_coords,
        feats=out[:out_capacity],
        mask=union_mask,
        stride=per_subnet.stride,
    )
