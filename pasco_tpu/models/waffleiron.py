"""WaffleIron point-cloud segmentation backbone in JAX.

TPU-native re-design of the offline feature frontend
(reference ``WaffleIron_mod/waffleiron/{embedding,backbone,segmenter}.py``):
48 layers x 256 channels alternating

* SpatialMix: flatten points onto a cycling set of 2D grids (mean per
  cell), depthwise 3x3 FFN on the grid, inflate back to points.  The
  reference implements flatten/inflate with sparse COO ``bmm`` on CUDA
  (``backbone.py:22-41,85-98``); on TPU they are exactly
  ``jax.ops.segment_sum`` + a gather — no sparse kernels needed.
* ChannelMix: pointwise MLP with LayerScale.

Host-side preprocessing (neighbor indices for the embedding, per-grid 2D
cell indices) mirrors the reference ``PCDataset``
(``datasets/pc_dataset.py:108-189``) and uses scipy's cKDTree.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pasco_tpu.models.norm import MaskedBatchNorm


class Embedding(nn.Module):
    """Point + neighborhood embedding (reference ``embedding.py:20-64``)."""

    channels_out: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,          # [N, C_in]
        neighbors: jnp.ndarray,  # [K, N] indices (row 0 = the point itself)
        mask: jnp.ndarray,       # [N]
        train: bool,
    ) -> jnp.ndarray:
        x = MaskedBatchNorm(axis_name=self.axis_name, name="norm")(
            x, mask, train
        )
        point_emb = nn.Dense(self.channels_out, name="conv1")(x)

        # Relative neighbor features [K-1, N, C_in].
        neigh = x[neighbors[1:]] - x[None, :, :]
        flat = neigh.reshape(-1, x.shape[-1])
        nmask = jnp.broadcast_to(mask[None, :], neigh.shape[:2]).reshape(-1)
        h = MaskedBatchNorm(axis_name=self.axis_name, name="nbn1")(
            flat, nmask, train
        )
        h = nn.Dense(self.channels_out, use_bias=False, name="nconv1")(h)
        h = MaskedBatchNorm(axis_name=self.axis_name, name="nbn2")(
            h, nmask, train
        )
        h = nn.relu(h)
        h = nn.Dense(self.channels_out, use_bias=False, name="nconv2")(h)
        h = h.reshape(neigh.shape[0], neigh.shape[1], self.channels_out)
        neigh_emb = jnp.max(h, axis=0)

        out = nn.Dense(self.channels_out, name="final")(
            jnp.concatenate([point_emb, neigh_emb], axis=-1)
        )
        return jnp.where(mask[:, None], out, 0)


class ChannelMix(nn.Module):
    """tokens + LayerScale(MLP(BN(tokens))) (reference ``backbone.py:44-59``)."""

    channels: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, tokens, mask, train):
        h = MaskedBatchNorm(axis_name=self.axis_name, name="norm")(
            tokens, mask, train
        )
        h = nn.Dense(self.channels, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.channels, name="fc2")(h)
        scale = self.param(
            "layerscale", nn.initializers.ones, (self.channels,)
        )
        return tokens + jnp.where(mask[:, None], h * scale, 0)


class SpatialMix(nn.Module):
    """tokens + LayerScale(Inflate(FFN(Flatten(BN(tokens)))))
    (reference ``backbone.py:62-99``)."""

    channels: int
    grid_shape: Tuple[int, int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, tokens, cell_ind, mask, train):
        H, W = self.grid_shape
        n_cells = H * W
        h = MaskedBatchNorm(axis_name=self.axis_name, name="norm")(
            tokens, mask, train
        )
        # Flatten: mean of the points in every 2D cell.
        seg = jnp.where(mask, cell_ind, n_cells)
        sums = jax.ops.segment_sum(
            jnp.where(mask[:, None], h, 0), seg, num_segments=n_cells + 1
        )[:n_cells]
        counts = jax.ops.segment_sum(
            mask.astype(h.dtype), seg, num_segments=n_cells + 1
        )[:n_cells]
        grid = (sums / jnp.maximum(counts, 1e-6)[:, None]).reshape(H, W, -1)

        # Depthwise 3x3 -> ReLU -> depthwise 3x3 on the 2D grid.
        def depthwise(x, name):
            w = self.param(
                name, nn.initializers.lecun_normal(), (3, 3, 1, self.channels)
            )
            return jax.lax.conv_general_dilated(
                x[None],
                w,
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.channels,
            )[0]

        grid = depthwise(grid, "dw1")
        grid = nn.relu(grid)
        grid = depthwise(grid, "dw2")

        # Inflate: gather each point's cell value.
        flat = grid.reshape(n_cells, self.channels)
        inflated = flat[jnp.clip(cell_ind, 0, n_cells - 1)]
        scale = self.param(
            "layerscale", nn.initializers.ones, (self.channels,)
        )
        return tokens + jnp.where(mask[:, None], inflated * scale, 0)


class WaffleIron(nn.Module):
    channels: int = 256
    depth: int = 48
    grids_shape: Tuple[Tuple[int, int], ...] = ((250, 250), (250, 12), (250, 12))
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, tokens, cell_inds, mask, train):
        """tokens [N, C]; cell_inds [n_grids, N]; mask [N]."""
        g = len(self.grids_shape)
        for d in range(self.depth):
            tokens = SpatialMix(
                self.channels, self.grids_shape[d % g],
                axis_name=self.axis_name, name=f"smix{d}",
            )(tokens, cell_inds[d % g], mask, train)
            tokens = ChannelMix(
                self.channels, axis_name=self.axis_name, name=f"cmix{d}"
            )(tokens, mask, train)
        return tokens


class Segmenter(nn.Module):
    """Embedding -> WaffleIron -> 1x1 classifier; also returns the token
    embedding like the reference's "_mod" (``segmenter.py:21-35``)."""

    n_classes: int = 19
    channels: int = 256
    depth: int = 48
    in_channels: int = 5
    grids_shape: Tuple[Tuple[int, int], ...] = ((250, 250), (250, 12), (250, 12))
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, neighbors, cell_inds, mask, train=False):
        tokens = Embedding(
            self.channels, axis_name=self.axis_name, name="embed"
        )(feats, neighbors, mask, train)
        tokens = WaffleIron(
            self.channels, self.depth, self.grids_shape,
            axis_name=self.axis_name, name="waffleiron",
        )(tokens, cell_inds, mask, train)
        logits = nn.Dense(self.n_classes, name="classif")(tokens)
        return logits, tokens


# ---------------------------------------------------------------------------
# Host-side preprocessing (reference datasets/pc_dataset.py:108-189)
# ---------------------------------------------------------------------------


def knn_indices(xyz: np.ndarray, k: int = 16) -> np.ndarray:
    """[K, N] nearest-neighbor indices (row 0 = self) via cKDTree."""
    from scipy.spatial import cKDTree

    tree = cKDTree(xyz)
    _, idx = tree.query(xyz, k=k)
    return idx.T.astype(np.int32)


def grid_cell_indices(
    xyz: np.ndarray,
    grids_shape: Sequence[Tuple[int, int]] = ((250, 250), (250, 12), (250, 12)),
    fov: float = 50.0,
    z_range: Tuple[float, float] = (-3.0, 2.0),
) -> np.ndarray:
    """Per-point flat 2D cell index for every projection grid: the cycling
    planes are (x, y), (x, z), (y, z)."""
    planes = [(0, 1), (0, 2), (1, 2)]
    lo = np.array([-fov, -fov, z_range[0]])
    hi = np.array([fov, fov, z_range[1]])
    out = []
    for (a, b), (H, W) in zip(planes, grids_shape):
        ia = np.clip(
            ((xyz[:, a] - lo[a]) / (hi[a] - lo[a]) * H).astype(np.int64), 0, H - 1
        )
        ib = np.clip(
            ((xyz[:, b] - lo[b]) / (hi[b] - lo[b]) * W).astype(np.int64), 0, W - 1
        )
        out.append(ia * W + ib)
    return np.stack(out).astype(np.int32)
