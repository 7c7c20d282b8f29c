"""Brute-force kNN + inverse-distance interpolation.

TPU replacement for the pykeops symbolic kNN used by ``knn_up``
(reference ``pasco/maskpls/interpolate.py:9-59``): voxel-to-point feature
upsampling by inverse-distance-weighted k nearest voxels.  The distance
matrix is computed in query tiles so memory stays bounded; `lax.top_k`
picks the neighbours — all MXU/VPU work, no codegen.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def knn(
    queries: jnp.ndarray,      # [M, 3]
    refs: jnp.ndarray,         # [N, 3]
    ref_mask: jnp.ndarray,     # [N]
    k: int,
    tile: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(distances [M, k], indices [M, k]) of the k nearest valid refs."""
    m = queries.shape[0]
    n_tiles = -(-m // tile)
    pad = n_tiles * tile - m
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    ref_sq = jnp.sum(refs * refs, axis=-1)
    big = jnp.asarray(1e30, refs.dtype)

    def one_tile(qt):
        d = (
            jnp.sum(qt * qt, axis=-1)[:, None]
            - 2 * qt @ refs.T
            + ref_sq[None, :]
        )
        d = jnp.where(ref_mask[None, :], d, big)
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx

    d, idx = jax.lax.map(one_tile, q.reshape(n_tiles, tile, -1))
    return d.reshape(-1, k)[:m], idx.reshape(-1, k)[:m]


def knn_up(
    voxel_coords: jnp.ndarray,   # [N, 3] float centers
    voxel_feats: jnp.ndarray,    # [N, C]
    voxel_mask: jnp.ndarray,     # [N]
    point_xyz: jnp.ndarray,      # [M, 3]
    k: int = 3,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-distance-weighted interpolation of voxel features onto
    points (reference ``knn_up``, ``interpolate.py:34-59``)."""
    d, idx = knn(point_xyz, voxel_coords, voxel_mask, k)
    w = 1.0 / (d + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = voxel_feats[idx]                    # [M, k, C]
    return jnp.sum(gathered * w[:, :, None], axis=1)
