"""TPU-native sparse voxel substrate.

This module replaces the MinkowskiEngine sparse-tensor engine used by the
reference implementation (see /root/reference MinkowskiEngine usage, e.g.
`pasco/maskpls/mink.py`, `pasco/models/decoder_v3.py`) with an XLA-friendly
design:

* A :class:`SparseGrid` is a *padded, static-capacity* set of voxels:
  ``coords`` (int32 ``[N, 4]`` rows of ``(batch, x, y, z)``), ``feats``
  (``[N, C]``), and a validity ``mask`` (``[N]`` bool).  All shapes are static
  so that every model configuration compiles exactly once; the varying voxel
  count per LiDAR scan only changes the mask.  The reference itself imposes
  hard voxel-count caps (``occ_thres`` in ``decoder_v3.py:210-235``), so the
  static capacities are the same quantity made explicit.

* Voxel coordinates are linearised into int32 *keys* relative to a
  :class:`Box` (dynamic minimum corner, static extents).  Sorted keys +
  ``searchsorted`` provide O(log N) hash-free neighbour lookup, which is how
  the convolution "rulebooks" (kernel maps) of MinkowskiEngine are expressed
  as pure gathers on TPU.

Everything here is shape-polymorphic only in the *capacity* parameters, which
are Python ints fixed by the model config.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

# Sentinel for linear keys of invalid / out-of-box voxels.  Using int32 max
# makes invalid entries sort to the end of the table.
INVALID_KEY = jnp.iinfo(jnp.int32).max


class Box(struct.PyTreeNode):
    """An axis-aligned voxel box: dynamic min corner, static extents.

    ``minimum`` is a dynamic ``[3]`` int32 array (stride-1 voxel units).
    ``extent`` is a static python tuple giving the box size in stride-1 voxel
    units.  Linear keys are only comparable when built from the same box.
    """

    minimum: jnp.ndarray  # [3] int32, dynamic
    extent: Tuple[int, int, int] = struct.field(pytree_node=False)

    @staticmethod
    def create(minimum, extent: Sequence[int]) -> "Box":
        return Box(
            minimum=jnp.asarray(minimum, jnp.int32),
            extent=tuple(int(e) for e in extent),
        )

    def extent_at(self, stride: int) -> Tuple[int, int, int]:
        return tuple(-(-e // stride) for e in self.extent)

    def num_cells(self, stride: int, batch_size: int) -> int:
        ex, ey, ez = self.extent_at(stride)
        return batch_size * ex * ey * ez


class SparseGrid(struct.PyTreeNode):
    """Padded sparse voxel set with static capacity.

    Invalid rows (``mask == False``) may hold arbitrary coordinate/feature
    data; every consumer must go through the mask.  ``stride`` is the tensor
    stride (voxel size multiplier) exactly as in MinkowskiEngine: coordinates
    are stored in stride-1 units and are multiples of ``stride``.
    """

    coords: jnp.ndarray  # [N, 4] int32: (b, x, y, z)
    feats: jnp.ndarray  # [N, C]
    mask: jnp.ndarray  # [N] bool
    stride: int = struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    def with_feats(self, feats: jnp.ndarray) -> "SparseGrid":
        return self.replace(feats=feats)

    def masked_feats(self) -> jnp.ndarray:
        return jnp.where(self.mask[:, None], self.feats, 0)


def make_grid(coords, feats, mask=None, stride: int = 1) -> SparseGrid:
    coords = jnp.asarray(coords, jnp.int32)
    feats = jnp.asarray(feats)
    if mask is None:
        mask = jnp.ones((coords.shape[0],), jnp.bool_)
    return SparseGrid(coords=coords, feats=feats, mask=mask, stride=stride)


# ---------------------------------------------------------------------------
# Linear keys and lookup tables
# ---------------------------------------------------------------------------


def linear_keys(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    box: Box,
    stride: int,
) -> jnp.ndarray:
    """Linearise ``(b, x, y, z)`` coordinates into sortable int32 keys.

    Coordinates outside the box (or masked out) map to :data:`INVALID_KEY`.
    The caller must guarantee ``batch * prod(extent_at(stride))`` fits int32,
    which holds for all PaSCo configurations (scene <= 384^2 x 64, batch <= 4).
    """
    ex, ey, ez = box.extent_at(stride)
    rel = (coords[:, 1:] - box.minimum[None, :]) // stride
    in_box = (
        (rel[:, 0] >= 0)
        & (rel[:, 0] < ex)
        & (rel[:, 1] >= 0)
        & (rel[:, 1] < ey)
        & (rel[:, 2] >= 0)
        & (rel[:, 2] < ez)
        & mask
    )
    key = ((coords[:, 0] * ex + rel[:, 0]) * ey + rel[:, 1]) * ez + rel[:, 2]
    return jnp.where(in_box, key, INVALID_KEY)


def build_table(keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort keys for subsequent :func:`lookup`.

    Returns ``(sorted_keys, perm)`` with ``sorted_keys = keys[perm]``.
    """
    perm = jnp.argsort(keys)
    return keys[perm], perm


def lookup(
    sorted_keys: jnp.ndarray,
    perm: jnp.ndarray,
    query_keys: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find each query key in the table.

    Returns ``(row, found)`` where ``row`` indexes the original (unsorted)
    array; rows for missing keys are 0 and must be guarded with ``found``.
    """
    pos = jnp.searchsorted(sorted_keys, query_keys)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    found = (sorted_keys[pos] == query_keys) & (query_keys != INVALID_KEY)
    row = jnp.where(found, perm[pos], 0)
    return row, found


# ---------------------------------------------------------------------------
# Compaction / pruning
# ---------------------------------------------------------------------------


def compact(grid: SparseGrid, keep: jnp.ndarray, capacity: int) -> SparseGrid:
    """Keep only ``keep & mask`` rows, packed to the front, within ``capacity``.

    This is the TPU equivalent of ``MinkowskiPruning`` (reference
    ``decoder_v3.py:285,421-432``): a stable masked compaction.  If more than
    ``capacity`` rows survive, the surplus (highest original index) is
    dropped.
    """
    keep = keep & grid.mask
    n = grid.capacity
    # Stable order: kept rows first, in original order.
    order_key = jnp.where(keep, jnp.arange(n), n + jnp.arange(n))
    order = jnp.argsort(order_key)[:capacity]
    new_mask = keep[order] & (jnp.arange(capacity) < jnp.sum(keep))
    return SparseGrid(
        coords=grid.coords[order],
        feats=grid.feats[order],
        mask=new_mask,
        stride=grid.stride,
    )


def top_k_compact(
    grid: SparseGrid,
    scores: jnp.ndarray,
    keep: jnp.ndarray,
    capacity: int,
) -> SparseGrid:
    """Compaction that keeps at most ``capacity`` rows, preferring high scores.

    Mirrors the reference's voxel-cap logic (``decoder_v3.py:347-377``): when
    the number of kept voxels exceeds the cap, the top-``capacity`` by score
    survive (the reference samples via ``torch.multinomial`` during training
    and caps with topk otherwise; we use deterministic top-k, which matches
    its test-time behaviour).
    """
    keep = keep & grid.mask
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    ranked = jnp.where(keep, scores, neg_inf)
    order = jnp.argsort(-ranked)[:capacity]
    new_mask = keep[order]
    return SparseGrid(
        coords=grid.coords[order],
        feats=grid.feats[order],
        mask=new_mask,
        stride=grid.stride,
    )


def prune_outside_box(
    grid: SparseGrid, min_c: jnp.ndarray, max_c: jnp.ndarray
) -> SparseGrid:
    """Mask out voxels outside [min_c, max_c] (inclusive).

    Equivalent of reference ``prune_outside_coords`` (``misc.py:16-27``), but
    in-place on the mask (no re-packing; callers compact when they change
    capacity).
    """
    c = grid.coords[:, 1:]
    keep = jnp.all((c >= min_c[None, :]) & (c <= max_c[None, :]), axis=-1)
    return grid.replace(mask=grid.mask & keep)


# ---------------------------------------------------------------------------
# Deduplication (unique coordinates)
# ---------------------------------------------------------------------------


def unique(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    box: Box,
    stride: int,
    capacity: int,
    feats: Optional[jnp.ndarray] = None,
    reduce: str = "max",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate coordinates, optionally reducing features per unique cell.

    Returns ``(unique_coords [capacity,4], unique_mask [capacity],
    seg_ids [N], out_feats or None)`` where ``seg_ids[i]`` is the output row
    of input ``i`` (== ``capacity`` for dropped/invalid inputs, usable with
    segment ops that drop out-of-range ids).

    The TPU replacement for ``torch.unique(..., dim=0)`` +
    ``torch_scatter.scatter_max`` (reference ``unet3d_sparse_v2.py:72-79``)
    and for MinkowskiEngine coordinate-map construction.
    """
    keys = linear_keys(coords, mask, box, stride)
    order = jnp.argsort(keys)
    sk = keys[order]
    valid = sk != INVALID_KEY
    is_first = jnp.concatenate([valid[:1], (sk[1:] != sk[:-1]) & valid[1:]])
    seg_sorted = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    n_unique = seg_sorted[-1] + 1
    # Dropped rows (invalid or beyond capacity) get segment id == capacity.
    seg_sorted = jnp.where(valid & (seg_sorted < capacity), seg_sorted, capacity)

    # Map back to the original (unsorted) row order.
    seg_ids = jnp.zeros_like(seg_sorted).at[order].set(seg_sorted)

    # First-occurrence coordinates for every unique cell.
    first_rows = jnp.where(is_first & (seg_sorted < capacity), seg_sorted, capacity)
    unique_coords = (
        jnp.zeros((capacity + 1, 4), jnp.int32)
        .at[first_rows].set(coords[order], mode="drop")[:capacity]
    )
    unique_mask = jnp.arange(capacity) < jnp.minimum(n_unique, capacity)

    out_feats = None
    if feats is not None:
        f_sorted = feats[order]
        if reduce == "max":
            out_feats = jax.ops.segment_max(
                jnp.where(valid[:, None], f_sorted, -jnp.inf),
                seg_sorted,
                num_segments=capacity,
            )
            out_feats = jnp.where(unique_mask[:, None], out_feats, 0)
        elif reduce == "sum":
            out_feats = jax.ops.segment_sum(
                jnp.where(valid[:, None], f_sorted, 0),
                seg_sorted,
                num_segments=capacity,
            )
        elif reduce == "mean":
            sums = jax.ops.segment_sum(
                jnp.where(valid[:, None], f_sorted, 0),
                seg_sorted,
                num_segments=capacity,
            )
            counts = jax.ops.segment_sum(
                valid.astype(f_sorted.dtype), seg_sorted, num_segments=capacity
            )
            out_feats = sums / jnp.maximum(counts, 1)[:, None]
        else:
            raise ValueError(f"unknown reduce: {reduce}")

    return unique_coords, unique_mask, seg_ids, out_feats


# ---------------------------------------------------------------------------
# Dense <-> sparse
# ---------------------------------------------------------------------------


def to_dense(
    grid: SparseGrid, box: Box, batch_size: int, fill: float = 0.0
) -> jnp.ndarray:
    """Scatter a sparse grid into a dense ``[B, X, Y, Z, C]`` tensor.

    Equivalent of ``SparseTensor.dense()`` (reference
    ``unet3d_sparse_v2.py:196-202``) with channels-last layout (TPU
    convolution-friendly).
    """
    ex, ey, ez = box.extent_at(grid.stride)
    rel = (grid.coords[:, 1:] - box.minimum[None, :]) // grid.stride
    b = grid.coords[:, 0]
    dense = jnp.full((batch_size, ex, ey, ez, grid.num_channels), fill, grid.feats.dtype)
    # Invalid rows are routed out of range and dropped.
    b = jnp.where(grid.mask, b, batch_size)
    dense = dense.at[b, rel[:, 0], rel[:, 1], rel[:, 2]].set(
        grid.feats, mode="drop"
    )
    return dense


def from_dense(
    dense: jnp.ndarray,
    box: Box,
    stride: int,
    capacity: int,
    keep: Optional[jnp.ndarray] = None,
) -> SparseGrid:
    """Sparsify a dense ``[B, X, Y, Z, C]`` tensor.

    ``keep`` (``[B, X, Y, Z]`` bool) selects which cells become voxels; by
    default every cell with any non-zero channel is kept, matching
    ``ME.to_sparse`` semantics (reference ``unet3d_sparse_v2.py:202``).
    The result is compacted to ``capacity``.
    """
    bsz, ex, ey, ez, ch = dense.shape
    if keep is None:
        keep = jnp.any(dense != 0, axis=-1)
    bb, xx, yy, zz = jnp.meshgrid(
        jnp.arange(bsz), jnp.arange(ex), jnp.arange(ey), jnp.arange(ez),
        indexing="ij",
    )
    coords = jnp.stack(
        [
            bb.reshape(-1),
            xx.reshape(-1) * stride + box.minimum[0],
            yy.reshape(-1) * stride + box.minimum[1],
            zz.reshape(-1) * stride + box.minimum[2],
        ],
        axis=-1,
    ).astype(jnp.int32)
    grid = SparseGrid(
        coords=coords,
        feats=dense.reshape(-1, ch),
        mask=keep.reshape(-1),
        stride=stride,
    )
    if capacity == grid.capacity:
        return grid
    return compact(grid, grid.mask, capacity)


def gather_dense(
    dense: jnp.ndarray,
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    box: Box,
    stride: int,
) -> jnp.ndarray:
    """Read dense ``[B, X, Y, Z, ...]`` values at sparse coordinates.

    Out-of-box / masked lookups return 0.
    """
    ex, ey, ez = box.extent_at(stride)
    rel = (coords[:, 1:] - box.minimum[None, :]) // stride
    in_box = (
        (rel[:, 0] >= 0) & (rel[:, 0] < ex)
        & (rel[:, 1] >= 0) & (rel[:, 1] < ey)
        & (rel[:, 2] >= 0) & (rel[:, 2] < ez)
        & mask
    )
    rel = jnp.clip(rel, 0, jnp.asarray([ex - 1, ey - 1, ez - 1]))
    vals = dense[coords[:, 0], rel[:, 0], rel[:, 1], rel[:, 2]]
    shape = (vals.shape[0],) + (1,) * (vals.ndim - 1)
    return jnp.where(in_box.reshape(shape), vals, 0)


# ---------------------------------------------------------------------------
# Batched helpers
# ---------------------------------------------------------------------------


def batch_offsets(grid: SparseGrid, batch_size: int) -> jnp.ndarray:
    """Per-row batch index clipped for segment ops (invalid -> batch_size)."""
    return jnp.where(grid.mask, grid.coords[:, 0], batch_size)


def global_pool(grid: SparseGrid, batch_size: int, reduce: str = "mean") -> jnp.ndarray:
    """Masked global pooling per batch item -> ``[B, C]``.

    Equivalent of ``MinkowskiGlobalPooling`` (reference ``mink.py:27,63``).
    """
    seg = batch_offsets(grid, batch_size)
    feats = grid.masked_feats()
    if reduce == "mean":
        sums = jax.ops.segment_sum(feats, seg, num_segments=batch_size)
        counts = jax.ops.segment_sum(
            grid.mask.astype(feats.dtype), seg, num_segments=batch_size
        )
        return sums / jnp.maximum(counts, 1)[:, None]
    if reduce == "max":
        out = jax.ops.segment_max(
            jnp.where(grid.mask[:, None], grid.feats, -jnp.inf),
            seg,
            num_segments=batch_size,
        )
        return jnp.where(jnp.isfinite(out), out, 0)
    raise ValueError(reduce)
