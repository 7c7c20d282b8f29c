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
  :class:`Box` (dynamic minimum corner, static extents).  Because the box is
  bounded, a dense cell->row table (one scatter to build, one gather per
  probe) provides O(1) neighbour lookup; the convolution "rulebooks"
  (kernel maps) of MinkowskiEngine become pure gathers on TPU.  Sorted-key
  ``searchsorted`` lookup is kept as an alternative for unbounded domains.

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
# Dense cell tables: O(1) lookup, no sorting
# ---------------------------------------------------------------------------
#
# The working box is bounded (e.g. 384x384x64 = 9.4M stride-1 cells), so a
# dense int32 cell -> row table costs a few tens of MB and turns every
# neighbour lookup into a single gather.  This beats sorted-key binary
# search on TPU in both runtime (one gather vs log N probes) and compile
# time (this backend compiles each sort/searchsorted at ~10-20 s).


def build_dense_table(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    box: Box,
    stride: int,
) -> jnp.ndarray:
    """cell -> row index table (``-1`` = empty).

    The batch column is ignored (tables are per batch item / per subnet;
    callers on batched grids vmap over the leading axis).
    """
    ex, ey, ez = box.extent_at(stride)
    n_cells = ex * ey * ez
    c0 = coords.at[:, 0].set(0)
    keys = linear_keys(c0, mask, box, stride)
    n = coords.shape[0]
    table = jnp.full((n_cells,), -1, jnp.int32)
    safe = jnp.where(keys == INVALID_KEY, n_cells, keys)
    return table.at[safe].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )


def lookup_dense_table(
    table: jnp.ndarray,
    query_coords: jnp.ndarray,
    query_mask: jnp.ndarray,
    box: Box,
    stride: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(row, found) for each query coordinate via the dense table."""
    c0 = query_coords.at[:, 0].set(0)
    keys = linear_keys(c0, query_mask, box, stride)
    n_cells = table.shape[0]
    safe = jnp.clip(keys, 0, n_cells - 1)
    row = table[safe]
    found = (keys != INVALID_KEY) & (row >= 0)
    return jnp.where(found, row, 0), found


# ---------------------------------------------------------------------------
# Compaction / pruning
# ---------------------------------------------------------------------------


def compact(grid: SparseGrid, keep: jnp.ndarray, capacity: int) -> SparseGrid:
    """Keep only ``keep & mask`` rows, packed to the front, within ``capacity``.

    This is the TPU equivalent of ``MinkowskiPruning`` (reference
    ``decoder_v3.py:285,421-432``): a stable masked compaction implemented
    as prefix-sum + scatter (no sort).  If more than ``capacity`` rows
    survive, the surplus (highest original index) is dropped.
    """
    keep = keep & grid.mask
    n = grid.capacity
    # Index-scatter + gather: scatter only the 4-byte source index of each
    # kept row to its prefix-sum slot, then gather payloads.  Payload
    # scatters run at a few GB/s on TPU and searchsorted lowers to a slow
    # while-loop; this form keeps both costs negligible.
    new_pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    total = new_pos[-1] + 1
    dest = jnp.where(keep & (new_pos < capacity), new_pos, capacity)
    src = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[dest].set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:capacity]
    )
    new_mask = jnp.arange(capacity) < jnp.minimum(total, capacity)
    coords = jnp.where(new_mask[:, None], grid.coords[src], 0)
    feats = jnp.where(new_mask[:, None], grid.feats[src], 0)
    return SparseGrid(coords=coords, feats=feats, mask=new_mask, stride=grid.stride)


def top_k_compact(
    grid: SparseGrid,
    scores: jnp.ndarray,
    keep: jnp.ndarray,
    capacity: int,
) -> SparseGrid:
    """Compaction that keeps at most ``capacity`` rows, preferring high scores.

    Mirrors the reference's voxel-cap logic (``decoder_v3.py:347-377``): when
    the number of kept voxels exceeds the cap, the top-``capacity`` by score
    survive.  The reference samples via ``torch.multinomial`` during
    training and caps by topk at test time; callers reproduce BOTH — the
    decoder adds Gumbel noise to the log-scores in train mode before
    calling this (``models/decoder.py:255-259``; Gumbel-top-k == weighted
    sampling without replacement), and passes raw scores at eval, which
    makes this deterministic top-k — so this function itself stays
    sampling-free.
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
    max_batch: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate coordinates, optionally reducing features per unique cell.

    Returns ``(unique_coords [capacity,4], unique_mask [capacity],
    seg_ids [N], out_feats or None)`` where ``seg_ids[i]`` is the output row
    of input ``i`` (== ``capacity`` for dropped/invalid inputs, usable with
    segment ops that drop out-of-range ids).

    The TPU replacement for ``torch.unique(..., dim=0)`` +
    ``torch_scatter.scatter_max`` (reference ``unet3d_sparse_v2.py:72-79``)
    and for MinkowskiEngine coordinate-map construction.

    Sort-free: a dense cell table elects one representative row per cell
    (scatter-min), compact ids follow first-occurrence row order via a
    prefix sum, and features reduce with ``segment_*`` on the resulting
    segment ids.  (Unique cells are therefore ordered by first occurrence,
    not by spatial key — nothing downstream depends on the order.)
    """
    n = coords.shape[0]
    keys = linear_keys(coords, mask, box, stride)
    ex, ey, ez = box.extent_at(stride)
    # Keys include the batch column; ``max_batch`` bounds its range (the
    # dense tables grow linearly with it).
    n_cells = max_batch * ex * ey * ez
    valid = keys != INVALID_KEY
    safe = jnp.where(valid, keys, n_cells)

    rep = (
        jnp.full((n_cells + 1,), n, jnp.int32)
        .at[safe].min(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    is_first = valid & (rep[jnp.clip(safe, 0, n_cells)] == jnp.arange(n))
    order_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    n_unique = jnp.sum(is_first.astype(jnp.int32))

    seg_table = (
        jnp.zeros((n_cells + 1,), jnp.int32)
        .at[jnp.where(is_first, safe, n_cells)]
        .set(jnp.where(order_id < capacity, order_id, capacity), mode="drop")
    )
    seg_ids = jnp.where(valid, seg_table[jnp.clip(safe, 0, n_cells)], capacity)

    dest = jnp.where(is_first & (order_id < capacity), order_id, capacity)
    unique_coords = (
        jnp.zeros((capacity + 1, 4), jnp.int32)
        .at[dest].set(coords, mode="drop")[:capacity]
    )
    unique_mask = jnp.arange(capacity) < jnp.minimum(n_unique, capacity)

    out_feats = None
    if feats is not None:
        if reduce == "max":
            out_feats = jax.ops.segment_max(
                jnp.where(valid[:, None], feats, -jnp.inf),
                seg_ids,
                num_segments=capacity,
            )
            out_feats = jnp.where(
                unique_mask[:, None] & jnp.isfinite(out_feats), out_feats, 0
            )
        elif reduce == "sum":
            out_feats = jax.ops.segment_sum(
                jnp.where(valid[:, None], feats, 0),
                seg_ids,
                num_segments=capacity,
            )
        elif reduce == "mean":
            sums = jax.ops.segment_sum(
                jnp.where(valid[:, None], feats, 0),
                seg_ids,
                num_segments=capacity,
            )
            counts = jax.ops.segment_sum(
                valid.astype(feats.dtype), seg_ids, num_segments=capacity
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
