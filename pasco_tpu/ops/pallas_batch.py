"""Batching (vmap) support for the scalar-prefetch Pallas kernels.

``jax.vmap`` cannot batch a ``pallas_call`` built on
``PrefetchScalarGridSpec`` (scalar-prefetch operands have no batching
rule), which previously forced the batched-throughput bench to fall back
to the XLA conv formulation (``bench.py`` round 4: ``pallas_conv="off"``
for ``BENCH_BATCH > 1``).

Two facts make batching these kernels cheap:

* A TPU core executes one program's ops SEQUENTIALLY — there is no
  cross-op concurrency to lose by emitting one kernel call per batch
  element inside the same jit program.  What batching buys is
  amortised dispatch/host overhead and batched XLA graph surrounding the
  kernels (transformer, heads, elementwise), not kernel-level fusion.
* The kernels' grids are already data-dependent via the scalar-prefetched
  ``(ids, n_active)`` pair, so a LEADING batch grid dimension (same tile
  grid per element, per-element active counts) is a natural extension for
  the hot kernels.

:func:`sequential_vmap` provides the generic path: a
``jax.custom_batching.custom_vmap`` whose batch rule unrolls the base
call over the (static, small) batch axis and stacks the results.  Any
unbatched operand (weights, affine rows, plan constants) is shared across
elements, exactly like a vmap ``in_axes=None`` operand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sequential_vmap(base):
    """Wrap ``base`` (positional array-pytree args -> array pytree) so it
    vmaps by unrolling over the batch axis.  Nested vmaps compose (the
    rule itself is traceable)."""
    cv = jax.custom_batching.custom_vmap(base)

    @cv.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        leaves, treedef = jax.tree_util.tree_flatten(tuple(args))
        bleaves = jax.tree_util.tree_leaves(in_batched)
        assert len(leaves) == len(bleaves), (len(leaves), len(bleaves))
        outs = []
        for i in range(axis_size):
            full = [
                (l[i] if b else l) for l, b in zip(leaves, bleaves)
            ]
            outs.append(base(*jax.tree_util.tree_unflatten(treedef, full)))
        out = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return cv


@functools.lru_cache(maxsize=None)
def cached_sequential_vmap(fn, *static):
    """``sequential_vmap`` of ``fn(*arrays, *static)``, cached per static
    configuration so repeated model calls reuse one custom_vmap object
    (and its jit cache)."""

    def base(*arrays):
        return fn(*arrays, *static)

    return sequential_vmap(base)
