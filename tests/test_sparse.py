"""Unit tests for the core sparse voxel substrate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasco_tpu.core import sparse as sp


def rand_grid(rng, n_valid, cap, c=4, extent=(32, 32, 8), batch=1, stride=1):
    """Random grid with unique coordinates among the valid rows."""
    total = batch * np.prod(extent)
    flat = rng.choice(total, size=n_valid, replace=False)
    b, rem = np.divmod(flat, np.prod(extent))
    x, rem = np.divmod(rem, extent[1] * extent[2])
    y, z = np.divmod(rem, extent[2])
    coords = np.zeros((cap, 4), np.int32)
    coords[:n_valid] = np.stack([b, x * stride, y * stride, z * stride], -1)
    feats = np.zeros((cap, c), np.float32)
    feats[:n_valid] = rng.standard_normal((n_valid, c))
    mask = np.arange(cap) < n_valid
    box = sp.Box.create([0, 0, 0], [e * stride for e in extent])
    return sp.make_grid(coords, feats, mask, stride=stride), box


def test_linear_keys_roundtrip():
    rng = np.random.default_rng(0)
    grid, box = rand_grid(rng, 50, 64)
    keys = sp.linear_keys(grid.coords, grid.mask, box, 1)
    assert np.sum(np.asarray(keys) != sp.INVALID_KEY) == 50
    # keys unique among valid
    valid = np.asarray(keys)[np.asarray(keys) != sp.INVALID_KEY]
    assert len(np.unique(valid)) == 50


def test_lookup_finds_self():
    rng = np.random.default_rng(1)
    grid, box = rand_grid(rng, 40, 64)
    keys = sp.linear_keys(grid.coords, grid.mask, box, 1)
    table = sp.build_table(keys)
    row, found = sp.lookup(*table, keys)
    np.testing.assert_array_equal(np.asarray(found), np.asarray(grid.mask))
    np.testing.assert_array_equal(np.asarray(row)[:40], np.arange(40))


def test_lookup_missing():
    rng = np.random.default_rng(2)
    grid, box = rand_grid(rng, 10, 16, extent=(8, 8, 4))
    keys = sp.linear_keys(grid.coords, grid.mask, box, 1)
    table = sp.build_table(keys)
    # query a coordinate outside the box -> invalid key, never found
    q = jnp.asarray([[0, 100, 0, 0]], jnp.int32)
    qkeys = sp.linear_keys(q, jnp.ones(1, bool), box, 1)
    _, found = sp.lookup(*table, qkeys)
    assert not bool(found[0])


def test_compact_stable_order():
    rng = np.random.default_rng(3)
    grid, box = rand_grid(rng, 60, 64)
    keep = np.zeros(64, bool)
    keep[5:25] = True
    out = sp.compact(grid, jnp.asarray(keep), 32)
    assert out.capacity == 32
    assert int(out.count()) == 20
    np.testing.assert_array_equal(
        np.asarray(out.coords)[:20], np.asarray(grid.coords)[5:25]
    )


def test_compact_overflow_drops_tail():
    rng = np.random.default_rng(4)
    grid, box = rand_grid(rng, 60, 64)
    out = sp.compact(grid, grid.mask, 30)
    assert int(out.count()) == 30
    np.testing.assert_array_equal(
        np.asarray(out.coords)[:30], np.asarray(grid.coords)[:30]
    )


def test_top_k_compact():
    rng = np.random.default_rng(5)
    grid, box = rand_grid(rng, 50, 64)
    scores = jnp.asarray(np.arange(64, dtype=np.float32))
    out = sp.top_k_compact(grid, scores, grid.mask, 10)
    assert int(out.count()) == 10
    # the 10 highest-scoring valid rows are indices 40..49
    got = set(map(tuple, np.asarray(out.coords)[np.asarray(out.mask)].tolist()))
    want = set(map(tuple, np.asarray(grid.coords)[40:50].tolist()))
    assert got == want


def test_unique_dedupes_and_reduces():
    box = sp.Box.create([0, 0, 0], [8, 8, 8])
    coords = jnp.asarray(
        [
            [0, 1, 1, 1],
            [0, 2, 2, 2],
            [0, 1, 1, 1],  # dup of row 0
            [0, 3, 3, 3],
            [0, 2, 2, 2],  # dup of row 1
        ],
        jnp.int32,
    )
    feats = jnp.asarray([[1.0], [2.0], [5.0], [3.0], [7.0]])
    mask = jnp.ones(5, bool)
    uc, um, seg, uf = sp.unique(coords, mask, box, 1, 8, feats=feats, reduce="max")
    assert int(um.sum()) == 3
    got = {
        tuple(np.asarray(uc)[i].tolist()): float(np.asarray(uf)[i, 0])
        for i in range(3)
    }
    assert got[(0, 1, 1, 1)] == 5.0
    assert got[(0, 2, 2, 2)] == 7.0
    assert got[(0, 3, 3, 3)] == 3.0
    # seg ids map dups to same row
    seg = np.asarray(seg)
    assert seg[0] == seg[2] and seg[1] == seg[4]


def test_unique_mean():
    box = sp.Box.create([0, 0, 0], [8, 8, 8])
    coords = jnp.asarray([[0, 1, 1, 1], [0, 1, 1, 1], [0, 2, 0, 0]], jnp.int32)
    feats = jnp.asarray([[2.0], [4.0], [10.0]])
    uc, um, seg, uf = sp.unique(
        coords, jnp.ones(3, bool), box, 1, 4, feats=feats, reduce="mean"
    )
    got = {
        tuple(np.asarray(uc)[i].tolist()): float(np.asarray(uf)[i, 0])
        for i in range(int(um.sum()))
    }
    assert got[(0, 1, 1, 1)] == 3.0
    assert got[(0, 2, 0, 0)] == 10.0


def test_dense_roundtrip():
    rng = np.random.default_rng(6)
    grid, box = rand_grid(rng, 30, 40, c=3, extent=(8, 8, 4))
    dense = sp.to_dense(grid, box, batch_size=1)
    assert dense.shape == (1, 8, 8, 4, 3)
    back = sp.from_dense(dense, box, 1, 64)
    assert int(back.count()) == 30
    # features survive the roundtrip
    vals = sp.gather_dense(dense, grid.coords, grid.mask, box, 1)
    np.testing.assert_allclose(np.asarray(vals)[:30], np.asarray(grid.feats)[:30])


def test_prune_outside_box():
    coords = jnp.asarray([[0, 0, 0, 0], [0, 5, 5, 5], [0, 9, 0, 0]], jnp.int32)
    grid = sp.make_grid(coords, jnp.ones((3, 1)), jnp.ones(3, bool))
    out = sp.prune_outside_box(grid, jnp.asarray([0, 0, 0]), jnp.asarray([5, 5, 5]))
    np.testing.assert_array_equal(np.asarray(out.mask), [True, True, False])


def test_global_pool():
    coords = jnp.asarray(
        [[0, 0, 0, 0], [0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 0]], jnp.int32
    )
    feats = jnp.asarray([[2.0], [4.0], [10.0], [99.0]])
    mask = jnp.asarray([True, True, True, False])
    grid = sp.make_grid(coords, feats, mask)
    mean = sp.global_pool(grid, 2, "mean")
    np.testing.assert_allclose(np.asarray(mean), [[3.0], [10.0]])
    mx = sp.global_pool(grid, 2, "max")
    np.testing.assert_allclose(np.asarray(mx), [[4.0], [10.0]])


def test_jit_once_multiple_counts():
    """Different valid counts must not retrigger compilation."""
    box = sp.Box.create([0, 0, 0], [16, 16, 8])
    traces = []

    @jax.jit
    def f(grid):
        traces.append(1)
        keys = sp.linear_keys(grid.coords, grid.mask, box, 1)
        table = sp.build_table(keys)
        row, found = sp.lookup(*table, keys)
        return found.sum()

    rng = np.random.default_rng(7)
    for n in [10, 20, 30]:
        grid, _ = rand_grid(rng, n, 32, extent=(16, 16, 8))
        assert int(f(grid)) == n
    assert len(traces) == 1
