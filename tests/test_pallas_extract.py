"""Stream-compact extraction kernel vs a NumPy reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from pasco_tpu.ops.pallas_extract import (
    BLOCK_CELLS, BLOCK_ROWS, extract_plan, stream_extract_z2)


def interp():
    return pltpu.force_tpu_interpret_mode()


def ref_blocked(keep, payload, capacity):
    """NumPy mirror: kept cells in (packed-row, slot) order, per-block
    ranks padded to 16."""
    X, Z, Y = keep.shape
    T = Z // 2
    e2 = payload.shape[-1]
    e = e2 // 2
    lo = keep[:, 0::2].reshape(-1)
    hi = keep[:, 1::2].reshape(-1)
    pay = payload.reshape(-1, e2)
    n_rows = lo.shape[0]
    nblk = -(-n_rows // BLOCK_ROWS)
    rows = {}
    r = 0
    for b in range(nblk):
        cells = []
        for i in range(BLOCK_ROWS):
            p = b * BLOCK_ROWS + i
            if p >= n_rows:
                break
            if lo[p]:
                cells.append((p, 0))
            if hi[p]:
                cells.append((p, 1))
        if not cells:
            continue
        if r >= capacity:
            break
        for j, (p, s) in enumerate(cells):
            if r + j < capacity:
                rows[r + j] = (p, s, pay[p, s * e : s * e + e])
        r += -(-len(cells) // 16) * 16
    return rows


@pytest.mark.parametrize("seed,density", [(0, 0.15), (1, 0.6)])
def test_stream_extract_matches_reference(seed, density):
    r = np.random.RandomState(seed)
    X, Z, Y = 8, 8, 128
    T = Z // 2
    e = 10
    keep = r.rand(X, Z, Y) < density
    payload = r.randn(X, T, Y, 2 * e).astype(np.float32).astype(jnp.bfloat16)
    cap = 2048

    with interp():
        vals, src, valid, total = jax.jit(
            stream_extract_z2, static_argnums=1
        )(jnp.asarray(keep), cap, jnp.asarray(payload))

    vals = np.asarray(vals.astype(jnp.float32))
    src = np.asarray(src)
    valid = np.asarray(valid)
    assert int(total) == int(keep.sum())

    exp = ref_blocked(keep, np.asarray(payload.astype(jnp.float32)), cap)
    got_idx = set(np.nonzero(valid)[0].tolist())
    assert got_idx == set(exp.keys())
    for j, (p, s, row) in exp.items():
        sy = p % Y
        st = (p // Y) % T
        sx = p // (Y * T)
        flat = (sx * Z + 2 * st + s) * Y + sy
        assert src[j] == flat, (j, src[j], flat)
        np.testing.assert_allclose(vals[j, :e], row, rtol=0, atol=0)
    # invalid rows must be exact zeros in vals (one-hot pad rows)
    assert np.all(vals[~valid] == 0)


def test_stream_extract_capacity_clamp():
    r = np.random.RandomState(2)
    X, Z, Y = 8, 8, 128
    e = 4
    keep = r.rand(X, Z, Y) < 0.5
    payload = r.randn(X, Z // 2, Y, 2 * e).astype(jnp.bfloat16)
    cap = 256   # far below the ~16k kept cells

    with interp():
        vals, src, valid, total = jax.jit(
            stream_extract_z2, static_argnums=1
        )(jnp.asarray(keep), cap, jnp.asarray(payload))
    assert vals.shape == (cap, e)
    assert int(total) == int(keep.sum())
    exp = ref_blocked(keep, np.asarray(payload.astype(jnp.float32)), cap)
    assert set(np.nonzero(np.asarray(valid))[0].tolist()) == set(exp.keys())


def test_extract_plan_offsets_aligned():
    r = np.random.RandomState(3)
    keep = jnp.asarray(r.rand(4, 4, 256) < 0.3)
    ids, r16, n_act, blk_of_row = jax.jit(
        extract_plan, static_argnums=1
    )(keep, 1024)
    n = int(n_act[0])
    r16 = np.asarray(r16)[:n]
    assert np.all(r16 % 16 == 0)
    assert np.all(np.diff(r16) > 0)


def test_extract_sparse_z2_stream_equivalence():
    """stream=True vs the XLA gather path: identical cell->value maps
    (scatter both back to dense by coords)."""
    from pasco_tpu.core.sparse import Box
    from pasco_tpu.ops.dense_ops import extract_sparse_z2

    r = np.random.RandomState(7)
    X, Z, Y = 16, 8, 32
    T = Z // 2
    C, E = 8, 5
    keep = jnp.asarray(r.rand(X, Z, Y) < 0.3)
    feats = jnp.asarray(r.randn(X, T, Y, 2 * C), jnp.bfloat16)
    sem = jnp.asarray(r.randn(X, T, Y, 2 * E), jnp.bfloat16)
    box = Box.create(jnp.zeros(3, jnp.int32), (X, Y, Z))
    cap = 2048

    def dense_map(grid, extra):
        co = np.asarray(grid.coords)
        m = np.asarray(grid.mask)
        f = np.asarray(grid.feats.astype(jnp.float32))
        e = np.asarray(extra.astype(jnp.float32))
        out = np.zeros((X, Y, Z, C + E), np.float32)
        occ = np.zeros((X, Y, Z), bool)
        for j in np.nonzero(m)[0]:
            x, y, z = co[j, 1], co[j, 2], co[j, 3]
            assert not occ[x, y, z], "duplicate cell"
            occ[x, y, z] = True
            out[x, y, z] = np.concatenate([f[j], e[j]])
        return occ, out

    args = dict(extra=sem, extra_packed=True)
    g0, e0 = jax.jit(
        lambda f, k: extract_sparse_z2(f, k, box, 1, cap, **args)
    )(feats, keep)
    with interp():
        g1, e1 = jax.jit(
            lambda f, k: extract_sparse_z2(f, k, box, 1, cap, stream=True, **args)
        )(feats, keep)

    occ0, d0 = dense_map(g0, e0)
    occ1, d1 = dense_map(g1, e1)
    np.testing.assert_array_equal(occ0, occ1)
    np.testing.assert_array_equal(d0, d1)


@pytest.mark.parametrize("seed,density", [(3, 0.2), (4, 0.7)])
def test_stream_extract_separate_keep_path(seed, density):
    """128-aligned payloads route through the separate-keep kernel (no
    [payload | keep] lane concat); must match the NumPy reference and
    carry NaN garbage at non-kept cells without contaminating outputs."""
    r = np.random.RandomState(seed)
    X, Z, Y = 8, 8, 128
    T = Z // 2
    e = 64                                   # e2 = 128: aligned path
    keep = r.rand(X, Z, Y) < density
    payload = r.randn(X, T, Y, 2 * e).astype(np.float32)
    # garbage (incl. NaN) at non-kept cells: the chain buffers are
    # uninitialised outside active blocks, and the kernel must mask
    # before its dots (0 * NaN = NaN otherwise).
    klo = keep[:, 0::2]
    khi = keep[:, 1::2]
    payload[..., :e][~klo] = np.nan
    payload[..., e:][~khi] = np.nan
    pay = jnp.asarray(payload).astype(jnp.bfloat16)
    cap = 2048

    with interp():
        vals, src, valid, total = jax.jit(
            stream_extract_z2, static_argnums=1
        )(jnp.asarray(keep), cap, pay)

    vals = np.asarray(vals.astype(jnp.float32))
    src = np.asarray(src)
    valid = np.asarray(valid)
    assert int(total) == int(keep.sum())
    ref_pay = np.where(
        np.concatenate(
            [np.repeat(klo[..., None], e, -1), np.repeat(khi[..., None], e, -1)],
            -1,
        ),
        np.asarray(pay.astype(jnp.float32)), 0.0,
    )
    exp = ref_blocked(keep, ref_pay, cap)
    got_idx = set(np.nonzero(valid)[0].tolist())
    assert got_idx == set(exp.keys())
    for j, (p, s, row) in exp.items():
        sy = p % Y
        st = (p // Y) % T
        sx = p // (Y * T)
        flat = (sx * Z + 2 * st + s) * Y + sy
        assert src[j] == flat, (j, src[j], flat)
        np.testing.assert_allclose(vals[j, :e], row, rtol=0, atol=0)
    assert np.all(np.isfinite(vals))
    assert np.all(vals[~valid] == 0)
