"""Pallas block-sparse conv vs the dense reference (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasco_tpu.ops.dense_ops import conv3_dense
from pasco_tpu.ops.pallas_conv import active_columns, block_sparse_conv3


def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def test_active_columns():
    mask = np.zeros((16, 16, 8), bool)
    mask[0:8, 0:8, 2] = True      # column (0, 0)
    mask[9, 12, 0] = True         # column (1, 1)
    ids, n = active_columns(jnp.asarray(mask), capacity=8)
    assert int(n[0]) == 2
    got = sorted(int(i) for i in np.asarray(ids)[:2])
    assert got == [0, 3]  # flat ids over a 2x2 column grid


def test_block_sparse_conv_matches_dense():
    r = np.random.RandomState(0)
    X, Y, Z, C, D = 32, 32, 16, 64, 32
    mask = np.zeros((X, Y, Z), bool)
    mask[4:20, 6:25, 2:12] = r.rand(16, 19, 10) > 0.5
    x = np.where(mask[..., None], r.randn(X, Y, Z, C), 0).astype(np.float32)
    w = (r.randn(27, C, D) * 0.1).astype(np.float32)
    b = r.randn(D).astype(np.float32)

    ref = conv3_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    ref = np.where(mask[..., None], np.asarray(ref, np.float32), 0)

    with _interpret():
        out = block_sparse_conv3(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(mask),
            block_capacity=32, bias=jnp.asarray(b),
        )
    out = np.where(mask[..., None], np.asarray(out, np.float32), 0)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel


def test_block_sparse_conv_skips_dead_columns():
    r = np.random.RandomState(1)
    X, Y, Z, C = 16, 16, 8, 64
    mask = np.zeros((X, Y, Z), bool)
    mask[0:8, 0:8, :] = True
    x = np.where(mask[..., None], r.randn(X, Y, Z, C), 0).astype(np.float32)
    w = (r.randn(27, C, C) * 0.1).astype(np.float32)
    with _interpret():
        out = block_sparse_conv3(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(mask), block_capacity=4
        )
    out = np.asarray(out)
    # Cells in never-visited columns stay exactly zero.
    assert np.all(out[8:, 8:] == 0)
    assert np.abs(out[:8, :8]).max() > 0
