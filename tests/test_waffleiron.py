"""WaffleIron frontend smoke tests (small depth)."""

import jax
import jax.numpy as jnp
import numpy as np

from pasco_tpu.models.waffleiron import (
    Segmenter,
    grid_cell_indices,
    knn_indices,
)


def test_segmenter_forward():
    P = 512
    r = np.random.RandomState(0)
    xyz = r.rand(P, 3) * 40 - 20
    feats = np.concatenate(
        [r.rand(P, 1), xyz, np.linalg.norm(xyz, axis=1, keepdims=True)], axis=1
    ).astype(np.float32)
    nbrs = knn_indices(xyz, 8)
    cells = grid_cell_indices(xyz, ((32, 32), (32, 8), (32, 8)))
    mask = np.ones(P, bool)
    mask[400:] = False

    net = Segmenter(
        n_classes=19, channels=32, depth=4, in_channels=5,
        grids_shape=((32, 32), (32, 8), (32, 8)),
    )
    v = jax.jit(
        lambda f, nb, c, m: net.init(
            {"params": jax.random.PRNGKey(0)}, f, nb, c, m
        )
    )(jnp.asarray(feats), jnp.asarray(nbrs), jnp.asarray(cells), jnp.asarray(mask))
    logits, tokens = jax.jit(
        lambda v, f, nb, c, m: net.apply(v, f, nb, c, m, train=False)
    )(v, jnp.asarray(feats), jnp.asarray(nbrs), jnp.asarray(cells), jnp.asarray(mask))
    assert logits.shape == (P, 19)
    assert tokens.shape == (P, 32)
    assert np.isfinite(np.asarray(logits)).all()
    # Padding rows must not receive features.
    assert np.allclose(np.asarray(tokens)[401], np.asarray(tokens)[510])


def test_knn_and_cells_shapes():
    xyz = np.random.RandomState(1).rand(100, 3) * 10
    nb = knn_indices(xyz, 5)
    assert nb.shape == (5, 100)
    assert (nb[0] == np.arange(100)).all()  # first neighbor is self
    cells = grid_cell_indices(xyz)
    assert cells.shape == (3, 100)
    assert cells.min() >= 0
