"""Tests for kNN interpolation, converters, and visualization export."""

import os

import jax.numpy as jnp
import numpy as np

from pasco_tpu.ops.knn import knn, knn_up
from pasco_tpu.utils.converter import (
    panoptic_to_semantic_instance,
    semantic_instance_to_panoptic,
)
from pasco_tpu.utils.visualization import export_semantic_ply, write_ply


def test_knn_finds_self():
    r = np.random.RandomState(0)
    pts = r.rand(50, 3).astype(np.float32)
    d, idx = knn(jnp.asarray(pts), jnp.asarray(pts), jnp.ones(50, bool), k=3,
                 tile=16)
    assert np.allclose(np.asarray(d)[:, 0], 0, atol=1e-5)
    assert (np.asarray(idx)[:, 0] == np.arange(50)).all()


def test_knn_up_exact_at_voxel_centers():
    vox = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    feats = np.eye(3, dtype=np.float32)
    out = knn_up(
        jnp.asarray(vox), jnp.asarray(feats), jnp.ones(3, bool),
        jnp.asarray(vox), k=1,
    )
    assert np.allclose(np.asarray(out), feats, atol=1e-4)


def test_knn_respects_mask():
    vox = np.array([[0.0, 0, 0], [0.01, 0, 0]], np.float32)
    mask = np.array([True, False])
    d, idx = knn(
        jnp.asarray(vox[:1]), jnp.asarray(vox), jnp.asarray(mask), k=1
    )
    assert int(np.asarray(idx)[0, 0]) == 0  # masked-out ref never selected


def test_converter_roundtrip():
    sem = np.zeros((6, 6, 2), np.int32)
    inst = np.zeros_like(sem)
    sem[:2] = 9          # stuff
    sem[3:5] = 1         # two thing instances
    inst[3:4] = 1
    inst[4:5] = 2
    pan, segs = semantic_instance_to_panoptic(sem, inst, thing_ids=(1,))
    assert len(segs) == 3
    sem2, inst2 = panoptic_to_semantic_instance(pan, segs, thing_ids=(1,))
    assert np.array_equal(sem2, sem)
    assert len(np.unique(inst2[sem2 == 1])) == 2


def test_ply_export(tmp_path):
    sem = np.zeros((4, 4, 2), np.uint8)
    sem[1, 1, 0] = 9
    path = str(tmp_path / "test.ply")
    export_semantic_ply(path, sem)
    content = open(path).read()
    assert "element vertex 1" in content


def test_scatter_max_rows_matches_naive():
    import jax.numpy as jnp

    from pasco_tpu.ops.dense_ops import scatter_max_rows

    r = np.random.RandomState(0)
    P, C, n_rows = 500, 8, 64
    f = jnp.asarray(r.randn(P, C), jnp.float32)
    idx = jnp.asarray(
        np.where(r.rand(P) < 0.2, n_rows, r.randint(0, n_rows, P)), jnp.int32
    )
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    want = jnp.full((n_rows + 1, C), neg).at[idx].max(f, mode="drop")
    got = scatter_max_rows(f, idx, n_rows, neg)
    # dump row (sliced off by every caller) may differ; compare the rest
    np.testing.assert_allclose(
        np.asarray(got[:-1]), np.asarray(want[:-1])
    )
