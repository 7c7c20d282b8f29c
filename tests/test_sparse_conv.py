"""Sparse conv ops validated against dense convolution oracles."""

import jax.numpy as jnp
import numpy as np

from pasco_tpu.core import sparse as sp
from pasco_tpu.ops import sparse_conv as sc


def dense_oracle_conv(dense_occ, dense_feat, weight, offsets, stride=1):
    """Naive dense conv restricted to occupied outputs (submanifold)."""
    X, Y, Z, Cin = dense_feat.shape
    Cout = weight.shape[-1]
    out = np.zeros((X, Y, Z, Cout), np.float32)
    for k, (dx, dy, dz) in enumerate(offsets):
        for x in range(X):
            for y in range(Y):
                for z in range(Z):
                    if not dense_occ[x, y, z]:
                        continue
                    sx, sy, sz = x + dx * stride, y + dy * stride, z + dz * stride
                    if 0 <= sx < X and 0 <= sy < Y and 0 <= sz < Z and dense_occ[sx, sy, sz]:
                        out[x, y, z] += dense_feat[sx, sy, sz] @ weight[k]
    return out


def build_random(rng, n, cap, extent, c):
    total = int(np.prod(extent))
    flat = rng.choice(total, size=n, replace=False)
    x, rem = np.divmod(flat, extent[1] * extent[2])
    y, z = np.divmod(rem, extent[2])
    coords = np.zeros((cap, 4), np.int32)
    coords[:n, 1] = x
    coords[:n, 2] = y
    coords[:n, 3] = z
    feats = np.zeros((cap, c), np.float32)
    feats[:n] = rng.standard_normal((n, c)).astype(np.float32)
    mask = np.arange(cap) < n
    occ = np.zeros(extent, bool)
    occ[x, y, z] = True
    df = np.zeros(extent + (c,), np.float32)
    df[x, y, z] = feats[:n]
    box = sp.Box.create([0, 0, 0], extent)
    return sp.make_grid(coords, feats, mask), box, occ, df


def test_submanifold_conv_matches_dense():
    rng = np.random.default_rng(0)
    extent = (6, 6, 4)
    grid, box, occ, df = build_random(rng, 30, 40, extent, 3)
    w = rng.standard_normal((27, 3, 5)).astype(np.float32)
    out = sc.submanifold_conv3d(grid, box, jnp.asarray(w))
    want = dense_oracle_conv(occ, df, w, sc.kernel_offsets(3))
    got = np.asarray(out.feats)
    for i in range(30):
        x, y, z = np.asarray(grid.coords)[i, 1:]
        np.testing.assert_allclose(got[i], want[x, y, z], rtol=1e-4, atol=1e-5)
    # padded rows stay zero
    assert np.all(got[30:] == 0)


def test_conv1x1_is_matmul():
    rng = np.random.default_rng(1)
    grid, box, _, _ = build_random(rng, 10, 16, (4, 4, 4), 3)
    w = rng.standard_normal((1, 3, 7)).astype(np.float32)
    b = rng.standard_normal(7).astype(np.float32)
    out = sc.submanifold_conv3d(grid, box, jnp.asarray(w), jnp.asarray(b))
    want = np.asarray(grid.feats)[:10] @ w[0] + b
    np.testing.assert_allclose(np.asarray(out.feats)[:10], want, rtol=1e-5, atol=1e-5)


def test_strided_conv_downsamples():
    rng = np.random.default_rng(2)
    extent = (8, 8, 4)
    grid, box, occ, df = build_random(rng, 40, 64, extent, 3)
    w = rng.standard_normal((8, 3, 4)).astype(np.float32)
    out = sc.strided_conv3d(grid, box, jnp.asarray(w), out_capacity=32)
    assert out.stride == 2

    # Oracle: each parent (multiples of 2) sums children at parent + {0,1}^3.
    parents = {}
    cm = np.asarray(grid.coords)[:40, 1:]
    for x, y, z in cm:
        p = (x // 2 * 2, y // 2 * 2, z // 2 * 2)
        parents.setdefault(p, np.zeros(4, np.float32))
    for k, (dx, dy, dz) in enumerate(sc.kernel_offsets(2)):
        for p in parents:
            cx, cy, cz = p[0] + dx, p[1] + dy, p[2] + dz
            if cx < extent[0] and cy < extent[1] and cz < extent[2] and occ[cx, cy, cz]:
                parents[p] += df[cx, cy, cz] @ w[k]

    got_mask = np.asarray(out.mask)
    got_c = np.asarray(out.coords)[got_mask]
    got_f = np.asarray(out.feats)[got_mask]
    assert len(got_c) == len(parents)
    for c, f in zip(got_c, got_f):
        np.testing.assert_allclose(f, parents[tuple(c[1:])], rtol=1e-4, atol=1e-5)


def test_generative_deconv_children():
    rng = np.random.default_rng(3)
    cap = 8
    coords = np.zeros((cap, 4), np.int32)
    coords[0] = [0, 0, 0, 0]
    coords[1] = [0, 2, 0, 2]
    feats = np.zeros((cap, 3), np.float32)
    feats[:2] = rng.standard_normal((2, 3))
    mask = np.arange(cap) < 2
    grid = sp.make_grid(coords, feats, mask, stride=2)
    w = rng.standard_normal((8, 3, 5)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    out = sc.generative_deconv3d(grid, jnp.asarray(w), jnp.asarray(b))
    assert out.stride == 1
    assert out.capacity == 64
    assert int(out.count()) == 16
    oc = np.asarray(out.coords)
    of = np.asarray(out.feats)
    om = np.asarray(out.mask)
    # children of voxel 0: {0,1}^3; of voxel 1: [2..3,0..1,2..3]
    got = {tuple(c[1:]): f for c, f in zip(oc[om], of[om])}
    offs = sc.kernel_offsets(2)
    for i in range(2):
        for k, (dx, dy, dz) in enumerate(offs):
            key = (coords[i, 1] + dx, coords[i, 2] + dy, coords[i, 3] + dz)
            np.testing.assert_allclose(got[key], feats[i] @ w[k] + b, rtol=1e-4, atol=1e-5)
    # children coords are unique
    assert len(got) == 16


def test_max_pool():
    extent = (4, 4, 4)
    coords = np.asarray(
        [[0, 0, 0, 0], [0, 1, 1, 1], [0, 2, 0, 0], [0, 0, 0, 0]], np.int32
    )
    feats = np.asarray([[1.0], [5.0], [2.0], [0.0]])
    mask = np.asarray([True, True, True, False])
    grid = sp.make_grid(coords, feats, mask)
    box = sp.Box.create([0, 0, 0], extent)
    out = sc.sparse_max_pool(grid, 2, box, 8)
    got = {
        tuple(np.asarray(out.coords)[i, 1:].tolist()): float(np.asarray(out.feats)[i, 0])
        for i in range(out.capacity)
        if bool(np.asarray(out.mask)[i])
    }
    assert got == {(0, 0, 0): 5.0, (2, 0, 0): 2.0}
    assert out.stride == 2


def test_lookup_features_skip_connection():
    rng = np.random.default_rng(4)
    grid, box, _, _ = build_random(rng, 20, 32, (8, 8, 4), 3)
    # query = same coords plus one unknown
    q = np.asarray(grid.coords).copy()
    q[20] = [0, 7, 7, 3]
    qm = np.arange(32) < 21
    feats, found = sc.lookup_features(grid, jnp.asarray(q), jnp.asarray(qm), box)
    f = np.asarray(found)
    assert f[:20].all()
    coord_exists = tuple(q[20][1:]) in {
        tuple(c[1:]) for c in np.asarray(grid.coords)[:20]
    }
    assert bool(f[20]) == coord_exists
    np.testing.assert_allclose(np.asarray(feats)[:20], np.asarray(grid.feats)[:20])


def test_negative_coords():
    """Coordinates may be negative after augmentation; floor-div semantics."""
    coords = np.asarray([[0, -2, -2, 0], [0, -1, -1, 1]], np.int32)
    cap = 4
    c = np.zeros((cap, 4), np.int32)
    c[:2] = coords
    feats = np.zeros((cap, 2), np.float32)
    feats[:2] = [[1.0, 2.0], [3.0, 4.0]]
    mask = np.arange(cap) < 2
    grid = sp.make_grid(c, feats, mask)
    box = sp.Box.create([-4, -4, -4], [8, 8, 8])
    w = np.zeros((8, 2, 2), np.float32)
    for k in range(8):
        w[k] = np.eye(2)
    out = sc.strided_conv3d(grid, box, jnp.asarray(w), out_capacity=8)
    # both voxels floor to parent (-2, -2, 0)
    om = np.asarray(out.mask)
    assert om.sum() == 1
    got_c = np.asarray(out.coords)[om][0]
    np.testing.assert_array_equal(got_c, [0, -2, -2, 0])
    np.testing.assert_allclose(np.asarray(out.feats)[om][0], [4.0, 6.0])


def test_cam_and_depthwise_multiheads():
    """Experimental layers (reference layers.py:60-78,111-192): CAM gating
    and the depthwise + per-head pointwise conv."""
    import jax
    from pasco_tpu.models.blocks import (
        CAM, DepthwiseSeparableConvMultiheads, PointwiseConvMultiheads,
        submanifold_maxpool)

    rng = np.random.RandomState(3)
    grid, box, occ, df = build_random(rng, 40, 64, (8, 8, 4), 8)

    # maxpool oracle: per occupied cell, max over existing 3^3 neighbours
    pooled = submanifold_maxpool(grid, box, 3)
    pn = np.asarray(pooled.feats)
    coords = np.asarray(grid.coords)
    for i in range(40):
        x, y, z = coords[i, 1:]
        vals = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    sx, sy, sz = x + dx, y + dy, z + dz
                    if (0 <= sx < 8 and 0 <= sy < 8 and 0 <= sz < 4
                            and occ[sx, sy, sz]):
                        vals.append(df[sx, sy, sz])
        ref = np.max(np.stack(vals), axis=0)
        np.testing.assert_allclose(pn[i], ref, rtol=1e-6)

    cam = CAM(planes=8)
    v = cam.init(jax.random.PRNGKey(0), grid, box)
    out = cam.apply(v, grid, box)
    o = np.asarray(out.feats)
    assert np.all(np.abs(o[:40]) <= np.abs(np.asarray(grid.feats[:40])) + 1e-6)
    assert np.all(o[40:] == 0)

    # block-diagonal pointwise: head 0's outputs ignore head 1's inputs
    pw = PointwiseConvMultiheads(8, 8, n_heads=2)
    vp = pw.init(jax.random.PRNGKey(1), jnp.ones((4, 8)))
    f0 = pw.apply(vp, jnp.asarray(rng.randn(4, 8), jnp.float32))
    f1 = pw.apply(
        vp,
        jnp.asarray(rng.randn(4, 8), jnp.float32)
        .at[:, 4:].set(0.0)
        .at[:, :4].set(f0[:, :4] * 0 + 1),
    )
    x_a = jnp.zeros((4, 8)).at[:, :4].set(1.0)
    x_b = x_a.at[:, 4:].set(99.0)
    np.testing.assert_allclose(
        np.asarray(pw.apply(vp, x_a))[:, :4],
        np.asarray(pw.apply(vp, x_b))[:, :4],
        rtol=1e-6,
    )

    ds = DepthwiseSeparableConvMultiheads(planes=8, n_heads=2)
    vd = ds.init(jax.random.PRNGKey(2), grid, box)
    out = ds.apply(vd, grid, box)
    assert out.feats.shape == grid.feats.shape
    assert np.all(np.isfinite(np.asarray(out.feats)))
    assert np.all(np.asarray(out.feats)[40:] == 0)
