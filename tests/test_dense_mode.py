"""Dense-with-masks compute path: equivalence with sparse, e2e training."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasco_tpu.core.config import tiny_config
from pasco_tpu.core.sparse import Box, SparseGrid
from pasco_tpu.models.dense_unet import DensePaSCoNet
from pasco_tpu.ops.dense_ops import (
    conv3_dense,
    deconv2_dense,
    down2_dense,
    extract_sparse,
    maxpool2_mask,
    shift_matmul_conv3d,
)
from pasco_tpu.ops.sparse_conv import (
    generative_deconv3d,
    strided_conv3d,
    submanifold_conv3d,
)
from pasco_tpu.training import step as tstep
from test_train_step import build_batch


def random_grid(r, ext, n, c, stride=1):
    box = Box.create([0, 0, 0], ext)
    xs = r.choice(ext[0] // stride * ext[1] // stride * ext[2] // stride,
                  n, replace=False)
    ez = ext[2] // stride
    ey = ext[1] // stride
    coords = np.zeros((n, 4), np.int32)
    coords[:, 1] = xs // (ey * ez) * stride
    coords[:, 2] = (xs // ez) % ey * stride
    coords[:, 3] = xs % ez * stride
    feats = r.randn(n, c).astype(np.float32)
    return box, SparseGrid(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones(n, bool), stride
    )


def to_dense(grid, box):
    from pasco_tpu.core.sparse import to_dense as td

    return td(grid, box, 1)[0], None


def test_dense_conv_matches_sparse_conv():
    r = np.random.RandomState(0)
    ext = (16, 16, 8)
    box, grid = random_grid(r, ext, 60, 5)
    w = jnp.asarray(r.randn(27, 5, 7).astype(np.float32))
    b = jnp.asarray(r.randn(7).astype(np.float32))

    sparse_out = submanifold_conv3d(grid, box, w, b)
    dense_in, _ = to_dense(grid, box)
    mask = jnp.zeros(ext, bool).at[
        grid.coords[:, 1], grid.coords[:, 2], grid.coords[:, 3]
    ].set(True)
    dense_out = conv3_dense(jnp.where(mask[..., None], dense_in, 0), w, b)
    got = dense_out[grid.coords[:, 1], grid.coords[:, 2], grid.coords[:, 3]]
    assert np.allclose(np.asarray(got), np.asarray(sparse_out.feats), atol=2e-4)


def test_dense_down_matches_sparse_strided():
    r = np.random.RandomState(1)
    ext = (16, 16, 8)
    box, grid = random_grid(r, ext, 80, 6)
    w = jnp.asarray(r.randn(8, 6, 4).astype(np.float32))

    sparse_out = strided_conv3d(grid, box, w, out_capacity=128)
    dense_in, _ = to_dense(grid, box)
    dense_out = down2_dense(dense_in, w)
    sc = sparse_out.coords[:, 1:] // 2
    got = dense_out[sc[:, 0], sc[:, 1], sc[:, 2]]
    want = np.asarray(sparse_out.feats)
    m = np.asarray(sparse_out.mask)
    assert np.allclose(np.asarray(got)[m], want[m], atol=2e-4)


def test_dense_deconv_matches_sparse_generative():
    r = np.random.RandomState(2)
    ext = (16, 16, 8)
    box, grid = random_grid(r, ext, 30, 6, stride=2)
    w = jnp.asarray(r.randn(8, 6, 4).astype(np.float32))
    b = jnp.asarray(r.randn(4).astype(np.float32))

    sparse_out = generative_deconv3d(grid, w, b)
    # Dense: input grid at stride 2 occupies ext/2 cells.
    dense_in = jnp.zeros((8, 8, 4, 6), jnp.float32).at[
        grid.coords[:, 1] // 2, grid.coords[:, 2] // 2, grid.coords[:, 3] // 2
    ].set(grid.feats)
    dense_out = deconv2_dense(dense_in, w, b)
    m = np.asarray(sparse_out.mask)
    sc = np.asarray(sparse_out.coords)[m]
    got = dense_out[sc[:, 1], sc[:, 2], sc[:, 3]]
    assert np.allclose(np.asarray(got), np.asarray(sparse_out.feats)[m], atol=2e-4)


def test_shift_matmul_matches_native():
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(1, 8, 8, 4, 5).astype(np.float32))
    w27 = jnp.asarray(r.randn(27, 5, 6).astype(np.float32))
    native = conv3_dense(x[0], w27)
    shifted = shift_matmul_conv3d(x, w27.reshape(3, 3, 3, 5, 6))[0]
    assert np.allclose(np.asarray(native), np.asarray(shifted), atol=2e-4)


def test_zfold_conv3d_matches_shift_matmul():
    from pasco_tpu.models.bottleneck import zfold_conv3d

    r = np.random.RandomState(7)
    x = jnp.asarray(r.randn(1, 9, 8, 4, 5).astype(np.float32))
    for kern in ((3, 3, 1), (5, 5, 3), (7, 7, 5)):
        w = jnp.asarray(r.randn(*kern, 5, 6).astype(np.float32))
        ref = shift_matmul_conv3d(x, w)
        got = zfold_conv3d(x, w)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_extract_sparse_roundtrip():
    r = np.random.RandomState(4)
    ext = (8, 8, 4)
    box = Box.create([0, 0, 0], ext)
    feats = jnp.asarray(r.randn(*ext, 3).astype(np.float32))
    keep = jnp.asarray(r.rand(*ext) > 0.7)
    grid, _ = extract_sparse(feats, keep, box, 1, capacity=256)
    n = int(keep.sum())
    assert int(grid.mask.sum()) == n
    c = np.asarray(grid.coords)[np.asarray(grid.mask)]
    got = np.asarray(grid.feats)[np.asarray(grid.mask)]
    want = np.asarray(feats)[c[:, 1], c[:, 2], c[:, 3]]
    assert np.allclose(got, want)


@pytest.mark.slow
def test_dense_forward_and_train():
    cfg = tiny_config(n_infers=1)
    net = DensePaSCoNet(cfg)
    scene = build_batch(cfg, 1, seed=21)
    inp = tstep.scene_to_model_input(scene)
    targets = tstep.targets_to_device(scene.targets)
    freqs = {s: np.ones(cfg.model.n_classes) for s in (1, 2, 4)}
    lw = tstep.labelweights_for(cfg, freqs)
    cw = jnp.asarray(
        tstep.class_weight_vector(cfg.model.n_classes, cfg.loss.no_object_weight)
    )
    state, tx = tstep.create_train_state(net, cfg, inp, lw, jax.random.PRNGKey(0))
    step_fn = jax.jit(
        partial(tstep.train_step, net=net, tx=tx, labelweights=lw,
                class_weight=cw, cfg=cfg)
    )
    losses = []
    for _ in range(4):
        state, logs = step_fn(state, inp, targets, jax.random.PRNGKey(1))
        losses.append(float(logs["total_loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] <= losses[0]


# ---------------------------------------------------------------------------
# [X, Z, Y, C] axis order (the dense substrate's internal layout)
# ---------------------------------------------------------------------------


def test_conv3_dense_xzy_matches_xyz():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(6, 5, 4, 3).astype(np.float32))   # [X, Y, Z, C]
    w = jnp.asarray(r.randn(27, 3, 7).astype(np.float32))
    b = jnp.asarray(r.randn(7).astype(np.float32))
    ref = conv3_dense(x, w, b)
    out = conv3_dense(x.transpose(0, 2, 1, 3), w, b, axis_order="xzy")
    np.testing.assert_allclose(
        np.asarray(out.transpose(0, 2, 1, 3)), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )


def test_down_deconv_xzy_match_xyz():
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(6, 4, 8, 3).astype(np.float32))   # [X, Y, Z, C]
    w = jnp.asarray(r.randn(8, 3, 5).astype(np.float32))
    b = jnp.asarray(r.randn(5).astype(np.float32))
    ref = down2_dense(x, w, b)
    out = down2_dense(x.transpose(0, 2, 1, 3), w, b, axis_order="xzy")
    np.testing.assert_allclose(
        np.asarray(out.transpose(0, 2, 1, 3)), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )
    wd = jnp.asarray(r.randn(8, 3, 5).astype(np.float32))
    ref = deconv2_dense(x, wd, b)
    out = deconv2_dense(x.transpose(0, 2, 1, 3), wd, b, axis_order="xzy")
    np.testing.assert_allclose(
        np.asarray(out.transpose(0, 2, 1, 3)), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )


def test_extract_sparse_xzy_coords():
    from pasco_tpu.ops.dense_ops import bbox_mask, cell_coords

    r = np.random.RandomState(2)
    box = Box.create([0, -8, 0], (8, 16, 4))
    feats = jnp.asarray(r.randn(8, 16, 4, 3).astype(np.float32))
    keep = jnp.asarray(r.rand(8, 16, 4) > 0.5)
    g_ref, _ = extract_sparse(feats, keep, box, 1, capacity=512)
    g_xzy, _ = extract_sparse(
        feats.transpose(0, 2, 1, 3), keep.transpose(0, 2, 1), box, 1,
        capacity=512, axis_order="xzy",
    )
    # Same (coord -> feature) mapping regardless of enumeration order.
    def as_map(g):
        out = {}
        for i in range(int(np.sum(np.asarray(g.mask)))):
            out[tuple(np.asarray(g.coords[i]))] = np.asarray(g.feats[i])
        return out
    m_ref, m_xzy = as_map(g_ref), as_map(g_xzy)
    assert set(m_ref) == set(m_xzy)
    for k in m_ref:
        np.testing.assert_allclose(m_ref[k], m_xzy[k], rtol=1e-6)
    # bbox mask / coords transpose-consistency
    bm = bbox_mask(box, 1, jnp.asarray([2, -4, 1]), jnp.asarray([6, 4, 3]))
    bm_xzy = bbox_mask(
        box, 1, jnp.asarray([2, -4, 1]), jnp.asarray([6, 4, 3]), "xzy"
    )
    assert np.array_equal(np.asarray(bm_xzy), np.asarray(bm.transpose(0, 2, 1)))
    cc = cell_coords(box, 2)
    cc_xzy = cell_coords(box, 2, "xzy")
    assert np.array_equal(
        np.asarray(cc_xzy), np.asarray(cc.transpose(0, 2, 1, 3))
    )


# ---------------------------------------------------------------------------
# z-pair packed ops (s1/s2 packed layout) vs plain xzy ops
# ---------------------------------------------------------------------------


def _rand_xzy(r, X, Z, Y, C):
    return jnp.asarray(r.randn(X, Z, Y, C).astype(np.float32))


def test_pack_unpack_roundtrip():
    from pasco_tpu.ops.dense_ops import pack_z2, unpack_z2, pack_mask_z2, unpack_mask_z2

    r = np.random.RandomState(0)
    x = _rand_xzy(r, 4, 6, 5, 3)
    np.testing.assert_array_equal(np.asarray(unpack_z2(pack_z2(x))), np.asarray(x))
    m = jnp.asarray(r.rand(4, 6, 5) > 0.5)
    lo, hi = pack_mask_z2(m)
    np.testing.assert_array_equal(np.asarray(unpack_mask_z2(lo, hi)), np.asarray(m))


def test_conv3_packed_z2_matches_plain():
    from pasco_tpu.ops.dense_ops import conv3_packed_z2, pack_z2, unpack_z2

    r = np.random.RandomState(1)
    x = _rand_xzy(r, 5, 8, 6, 3)
    w = jnp.asarray(r.randn(27, 3, 4).astype(np.float32))
    b = jnp.asarray(r.randn(4).astype(np.float32))
    ref = conv3_dense(x, w, b, axis_order="xzy")
    out = unpack_z2(conv3_packed_z2(pack_z2(x), w, b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_down2_packed_variants_match_plain():
    from pasco_tpu.ops.dense_ops import (
        down2_packed_to_packed, down2_packed_to_plain, pack_z2, unpack_z2)

    r = np.random.RandomState(2)
    x = _rand_xzy(r, 6, 8, 4, 3)
    w = jnp.asarray(r.randn(8, 3, 5).astype(np.float32))
    b = jnp.asarray(r.randn(5).astype(np.float32))
    ref = down2_dense(x, w, b, axis_order="xzy")
    out = unpack_z2(down2_packed_to_packed(pack_z2(x), w, b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    out2 = down2_packed_to_plain(pack_z2(x), w, b)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_deconv2_packed_variants_match_plain():
    from pasco_tpu.ops.dense_ops import (
        deconv2_packed_to_packed, deconv2_plain_to_packed, pack_z2, unpack_z2)

    r = np.random.RandomState(3)
    x = _rand_xzy(r, 3, 4, 5, 6)
    w = jnp.asarray(r.randn(8, 6, 3).astype(np.float32))
    b = jnp.asarray(r.randn(3).astype(np.float32))
    ref = deconv2_dense(x, w, b, axis_order="xzy")
    out = unpack_z2(deconv2_plain_to_packed(x, w, b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    out2 = unpack_z2(deconv2_packed_to_packed(pack_z2(x), w, b))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_mask_mul_and_blockdiag_z2():
    from pasco_tpu.ops.dense_ops import (
        blockdiag2_weight, mask_mul_z2, pack_mask_z2, pack_z2, unpack_z2)

    r = np.random.RandomState(4)
    x = _rand_xzy(r, 4, 6, 5, 3)
    m = jnp.asarray(r.rand(4, 6, 5) > 0.4)
    lo, hi = pack_mask_z2(m)
    ref = jnp.where(m[..., None], x, 0)
    out = unpack_z2(mask_mul_z2(pack_z2(x), lo, hi))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    w = jnp.asarray(r.randn(3, 7).astype(np.float32))
    ref2 = jnp.dot(x.reshape(-1, 3), w).reshape(4, 6, 5, 7)
    xp = pack_z2(x)
    out2 = unpack_z2(
        jnp.dot(xp.reshape(-1, 6), blockdiag2_weight(w)).reshape(4, 3, 5, 14)
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_z_pack_model_equivalence():
    """z_pack=True/False share one parameter tree and must agree
    numerically (f32 compute to avoid bf16 reduction-order noise)."""
    import dataclasses

    from tests.test_model_forward import labelweights, make_input

    base = tiny_config(n_infers=1)
    cfg_off = base.replace(
        model=dataclasses.replace(base.model, z_pack=False,
                                  compute_dtype="float32")
    )
    cfg_on = base.replace(
        model=dataclasses.replace(base.model, z_pack=True,
                                  compute_dtype="float32")
    )
    inp = make_input(cfg_off, rng=3)
    lw = labelweights(cfg_off)
    net_off = DensePaSCoNet(cfg_off)
    net_on = DensePaSCoNet(cfg_on)
    variables = jax.jit(
        lambda i: net_off.init({"params": jax.random.PRNGKey(0)}, i, lw,
                               train=False)
    )(inp)
    out_off = jax.jit(lambda v, i: net_off.apply(v, i, lw, train=False))(
        variables, inp
    )
    out_on = jax.jit(lambda v, i: net_on.apply(v, i, lw, train=False))(
        variables, inp
    )
    np.testing.assert_allclose(
        np.asarray(out_on.sem_logits[1]), np.asarray(out_off.sem_logits[1]),
        rtol=2e-2, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_on.predictor.query_logits),
        np.asarray(out_off.predictor.query_logits),
        rtol=2e-2, atol=1e-2,
    )
    for scale in (1, 2, 4):
        a, b = out_on.sem_grids[scale], out_off.sem_grids[scale]
        assert np.array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_array_equal(np.asarray(a.coords), np.asarray(b.coords))
        np.testing.assert_allclose(
            np.asarray(a.feats), np.asarray(b.feats), rtol=2e-2, atol=1e-2
        )


@pytest.mark.slow  # multi-minute-class compile; fast tier keeps one guard per kernel family
def test_resize_bn_coords_train_matches_concat():
    """DenseBNResizeCoords' train=True path (mask-marginal coordinate BN
    statistics + running-stat updates) must match the unfused concat path
    — DenseBN + 1x1 conv over [features ⊕ coords] — in BOTH outputs (at
    valid cells) and updated batch_stats (round-3 advisor finding: the
    z_pack equivalence test only covered train=False)."""
    from pasco_tpu.core.sparse import Box
    from pasco_tpu.models.dense_unet import _mm, DenseBN, DenseBNResizeCoords
    from pasco_tpu.ops.dense_ops import cell_coords, pack_z2, unpack_z2

    r = np.random.RandomState(7)
    X, Z, Y, ch, co = 8, 6, 10, 5, 4
    scale = 2
    box = Box.create([2, -4, -6], [X * scale, Y * scale, Z * scale])
    mask = jnp.asarray(r.rand(X, Z, Y) > 0.35)
    x = jnp.asarray(r.randn(X, Z, Y, ch).astype(np.float32))
    x = _mm(x, mask, False)  # producer-masked, like the model
    wr = jnp.asarray(r.randn(ch + 3, co).astype(np.float32) * 0.3)
    br = jnp.asarray(r.randn(co).astype(np.float32) * 0.1)
    bn_scale = jnp.asarray(1.0 + 0.2 * r.randn(ch + 3).astype(np.float32))
    bn_bias = jnp.asarray(0.2 * r.randn(ch + 3).astype(np.float32))

    # Fused path (packed volume).
    fused = DenseBNResizeCoords()
    xp = pack_z2(x)
    vf = fused.init(jax.random.PRNGKey(0), xp, mask, box, scale, wr, br, True)
    vf = jax.tree_util.tree_map(lambda a: a, vf)  # unfreeze-safe copy
    vf = {
        "params": {"scale": bn_scale, "bias": bn_bias},
        "batch_stats": vf["batch_stats"],
    }
    out_f, mut_f = fused.apply(
        vf, xp, mask, box, scale, wr, br, True, mutable=["batch_stats"]
    )
    out_f = unpack_z2(out_f)

    # Reference concat path (unpacked): BN over [x ⊕ masked coords], then
    # the 1x1 resize dot — exactly the model's pk=False branch.
    norm_c = (
        cell_coords(box, scale, "xzy").astype(jnp.float32) / scale
    )
    xc = jnp.concatenate([x, _mm(norm_c, mask, False)], axis=-1)
    bn = DenseBN()
    vb = bn.init(jax.random.PRNGKey(0), xc, mask, True)
    vb = {
        "params": {"scale": bn_scale, "bias": bn_bias},
        "batch_stats": vb["batch_stats"],
    }
    out_b, mut_b = bn.apply(vb, xc, mask, True, mutable=["batch_stats"])
    ref = jnp.dot(out_b.reshape(-1, ch + 3), wr).reshape(X, Z, Y, co) + br

    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut_f["batch_stats"][k]),
            np.asarray(mut_b["batch_stats"][k]),
            rtol=1e-5, atol=1e-6,
        )
    # Fused leaves garbage at empty cells by contract — compare valid only.
    np.testing.assert_allclose(
        np.asarray(_mm(out_f, mask, False)),
        np.asarray(_mm(ref, mask, False)),
        rtol=1e-4, atol=1e-4,
    )


def test_compact_src_matches_nonzero():
    from pasco_tpu.ops.dense_ops import compact_src

    r = np.random.RandomState(11)
    for n, cap, p in ((257, 64, 0.3), (1024, 2000, 0.9), (96, 8, 0.5), (33, 4, 0.0)):
        keep = r.rand(n) < p
        src, valid, total = jax.jit(compact_src, static_argnums=1)(
            jnp.asarray(keep), cap
        )
        exp = np.nonzero(keep)[0]
        k = min(cap, len(exp))
        assert int(total) == len(exp)
        assert int(np.asarray(valid).sum()) == k
        assert np.array_equal(np.asarray(src)[:k], exp[:k])
