"""Torch->JAX checkpoint converter tests.

Two layers of validation (the released ``.ckpt`` files are not on disk):

1. **Structural**: a synthetic state_dict with the reference ``Net``'s
   exact keys/shapes (``reference_state_dict_spec``, derived from the
   reference module definitions) must convert to a tree whose params /
   batch_stats exactly match ``DensePaSCoNet.init``'s tree — every leaf,
   every shape, no unmatched reference keys.
2. **Numerical**: each layout transform (Linear, Conv3d, MultiheadAttention
   in_proj split, BatchNorm) is checked against torch CPU outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasco_tpu.core.config import tiny_config
from pasco_tpu.training.convert_torch import (
    convert_conv3d,
    convert_linear,
    convert_reference_checkpoint,
    me_kernel_permutation,
    split_mha_in_proj,
    synthetic_reference_state_dict,
)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


@pytest.mark.slow
@pytest.mark.parametrize("n_infers", [1, 2])
def test_converter_matches_dense_tree(n_infers):
    from tests.test_model_forward import labelweights, make_input
    from pasco_tpu.models.dense_unet import DensePaSCoNet

    cfg = tiny_config(n_infers=n_infers)
    net = DensePaSCoNet(cfg)
    inp = make_input(cfg, rng=0)
    variables = net.init(
        {"params": jax.random.PRNGKey(0)}, inp, labelweights(cfg), train=False
    )

    m = cfg.model
    sd = synthetic_reference_state_dict(
        np.random.RandomState(0),
        n_infers=n_infers,
        f=m.f,
        n_classes=m.n_classes,
        in_channels=m.in_channels,
        hidden_dim=m.transformer.hidden_dim,
        num_queries=m.transformer.num_queries,
        dim_feedforward=m.transformer.dim_feedforward,
    )
    params, stats, unmatched = convert_reference_checkpoint(sd, n_infers)
    assert unmatched == [], f"unconverted reference keys: {unmatched[:10]}"

    want_p = _flatten(variables["params"])
    got_p = _flatten(params)
    missing = sorted(set(want_p) - set(got_p))
    surplus = sorted(set(got_p) - set(want_p))
    assert not missing, f"converter missing params: {missing[:10]}"
    assert not surplus, f"converter surplus params: {surplus[:10]}"
    for k in want_p:
        assert got_p[k].shape == want_p[k].shape, (
            f"{k}: converted {got_p[k].shape} != model {want_p[k].shape}"
        )

    want_s = _flatten(variables["batch_stats"])
    got_s = _flatten(stats)
    assert set(want_s) == set(got_s), (
        f"batch_stats mismatch: missing={sorted(set(want_s) - set(got_s))[:10]} "
        f"surplus={sorted(set(got_s) - set(want_s))[:10]}"
    )
    for k in want_s:
        assert got_s[k].shape == want_s[k].shape


@pytest.mark.slow
def test_converted_tree_runs_forward():
    """Converted weights must be directly loadable into apply()."""
    from tests.test_model_forward import labelweights, make_input
    from pasco_tpu.models.dense_unet import DensePaSCoNet

    cfg = tiny_config(n_infers=1)
    net = DensePaSCoNet(cfg)
    inp = make_input(cfg, rng=0)
    m = cfg.model
    sd = synthetic_reference_state_dict(
        np.random.RandomState(1),
        n_infers=1,
        f=m.f,
        n_classes=m.n_classes,
        in_channels=m.in_channels,
        hidden_dim=m.transformer.hidden_dim,
        num_queries=m.transformer.num_queries,
        dim_feedforward=m.transformer.dim_feedforward,
    )
    params, stats, _ = convert_reference_checkpoint(sd, 1)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }
    out = net.apply(variables, inp, labelweights(cfg), train=False)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.inexact):
            assert bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32))))


# ---------------------------------------------------------------------------
# numerical layout-transform checks vs torch CPU
# ---------------------------------------------------------------------------


def test_linear_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(12, 7)
    x = np.random.RandomState(0).randn(5, 12).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()
    p = convert_linear(lin.weight.detach().numpy(), lin.bias.detach().numpy())
    got = x @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv3d_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    from pasco_tpu.models.bottleneck import shift_matmul_conv3d

    conv = torch.nn.Conv3d(6, 6, (3, 3, 1), padding=(1, 1, 0), bias=False)
    x = np.random.RandomState(0).randn(1, 6, 8, 8, 4).astype(np.float32)
    want = conv(torch.from_numpy(x)).detach().numpy()  # [1, C, X, Y, Z]
    w = convert_conv3d(conv.weight.detach().numpy())   # [kx, ky, kz, in, out]
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))            # [1, X, Y, Z, C]
    got = np.asarray(shift_matmul_conv3d(jnp.asarray(x_cl), jnp.asarray(w)))
    got = np.transpose(got, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mha_in_proj_split_matches_torch():
    torch = pytest.importorskip("torch")
    H, nh, B, Nq, Nk = 16, 4, 2, 5, 7
    mha = torch.nn.MultiheadAttention(H, nh, batch_first=True)
    r = np.random.RandomState(0)
    q = r.randn(B, Nq, H).astype(np.float32)
    k = r.randn(B, Nk, H).astype(np.float32)
    with torch.no_grad():
        want = (
            mha(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(k))[0]
            .numpy()
        )
    qp, kp, vp = split_mha_in_proj(
        mha.in_proj_weight.detach().numpy(), mha.in_proj_bias.detach().numpy()
    )
    op = convert_linear(
        mha.out_proj.weight.detach().numpy(), mha.out_proj.bias.detach().numpy()
    )
    dh = H // nh

    def heads(x, p):
        y = x @ p["kernel"] + p["bias"]
        return y.reshape(*y.shape[:-1], nh, dh)

    qh, kh, vh = heads(q, qp), heads(k, kp), heads(k, vp)
    logits = np.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(dh)
    attn = np.exp(logits - logits.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    ctx = np.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, Nq, H)
    got = ctx @ op["kernel"] + op["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bn_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    from pasco_tpu.models.norm import MaskedBatchNorm

    bn = torch.nn.BatchNorm1d(9)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(9) + 0.5)
        bn.bias.copy_(torch.rand(9))
        bn.running_mean.copy_(torch.randn(9))
        bn.running_var.copy_(torch.rand(9) + 0.5)
    bn.eval()
    x = np.random.RandomState(0).randn(11, 9).astype(np.float32)
    want = bn(torch.from_numpy(x)).detach().numpy()

    mod = MaskedBatchNorm()
    variables = {
        "params": {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
        },
        "batch_stats": {
            "mean": jnp.asarray(bn.running_mean.numpy()),
            "var": jnp.asarray(bn.running_var.numpy()),
        },
    }
    got = mod.apply(
        variables, jnp.asarray(x), jnp.ones(11, bool), False
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_me_kernel_permutation_is_permutation():
    for ks in (2, 3):
        perm = me_kernel_permutation(ks)
        assert sorted(perm.tolist()) == list(range(ks**3))
    # centre tap of an odd kernel is a fixed point in both orders
    assert me_kernel_permutation(3)[13] == 13
