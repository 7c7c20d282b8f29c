"""Numerical parity against the reference implementation itself.

These tests import the REFERENCE's own torch modules (from
``/root/reference``, read-only) for every component that does not require
MinkowskiEngine, convert their weights with
:mod:`pasco_tpu.training.convert_torch`'s primitives, and assert the JAX
forward matches the torch forward on the same inputs.  This is the
strongest parity statement available without the released ``.ckpt``
binaries (unreachable from this sandbox): it validates the whole
block-level math — attention layers (incl. the residual-on-normed-stream
quirks), the SCPNet bottleneck, the sine PE's degenerate normalise, the
Lovász loss, and the matcher's cost matrices — not just per-layer weight
layouts (those are covered by ``tests/test_convert_torch.py``).

Skipped wholesale when ``/root/reference`` is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _import_ref(modname):
    """Import a reference module; stub MinkowskiEngine (only referenced
    inside constructors of classes these tests never instantiate)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "MinkowskiEngine" not in sys.modules:
        stub = types.ModuleType("MinkowskiEngine")

        class _MEBase:
            pass

        def _getattr(name):
            return _MEBase

        stub.__getattr__ = _getattr
        stub.MinkowskiModuleBase = _MEBase
        sys.modules["MinkowskiEngine"] = stub
    import importlib

    return importlib.import_module(modname)


def test_sine_pe_matches_reference():
    pe_mod = _import_ref("pasco.models.transformer.position_encoding")
    from pasco_tpu.models.transformer import sine_position_encoding

    npf = 64
    layer = pe_mod.PositionEmbeddingSineSparse(npf, normalize=True)
    coords = np.random.RandomState(0).randint(0, 300, (128, 3))
    ref = layer(torch.from_numpy(coords)).numpy()
    got = np.asarray(sine_position_encoding(jnp.asarray(coords), npf))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_lovasz_matches_reference():
    lv = _import_ref("pasco.loss.lovasz")
    from pasco_tpu.loss.lovasz import lovasz_softmax

    r = np.random.RandomState(1)
    N, C = 500, 8
    logits = r.randn(N, C).astype(np.float32)
    labels = r.randint(0, C, N)
    valid = r.rand(N) > 0.3

    ref = lv.lovasz_softmax_flat(
        torch.from_numpy(logits[valid]),
        torch.from_numpy(labels[valid]),
        classes="present",
        ignores=[],
    )
    got = lovasz_softmax(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid)
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4, atol=1e-5)


def test_matcher_costs_match_reference():
    ms = _import_ref("pasco.loss.matcher_sparse")
    from pasco_tpu.loss.matcher import batch_dice_cost, batch_focal_cost

    r = np.random.RandomState(2)
    N, Q, T = 400, 16, 7
    logits = r.randn(N, Q).astype(np.float32)
    targets = (r.rand(N, T) > 0.7).astype(np.float32)
    valid = np.ones(N, bool)   # reference operates on pre-filtered rows

    ref_dice = ms.batch_dice_loss(
        torch.from_numpy(logits.T), torch.from_numpy(targets.T)
    ).numpy()
    got_dice = np.asarray(
        batch_dice_cost(jnp.asarray(logits), jnp.asarray(targets),
                        jnp.asarray(valid))
    )
    np.testing.assert_allclose(got_dice, ref_dice, rtol=1e-4, atol=1e-5)

    ref_focal = ms.batch_sigmoid_focal_loss(
        torch.from_numpy(logits.T), torch.from_numpy(targets.T),
        alpha=0.25, gamma=2.0,
    ).numpy()
    got_focal = np.asarray(
        batch_focal_cost(jnp.asarray(logits), jnp.asarray(targets),
                         jnp.asarray(valid))
    )
    np.testing.assert_allclose(got_focal, ref_focal, rtol=1e-4, atol=1e-5)


def _ln_params(ln):
    return {
        "scale": jnp.asarray(ln.weight.detach().numpy()),
        "bias": jnp.asarray(ln.bias.detach().numpy()),
    }


def _mha_params(mha, hidden):
    from pasco_tpu.training.convert_torch import split_mha_in_proj

    qkv = split_mha_in_proj(
        mha.in_proj_weight.detach().numpy(),
        mha.in_proj_bias.detach().numpy(),
    )
    out = {}
    for name, part in zip(("q_proj", "k_proj", "v_proj"), qkv):
        out[name] = {
            "kernel": jnp.asarray(part["kernel"]),
            "bias": jnp.asarray(part["bias"]),
        }
    out["out_proj"] = {
        "kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
        "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
    }
    return out


def test_self_attention_layer_matches_reference():
    blocks = _import_ref("pasco.models.transformer.blocks")
    import jax

    from pasco_tpu.models.transformer import SelfAttentionLayer

    H, heads, Q = 48, 4, 10
    torch.manual_seed(0)
    ref_layer = blocks.SelfAttentionLayer(H, heads, dropout=0.0).eval()
    r = np.random.RandomState(3)
    q_embed = r.randn(Q, H).astype(np.float32)
    q_pos = r.randn(Q, H).astype(np.float32)

    with torch.no_grad():
        ref = ref_layer(
            torch.from_numpy(q_embed[None]),
            query_pos=torch.from_numpy(q_pos[None]),
        ).numpy()[0]

    params = _mha_params(ref_layer.self_attn, H)
    params["norm"] = _ln_params(ref_layer.norm)
    got = SelfAttentionLayer(H, heads).apply(
        {"params": params}, jnp.asarray(q_embed), jnp.asarray(q_pos)
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_cross_attention_layer_matches_reference():
    blocks = _import_ref("pasco.models.transformer.blocks")
    from pasco_tpu.models.transformer import CrossAttentionLayer

    H, heads, Q, N = 48, 4, 10, 64
    torch.manual_seed(1)
    ref_layer = blocks.CrossAttentionLayer(H, heads, dropout=0.0).eval()
    r = np.random.RandomState(4)
    q_embed = r.randn(Q, H).astype(np.float32)
    q_pos = r.randn(Q, H).astype(np.float32)
    src = r.randn(N, H).astype(np.float32)
    pos = r.randn(N, H).astype(np.float32)
    allowed = r.rand(N, Q) > 0.4
    allowed[:3] = True   # every query sees at least a few keys

    # torch attn_mask: True = NOT allowed, per-query rows [Q, N]
    attn_mask = torch.from_numpy(~allowed.T)
    with torch.no_grad():
        ref = ref_layer(
            torch.from_numpy(q_embed[None]),
            torch.from_numpy(src[None]),
            attn_mask=attn_mask,
            pos=torch.from_numpy(pos[None]),
            query_pos=torch.from_numpy(q_pos[None]),
        ).numpy()[0]

    params = _mha_params(ref_layer.multihead_attn, H)
    params["norm"] = _ln_params(ref_layer.norm)
    got = CrossAttentionLayer(H, heads, kv_chunk=16).apply(
        {"params": params},
        jnp.asarray(q_embed), jnp.asarray(src), jnp.asarray(allowed),
        jnp.asarray(pos), jnp.asarray(q_pos),
    )
    # bf16 tolerance: the online-softmax attention streams KV in bfloat16
    # (ops/attention.py:43-46) while torch computes in f32.
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-2, atol=3e-2)


def test_ffn_layer_matches_reference():
    blocks = _import_ref("pasco.models.transformer.blocks")
    from pasco_tpu.models.transformer import FFNLayer

    H, F = 48, 96
    torch.manual_seed(2)
    ref_layer = blocks.FFNLayer(H, dim_feedforward=F, dropout=0.0).eval()
    x = np.random.RandomState(5).randn(10, H).astype(np.float32)
    with torch.no_grad():
        ref = ref_layer(torch.from_numpy(x[None])).numpy()[0]

    params = {
        "norm": _ln_params(ref_layer.norm),
        "fc1": {
            "kernel": jnp.asarray(ref_layer.linear1.weight.detach().numpy().T),
            "bias": jnp.asarray(ref_layer.linear1.bias.detach().numpy()),
        },
        "fc2": {
            "kernel": jnp.asarray(ref_layer.linear2.weight.detach().numpy().T),
            "bias": jnp.asarray(ref_layer.linear2.bias.detach().numpy()),
        },
    }
    got = FFNLayer(H, F).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_spcdense3dv2_matches_reference():
    """Whole SCPNet bottleneck block, reference torch forward vs our JAX
    forward with converted weights (eval mode, running BN stats)."""
    layers = _import_ref("pasco.models.layers")
    import jax

    from pasco_tpu.models.bottleneck import SPCDense3D
    from pasco_tpu.training.convert_torch import convert_conv3d

    ch = 16
    torch.manual_seed(3)
    ref_block = layers.SPCDense3Dv2(init_size=ch)
    # randomise BN running stats so eval mode is non-trivial
    for m in ref_block.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.num_features) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features) + 0.5)
    ref_block.eval()

    x = np.random.RandomState(6).randn(1, ch, 12, 12, 4).astype(np.float32)
    with torch.no_grad():
        ref = ref_block(torch.from_numpy(x)).numpy()

    conv_of = {
        "a1": "a_conv1", "a2": "a_conv2", "a3": "a_conv3", "a4": "a_conv4",
        "a5": "a_conv5", "a6": "a_conv6", "a7": "a_conv7",
        "ch1": "ch_conv1", "r1": "res_1", "r2": "res_2", "r3": "res_3",
    }
    bn_of = {
        "a1": "bn_1", "a2": "bn_2", "a3": "bn_3", "a4": "bn_4",
        "a5": "bn_5", "a6": "bn_6", "a7": "bn_7",
        "ch1": "bn_ch_conv1", "r1": "bn_res_1", "r2": "bn_res_2",
        "r3": "bn_res_3",
    }
    sd = {k: v.detach().numpy() for k, v in ref_block.state_dict().items()}
    params, stats = {}, {}
    for ours, theirs in conv_of.items():
        params[f"{ours}_conv"] = {
            "kernel": jnp.asarray(convert_conv3d(sd[f"{theirs}.0.weight"]))
        }
        bn = bn_of[ours]
        params[f"{ours}_bn"] = {
            "scale": jnp.asarray(sd[f"{bn}.weight"]),
            "bias": jnp.asarray(sd[f"{bn}.bias"]),
        }
        stats[f"{ours}_bn"] = {
            "mean": jnp.asarray(sd[f"{bn}.running_mean"]),
            "var": jnp.asarray(sd[f"{bn}.running_var"]),
        }

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NCXYZ -> NXYZC
    got = jax.jit(
        lambda xx: SPCDense3D(compute_dtype=jnp.float32).apply(
            {"params": params, "batch_stats": stats}, xx, False
        )
    )(xj)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
