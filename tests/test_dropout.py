"""Dropout parity: train-mode stochasticity + MC-dropout at inference.

Reference recipe (``scripts/train.py:36-42,83-87``): transformer dropout
0.2, point dropout 0.05 (``encoder_dropouts[0]``), optional spatial
dropout per stage (``net_3d_dropout``), and the ``enable_dropout``
MC-dropout switch (``pasco/utils/torch_util.py:34-40``).  These tests
assert the machinery works in the dense (production) substrate: dropout
draws change the outputs in train mode and in MC mode, and plain eval is
deterministic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasco_tpu.core.config import TransformerConfig, tiny_config
from pasco_tpu.models.unet import build_net
from tests.test_model_forward import labelweights, make_input


def _dropout_cfg(substrate="dense"):
    base = tiny_config(n_infers=1)
    m = dataclasses.replace(
        base.model,
        substrate=substrate,
        encoder_dropouts=(0.05, 0.0, 0.0, 0.2, 0.2, 0.2),
        decoder_dropouts=(0.2, 0.2, 0.2, 0.0, 0.0),
        dense3d_dropout=0.2,
        transformer=dataclasses.replace(base.model.transformer, dropout=0.2),
    )
    return base.replace(model=m)


def _flat_sum(out):
    leaves = [
        x.astype(jnp.float32).sum()
        for x in jax.tree_util.tree_leaves(out)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
    ]
    return float(sum(leaves))


@pytest.mark.slow
def test_train_mode_dropout_is_stochastic():
    cfg = _dropout_cfg()
    net = build_net(cfg)
    lw = labelweights(cfg)
    inp = make_input(cfg, rng=0)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda i: net.init(
            {"params": k, "dropout": k, "sample": k}, i, lw, train=False
        )
    )(inp)

    def fwd(seed):
        out, _ = net.apply(
            variables, inp, lw, train=True,
            rngs={
                "dropout": jax.random.PRNGKey(seed),
                "sample": jax.random.PRNGKey(7),
            },
            mutable=["batch_stats"],
        )
        return _flat_sum(out)

    a, b = fwd(1), fwd(2)
    assert np.isfinite(a) and np.isfinite(b)
    assert a != b, "different dropout rngs must give different train outputs"


@pytest.mark.slow
def test_eval_deterministic_and_mc_dropout_varies():
    cfg = _dropout_cfg()
    net = build_net(cfg)
    lw = labelweights(cfg)
    inp = make_input(cfg, rng=0)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda i: net.init(
            {"params": k, "dropout": k, "sample": k}, i, lw, train=False
        )
    )(inp)

    # Plain eval: no dropout rng needed, bit-deterministic.
    e1 = _flat_sum(net.apply(variables, inp, lw, train=False))
    e2 = _flat_sum(net.apply(variables, inp, lw, train=False))
    assert e1 == e2

    # MC dropout: dropout live at inference, samples differ from the
    # deterministic forward and across rngs (variance > 0).
    def mc(seed):
        return _flat_sum(
            net.apply(
                variables, inp, lw, train=False, mc_dropout=True,
                rngs={"dropout": jax.random.PRNGKey(seed)},
            )
        )

    m1, m2 = mc(1), mc(2)
    assert np.isfinite(m1) and np.isfinite(m2)
    assert m1 != m2, "MC-dropout samples must vary with the rng"
    assert m1 != e1 or m2 != e1


@pytest.mark.slow
def test_zero_rates_add_no_dropout_params():
    """The released recipe (all spatial rates 0) must produce the exact
    same param tree as before the dropout wiring — checkpoint parity."""
    cfg = tiny_config(n_infers=1)
    assert cfg.model.transformer.dropout == 0.0
    net = build_net(cfg)
    lw = labelweights(cfg)
    inp = make_input(cfg, rng=0)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda i: net.init({"params": k}, i, lw, train=False)
    )(inp)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert not any("drop" in n.lower() for n in names)
    # eval forward needs no dropout rng at zero rates
    _ = net.apply(variables, inp, lw, train=False)
