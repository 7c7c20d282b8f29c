"""End-to-end forward smoke tests for the tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasco_tpu.core.config import tiny_config
from pasco_tpu.models.unet import ModelInput, PaSCoNet


def make_input(cfg, rng, n_pts=512):
    m = cfg.model
    P = cfg.capacity.num_points
    S = m.n_infers
    ex, ey, ez = cfg.scene.scene_size
    r = np.random.RandomState(rng)
    coords = np.zeros((P, 4), np.int32)
    coords[:, 0] = r.randint(0, S, P)
    coords[:, 1] = r.randint(0, ex, P)
    coords[:, 2] = r.randint(0, ey, P)
    coords[:, 3] = r.randint(0, ez, P)
    feats = r.randn(P, m.in_channels).astype(np.float32)
    mask = np.arange(P) < n_pts
    gmin = np.zeros(3, np.int32)
    gmax = np.array([ex - 1, ey - 1, ez - 1], np.int32)
    return ModelInput(
        point_feats=jnp.asarray(feats),
        point_coords=jnp.asarray(coords),
        point_mask=jnp.asarray(mask),
        global_min=jnp.asarray(gmin),
        global_max=jnp.asarray(gmax),
        subnet_min=jnp.tile(gmin[None], (S, 1)),
        subnet_max=jnp.tile(gmax[None], (S, 1)),
    )


def labelweights(cfg):
    c = cfg.model.n_classes
    w = jnp.ones((c,), jnp.float32)
    return {1: w, 2: w, 4: w}


@pytest.mark.slow
@pytest.mark.parametrize("n_infers", [1, 2])
def test_forward_shapes(n_infers):
    cfg = tiny_config(n_infers=n_infers)
    net = PaSCoNet(cfg)
    inp = make_input(cfg, rng=0)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = net.init(rngs, inp, labelweights(cfg), train=False)
    out = net.apply(variables, inp, labelweights(cfg), train=False)

    S = n_infers
    C = cfg.model.n_classes
    Q = cfg.model.transformer.num_queries
    cap1 = cfg.capacity.dec_s1
    p1 = cfg.capacity.panop_s1

    assert set(out.sem_logits.keys()) == {1, 2, 4}
    assert out.sem_logits[1].shape == (cap1, S, C)
    assert out.sem_grids[1].feats.shape == (cap1, cfg.model.f)
    assert out.sem_logits_pruned.shape == (S, p1, C)
    assert out.predictor.query_logits.shape == (S, Q, C + 1)
    assert out.predictor.voxel_logits.shape == (S, p1, Q)
    assert len(out.predictor.aux) == 3
    # No NaNs anywhere in the outputs.
    for leaf in jax.tree_util.tree_leaves(out):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert jnp.all(jnp.isfinite(leaf)), "non-finite output"


@pytest.mark.slow
def test_forward_train_mode_with_sampling():
    cfg = tiny_config(n_infers=2)
    net = PaSCoNet(cfg)
    inp = make_input(cfg, rng=1)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "sample": jax.random.PRNGKey(2),
    }
    variables = net.init(rngs, inp, labelweights(cfg), train=True)
    out, mutated = net.apply(
        variables,
        inp,
        labelweights(cfg),
        train=True,
        rngs={"dropout": jax.random.PRNGKey(3), "sample": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    assert out.predictor is not None


@pytest.mark.slow
def test_forward_jit_compiles_once():
    cfg = tiny_config(n_infers=1)
    net = PaSCoNet(cfg)
    inp = make_input(cfg, rng=2)
    variables = net.init(
        {"params": jax.random.PRNGKey(0)}, inp, labelweights(cfg), train=False
    )

    calls = 0

    @jax.jit
    def fwd(v, i):
        nonlocal calls
        calls += 1
        return net.apply(v, i, labelweights(tiny_config(n_infers=1)), train=False)

    fwd(variables, inp)
    inp2 = make_input(tiny_config(n_infers=1), rng=3, n_pts=300)
    fwd(variables, inp2)  # different point count, same shapes -> no retrace
    assert calls == 1
