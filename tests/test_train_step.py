"""End-to-end pipeline test: synthetic scene -> labels -> collate -> train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from pasco_tpu.core.config import tiny_config
from pasco_tpu.data.semantic_kitti.collate import collate
from pasco_tpu.data.semantic_kitti.dataset import process_scene
from pasco_tpu.data.synthetic import make_scene
from pasco_tpu.models.unet import PaSCoNet
from pasco_tpu.training import step as tstep


def build_batch(cfg, n_infers, seed=0):
    rng = np.random.RandomState(seed)
    subnets = []
    for s in range(n_infers):
        scene = make_scene(
            rng, scene_size=cfg.scene.scene_size, n_points=1500,
            point_feat_dim=cfg.model.in_channels - 6, n_things=3,
        )
        subnets.append(process_scene(scene, None, rng))
    return collate(subnets, cfg, max_targets=32)


@pytest.mark.slow
@pytest.mark.parametrize("n_infers", [1, 2])
def test_train_step_decreases_loss(n_infers):
    import dataclasses

    from pasco_tpu.core.config import OptimConfig

    cfg = tiny_config(n_infers=n_infers)
    cfg = cfg.replace(optim=OptimConfig(lr=1e-3, warmup_steps=0))
    net = PaSCoNet(cfg)
    scene = build_batch(cfg, n_infers)
    inp = tstep.scene_to_model_input(scene)
    targets = tstep.targets_to_device(scene.targets)

    freqs = {s: np.ones(cfg.model.n_classes) for s in (1, 2, 4)}
    lw = tstep.labelweights_for(cfg, freqs)
    cw = jnp.asarray(
        tstep.class_weight_vector(cfg.model.n_classes, cfg.loss.no_object_weight)
    )

    state, tx = tstep.create_train_state(
        net, cfg, inp, lw, jax.random.PRNGKey(0)
    )

    step_fn = jax.jit(
        partial(
            tstep.train_step,
            net=net, tx=tx, labelweights=lw, class_weight=cw, cfg=cfg,
        )
    )
    losses = []
    for i in range(5):
        state, logs = step_fn(state, inp, targets, jax.random.PRNGKey(1))
        losses.append(float(logs["total_loss"]))
        assert np.isfinite(losses[-1]), logs
        assert float(logs["grad_norm"]) > 0
    # Optimizing the same batch must reduce the loss.
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_eval_forward_on_synthetic():
    cfg = tiny_config(n_infers=1)
    net = PaSCoNet(cfg)
    scene = build_batch(cfg, 1, seed=3)
    inp = tstep.scene_to_model_input(scene)
    freqs = {s: np.ones(cfg.model.n_classes) for s in (1, 2, 4)}
    lw = tstep.labelweights_for(cfg, freqs)
    variables = jax.jit(
        lambda i: net.init({"params": jax.random.PRNGKey(0)}, i, lw, train=False)
    )(inp)
    out = jax.jit(partial(tstep.eval_step, net=net, labelweights=lw))(
        variables, inp
    )
    assert out.predictor is not None
    assert np.isfinite(np.asarray(out.predictor.query_logits)).all()
