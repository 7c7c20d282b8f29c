"""WaffleIron training harness: loss/metrics/schedule/step/trainer."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasco_tpu.models.waffleiron import Segmenter
from pasco_tpu.training.waffleiron_train import (
    Compose,
    Crop,
    FlipXY,
    LimitNumPoints,
    RandomApply,
    Rotation,
    Scale,
    Voxelize,
    WaffleIronTrainer,
    build_point_batch,
    create_waffle_state,
    fast_hist,
    make_waffleiron_optimizer,
    overall_accuracy,
    per_class_iu,
    semseg_loss,
    warmup_cosine_factor,
    waffleiron_eval_step,
    waffleiron_train_step,
)


def _tiny_net():
    return Segmenter(
        n_classes=5, channels=16, depth=2, in_channels=5,
        grids_shape=((12, 12), (12, 4), (12, 4)),
    )


def _cloud(r, n=200, n_classes=5):
    xyz = r.randn(n, 3).astype(np.float32) * 5
    pc = np.concatenate(
        [xyz, r.rand(n, 2).astype(np.float32)], axis=1
    )
    lab = (np.floor(xyz[:, 0]) % n_classes).astype(np.int32)
    lab[r.rand(n) < 0.1] = 255
    return pc, lab


def test_semseg_loss_matches_manual_ce():
    r = np.random.RandomState(0)
    logits = jnp.asarray(r.randn(40, 5).astype(np.float32))
    labels = jnp.asarray(r.randint(0, 5, 40).astype(np.int32))
    labels = labels.at[3].set(255)
    valid = jnp.ones(40, bool).at[7].set(False)
    got = semseg_loss(logits, labels, valid, lovasz_weight=0.0)
    keep = np.asarray(valid) & (np.asarray(labels) != 255)
    lp = jax.nn.log_softmax(logits, axis=-1)
    want = -np.mean(
        np.asarray(lp)[np.arange(40), np.asarray(labels) * keep][keep]
    )
    assert np.isclose(float(got), want, rtol=1e-5)


def test_fast_hist_and_iou():
    pred = jnp.asarray([0, 1, 1, 2, 2, 2])
    lab = jnp.asarray([0, 1, 2, 2, 2, 255])
    valid = jnp.ones(6, bool)
    h = np.asarray(fast_hist(pred, lab, valid, 3))
    assert h.sum() == 5                      # ignore dropped
    assert h[0, 0] == 1 and h[1, 1] == 1 and h[2, 2] == 2 and h[2, 1] == 1
    ious = per_class_iu(h)
    assert np.isclose(ious[0], 1.0)
    assert np.isclose(ious[2], 2 / 3)        # tp=2 fp=0 fn=1
    assert np.isclose(overall_accuracy(h), 4 / 5)


def test_warmup_cosine_matches_reference_formula():
    fn = warmup_cosine_factor(100, 1000, 0.001)
    # reference WaffleIron_mod/utils/scheduler.py:19-33
    for it in (0, 10, 99, 100, 500, 999):
        if it < 100:
            want = it / 100
        else:
            t = (it - 100) / 900 * np.pi
            want = 0.001 + 0.5 * (1 - 0.001) * (np.cos(t) + 1)
        assert np.isclose(float(fn(it)), want, rtol=1e-5), it


def test_transforms_shapes_and_semantics():
    r = np.random.RandomState(1)
    pc, lab = _cloud(r, 300)
    aug = Compose(
        [
            Crop(fov=((-20, -20, -8), (20, 20, 8))),
            Voxelize(voxel_size=0.5, rng=r),
            LimitNumPoints(max_point=100, rng=r),
            RandomApply(Rotation(rng=r), prob=1.0, rng=r),
            RandomApply(FlipXY(rng=r), prob=1.0, rng=r),
            RandomApply(Scale(rng=r), prob=1.0, rng=r),
        ]
    )
    pc2, lab2 = aug(pc, lab)
    assert pc2.shape[0] == lab2.shape[0] <= 100
    # rotation/flip/scale preserve radius ordering up to scale; z untouched
    # by rotation about z and flip in x/y
    assert pc2.shape[1] == pc.shape[1]


@pytest.mark.slow
def test_train_step_decreases_loss_and_trainer_roundtrip(tmp_path):
    r = np.random.RandomState(2)
    net = _tiny_net()
    clouds, labels = zip(*[_cloud(r) for _ in range(2)])
    batch = build_point_batch(
        list(clouds), list(labels), num_points=256,
        grids_shape=net.grids_shape, fov=20.0,
    )
    tx = make_waffleiron_optimizer(lr=3e-3, warmup_end=1, max_iter=100)
    state = create_waffle_state(net, batch, tx, jax.random.PRNGKey(0))
    step = jax.jit(
        lambda s, b: waffleiron_train_step(s, b, net=net, tx=tx)
    )
    losses = []
    for _ in range(6):
        state, logs = step(state, batch)
        losses.append(float(logs["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]

    ev = jax.jit(lambda s, b: waffleiron_eval_step(s, b, net=net))
    logs = ev(state, batch)
    assert np.isfinite(float(logs["loss"]))
    assert np.asarray(logs["hist"]).shape == (5, 5)

    trainer = WaffleIronTrainer(net, tx, state, str(tmp_path))
    trainer.one_epoch([batch], training=True)
    scores = trainer.one_epoch([batch], training=False)
    assert 0 <= scores["mIoU"] <= 100
    trainer.best_miou = scores["mIoU"]
    trainer.save_state(best=True)
    trainer.save_state()
    step_before = int(trainer.state.step)
    trainer.load_state()
    assert int(trainer.state.step) == step_before


def test_instance_cutmix_bank_and_mix():
    """InstanceCutMix (reference semantic_kitti.py:27-152): cut pass
    harvests centered instances; mix pass pastes them on surface points."""
    from pasco_tpu.training.waffleiron_train import InstanceCutMix

    rng = np.random.RandomState(0)
    cm = InstanceCutMix(num_to_add=5, rng=rng)

    # Scan: a road plane (class 8) + one 10-point person instance (class 5).
    road = np.concatenate(
        [rng.uniform(-20, 20, (300, 2)), np.zeros((300, 1)),
         rng.rand(300, 1)], axis=1
    ).astype(np.float32)
    person = np.concatenate(
        [rng.uniform(4, 5, (10, 2)), rng.uniform(0, 1.8, (10, 1)),
         rng.rand(10, 1)], axis=1
    ).astype(np.float32)
    pc = np.concatenate([road, person], 0)
    labels = np.concatenate(
        [np.full(300, 8, np.int32), np.full(10, 5, np.int32)]
    )
    inst = np.concatenate([np.zeros(300, np.int32), np.full(10, 7, np.int32)])

    out, _ = cm(pc, labels, inst)   # bank-building pass
    assert out is None
    assert len(cm.bank[5]) == 1
    # centered: xy mean ~0, z min == 0
    b = cm.bank[5][0]
    np.testing.assert_allclose(b[:, :2].mean(0), 0, atol=1e-5)
    assert abs(b[:, 2].min()) < 1e-6

    cm.finalize_bank()
    mixed_pc, mixed_lab = cm(pc, labels)
    assert mixed_pc.shape[0] >= pc.shape[0]
    added = mixed_pc.shape[0] - pc.shape[0]
    assert added % 10 == 0   # whole person instances pasted
    if added:
        assert (mixed_lab == 5).sum() == 10 + added
