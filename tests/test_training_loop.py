"""End-to-end training loop: data -> steps -> validation -> checkpoint."""

import os

import numpy as np
import pytest

from pasco_tpu.core.config import tiny_config
from pasco_tpu.data.synthetic import SyntheticKittiDataset
from pasco_tpu.training.loop import train


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    cfg = tiny_config(n_infers=1)
    ds = SyntheticKittiDataset(
        n_scenes=2,
        n_subnets=1,
        scene_size=cfg.scene.scene_size,
        n_points=1200,
        point_feat_dim=cfg.model.in_channels - 6,
    )
    val = SyntheticKittiDataset(
        n_scenes=1,
        n_subnets=1,
        scene_size=cfg.scene.scene_size,
        n_points=1200,
        point_feat_dim=cfg.model.in_channels - 6,
        split="val",
        seed=50,
    )
    freqs = {s: np.ones(cfg.model.n_classes) for s in (1, 2, 4)}
    log_dir = str(tmp_path / "run")
    state = train(
        cfg,
        ds,
        val_dataset=val,
        n_epochs=1,
        log_dir=log_dir,
        class_frequencies=freqs,
        limit_train_batches=2,
        limit_val_batches=1,
    )
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(log_dir, "checkpoints", "config.json"))
    # Training logged finite losses.
    lines = open(os.path.join(log_dir, "metrics.jsonl")).read().strip()
    assert "pq_dagger_all" in lines or "epoch" in lines


@pytest.mark.slow
def test_train_loop_crop_box(tmp_path):
    """Training on a smaller crop box than validation (the flagship memory
    recipe): params are box-independent, so the same state must train at
    the crop box and validate at the full box."""
    import dataclasses

    cfg = tiny_config(n_infers=1)
    cfg = cfg.replace(
        scene=dataclasses.replace(cfg.scene, train_box_extent=(48, 48, 16))
    )
    ds = SyntheticKittiDataset(
        n_scenes=1,
        n_subnets=1,
        scene_size=cfg.scene.scene_size,
        n_points=1200,
        point_feat_dim=cfg.model.in_channels - 6,
    )
    val = SyntheticKittiDataset(
        n_scenes=1,
        n_subnets=1,
        scene_size=cfg.scene.scene_size,
        n_points=1200,
        point_feat_dim=cfg.model.in_channels - 6,
        split="val",
        seed=51,
    )
    freqs = {s: np.ones(cfg.model.n_classes) for s in (1, 2, 4)}
    state = train(
        cfg,
        ds,
        val_dataset=val,
        n_epochs=1,
        log_dir=str(tmp_path / "crop_run"),
        class_frequencies=freqs,
        limit_train_batches=1,
        limit_val_batches=1,
    )
    assert int(state.step) == 1


@pytest.mark.slow
def test_train_loop_grad_accumulation(tmp_path):
    """accum_steps=2: two scenes per optimizer update (the reference's
    effective-batch recipe); one epoch over 4 scenes -> 2 updates."""
    cfg = tiny_config(n_infers=1)
    ds = SyntheticKittiDataset(
        n_scenes=4,
        n_subnets=1,
        scene_size=cfg.scene.scene_size,
        n_points=1200,
        point_feat_dim=cfg.model.in_channels - 6,
    )
    freqs = {s: np.ones(cfg.model.n_classes) for s in (1, 2, 4)}
    state = train(
        cfg,
        ds,
        val_dataset=None,
        n_epochs=1,
        log_dir=str(tmp_path / "run"),
        class_frequencies=freqs,
        limit_train_batches=4,
        accum_steps=2,
    )
    assert int(state.step) == 2   # 4 scenes / accum 2
    flat = np.concatenate(
        [np.ravel(np.asarray(x)) for x in
         __import__("jax").tree_util.tree_leaves(state.params)]
    )
    assert np.isfinite(flat).all()
