"""Robo3D (SemanticKITTI-C) loader + eval-CLI smoke tests.

The corruption-robustness path (reference
``pasco/data/semantic_kitti/kitti_dataset_robo3d.py:46-58,339-342``) reads
the val scans' LABELS from the clean dataset but takes points/features from
corruption-specific WaffleIron dumps
(``waffleiron_v2/<condition>/<level>/seg_feats_tta_robo3d/<seq>/<frame>.pkl``).
These tests build that layout synthetically on disk (like the KITTI-360
layout test in test_data_pipeline.py) and assert the loader semantics, then
run ``scripts_tpu/eval_robo3d.py`` end-to-end with the tiny preset.
"""

import importlib.util
import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from tests.test_eval_script import _write_fake_val_scan


def _write_corrupted_dump(preprocess_root, condition, level, seq, frame,
                          n_points=300, seed=7):
    """A WaffleIron TTA dump for one corrupted scan: embedding (votes, 256,
    N), coords (N, 4) = xyz+intensity, vote (N, 19) — the exact pickle
    schema the clean loader consumes (reference ``kitti_dataset.py:290-303``,
    robo3d variant ``kitti_dataset_robo3d.py:339-358``)."""
    d = os.path.join(
        preprocess_root, "waffleiron_v2", condition, level,
        "seg_feats_tta_robo3d", seq,
    )
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    # Points inside the known centre block of _write_fake_val_scan.
    vox = np.stack(
        [
            rng.randint(120, 136, n_points),
            rng.randint(120, 136, n_points),
            rng.randint(12, 20, n_points),
        ],
        axis=1,
    ).astype(np.float32)
    xyz = np.array([0.0, -25.6, -2.0], np.float32) + 0.2 * (
        vox + rng.rand(n_points, 3).astype(np.float32)
    )
    data = {
        "embedding": rng.randn(2, 256, n_points).astype(np.float32),
        "coords": np.concatenate(
            [xyz, rng.rand(n_points, 1).astype(np.float32)], axis=1
        ),
        "vote": rng.rand(n_points, 19).astype(np.float32),
    }
    with open(os.path.join(d, f"{frame}.pkl"), "wb") as f:
        pickle.dump(data, f)
    return n_points


def test_robo3d_loader_reads_corrupted_dump(tmp_path):
    from pasco_tpu.data.semantic_kitti.robo3d import (
        CONDITIONS, LEVELS, KittiDatasetRobo3D)

    assert len(CONDITIONS) == 8 and len(LEVELS) == 3

    root = str(tmp_path / "data")
    pre = str(tmp_path / "preprocess")
    os.makedirs(root)
    _write_fake_val_scan(root)
    n_pts = _write_corrupted_dump(pre, "snow", "heavy", "08", "000000")

    ds = KittiDatasetRobo3D(
        root=root, preprocess_root=pre, split="val",
        condition="snow", level="heavy", data_aug=False,
    )
    # Val scans enumerate from the clean voxel layout (seq 08).
    assert len(ds.scans) == 1 and ds.scans[0][0] == "08"

    scene = ds.load_scene("08", "000000")
    # Points/features come from the corrupted dump: 19 vote + 1 intensity
    # + 1 radius + 256 embedding = 277 feature channels, and the corrupted
    # cloud's point count (FOV-crop keeps all: the dump sits centre-scene).
    assert scene.xyz.shape == (n_pts, 3)
    assert scene.point_feats.shape == (n_pts, 277)
    # Labels still come from the CLEAN dataset volume.
    assert scene.semantic_label.shape == (256, 256, 32)
    assert (scene.semantic_label[124:128, 124:128, 13:15] == 1).all()


def test_robo3d_loader_falls_back_to_clean(tmp_path):
    """A missing corrupted dump degrades to the clean scan (the reference
    indexes only scans with dumps; our loader keeps eval running)."""
    from pasco_tpu.data.semantic_kitti.robo3d import KittiDatasetRobo3D

    root = str(tmp_path / "data")
    os.makedirs(root)
    _write_fake_val_scan(root)

    ds = KittiDatasetRobo3D(
        root=root, preprocess_root=str(tmp_path / "nope"), split="val",
        condition="fog", level="light", data_aug=False,
    )
    scene = ds.load_scene("08", "000000")
    # Clean raw-velodyne fallback: 400 points, intensity+radius features.
    assert scene.xyz.shape == (400, 3)
    assert scene.point_feats.shape[1] == 2

    with pytest.raises(AssertionError):
        KittiDatasetRobo3D(root=root, split="val", condition="hail",
                           level="light")


@pytest.mark.slow  # ~4 min CPU compile of the tiny model
def test_eval_robo3d_cli_smoke(tmp_path, capsys, monkeypatch):
    """End-to-end: synthetic corruption layout -> eval_robo3d.py main()
    with the tiny preset -> metric tables print."""
    root = str(tmp_path / "data")
    pre = str(tmp_path / "preprocess")
    os.makedirs(root)
    _write_fake_val_scan(root)
    _write_corrupted_dump(pre, "fog", "light", "08", "000000")

    spec = importlib.util.spec_from_file_location(
        "eval_robo3d_cli", os.path.join(REPO, "scripts_tpu", "eval_robo3d.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "eval_robo3d.py",
            "--dataset_root", root,
            "--dataset_preprocess_root", pre,
            "--model_path", str(tmp_path / "ckpt"),
            "--n_infers", "1",
            "--condition", "fog",
            "--level", "light",
            "--limit_batches", "1",
            "--config", "tiny",
        ],
    )
    mod.main()
    out = capsys.readouterr().out
    assert "Robo3D fog / light" in out
    assert "mIoU" in out and "PQ" in out
