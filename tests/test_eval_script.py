"""Smoke test for ``scripts_tpu/eval.py`` — the README-table eval path.

Round-2 verdict: the ``Evaluator`` + table printing path was only exercised
indirectly through the training loop; none of ``scripts_tpu/eval*.py`` had a
test, so it could silently rot.  This builds a minimal SemanticKITTI val
layout on disk (sequence 08, one scan, raw velodyne + voxel labels, no
WaffleIron/instance pickles — both optional inputs), runs the CLI ``main()``
in-process with the ``tiny`` config preset, and asserts the full metric
tables print.

The fake scan's occupied blob sits at the CENTER of the 256x256x32 label
volume so the eval-protocol augmentation (random rotation about the scene
center, reference ``eval.py:56``) keeps its bbox inside the tiny working
box.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_eval_main():
    spec = importlib.util.spec_from_file_location(
        "eval_cli", os.path.join(REPO, "scripts_tpu", "eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main


def _write_fake_val_scan(root):
    """One val scan (seq 08, frame 000000): a ~16x16x8 voxel blob at the
    volume center, everything else marked invalid (-> label 255), and a
    matching point cloud."""
    seq_dir = os.path.join(root, "dataset", "sequences", "08")
    os.makedirs(os.path.join(seq_dir, "velodyne"))
    os.makedirs(os.path.join(seq_dir, "voxels"))

    shape = (256, 256, 32)
    n_vox = int(np.prod(shape))
    label = np.zeros(shape, np.uint16)
    invalid = np.ones(shape, np.uint8)

    # Known region: a centred block. Inside it: mostly empty (0), a road
    # patch (raw id 40 -> class 9) and a car blob (raw id 10 -> class 1).
    x0, y0, z0 = 120, 120, 12
    invalid[x0 : x0 + 16, y0 : y0 + 16, z0 : z0 + 8] = 0
    label[x0 : x0 + 16, y0 : y0 + 16, z0] = 40          # road floor
    label[x0 + 4 : x0 + 8, y0 + 4 : y0 + 8, z0 + 1 : z0 + 3] = 10  # car

    label.reshape(-1).tofile(os.path.join(seq_dir, "voxels", "000000.label"))
    np.packbits(invalid.reshape(-1)).tofile(
        os.path.join(seq_dir, "voxels", "000000.invalid")
    )
    # Occupancy .bin (bit-packed) — same footprint as the car blob.
    occ = (label > 0).astype(np.uint8)
    np.packbits(occ.reshape(-1)).tofile(
        os.path.join(seq_dir, "voxels", "000000.bin")
    )

    # Points inside the known block (voxel -> world: origin + 0.2 * v).
    rng = np.random.RandomState(0)
    vox = np.stack(
        [
            rng.randint(x0, x0 + 16, 400),
            rng.randint(y0, y0 + 16, 400),
            rng.randint(z0, z0 + 8, 400),
        ],
        axis=1,
    ).astype(np.float32)
    xyz = np.array([0.0, -25.6, -2.0], np.float32) + 0.2 * (
        vox + rng.rand(400, 3).astype(np.float32)
    )
    pc = np.concatenate([xyz, rng.rand(400, 1).astype(np.float32)], axis=1)
    pc.astype(np.float32).tofile(
        os.path.join(seq_dir, "velodyne", "000000.bin")
    )


def test_eval_cli_smoke(tmp_path, capsys, monkeypatch):
    root = str(tmp_path / "data")
    os.makedirs(root)
    _write_fake_val_scan(root)
    ckpt_dir = str(tmp_path / "ckpt")  # empty -> fresh random weights

    main = _load_eval_main()
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "eval.py",
            "--dataset_root", root,
            "--model_path", ckpt_dir,
            "--n_infers", "1",
            "--limit_batches", "1",
            "--config", "tiny",
        ],
    )
    main()
    out = capsys.readouterr().out
    # All three tables + the timing line printed.
    assert "mIoU" in out and "Prec" in out
    assert "PQ" in out
    assert "ins ECE" in out and "ssc ECE ne" in out
    assert "inference time:" in out and "ensemble time:" in out
    assert "subnet 0" in out


@pytest.mark.slow  # multi-minute-class compile; fast tier keeps one guard per kernel family
def test_eval_cli_torch_ckpt(tmp_path, capsys, monkeypatch):
    """One-command released-checkpoint path: ``--torch_ckpt`` converts a
    Lightning ``.ckpt`` on the fly (training/convert_torch.py) and runs the
    same eval.  Stand-in ckpt: the synthetic reference state dict saved in
    the released format ({"state_dict": tensors}, reference
    README.md:369-374)."""
    import pytest

    torch = pytest.importorskip("torch")

    from pasco_tpu.core.config import tiny_config
    from pasco_tpu.training.convert_torch import synthetic_reference_state_dict

    root = str(tmp_path / "data")
    os.makedirs(root)
    _write_fake_val_scan(root)

    m = tiny_config(n_infers=1).model
    sd = synthetic_reference_state_dict(
        np.random.RandomState(3),
        n_infers=1,
        f=m.f,
        n_classes=m.n_classes,
        in_channels=m.in_channels,
        hidden_dim=m.transformer.hidden_dim,
        num_queries=m.transformer.num_queries,
        dim_feedforward=m.transformer.dim_feedforward,
    )
    ckpt_path = str(tmp_path / "pasco_single.ckpt")
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        ckpt_path,
    )

    main = _load_eval_main()
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "eval.py",
            "--dataset_root", root,
            "--torch_ckpt", ckpt_path,
            "--n_infers", "1",
            "--limit_batches", "1",
            "--config", "tiny",
        ],
    )
    main()
    out = capsys.readouterr().out
    assert "mIoU" in out and "PQ" in out
    assert "inference time:" in out
