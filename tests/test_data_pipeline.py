"""Golden tests for the host-side data pipeline."""

import numpy as np
import pytest

from pasco_tpu.core.config import tiny_config
from pasco_tpu.data import transform_utils as tu
from pasco_tpu.data.label_gen import generate_instance_labels
from pasco_tpu.data.semantic_kitti.collate import collate
from pasco_tpu.data.semantic_kitti.dataset import (
    downscale_labels,
    prepare_mask_targets,
    process_scene,
    voxelize_points,
)
from pasco_tpu.data.semantic_kitti.io_data import get_remap_lut, pack, unpack
from pasco_tpu.data.synthetic import make_scene


def test_pack_unpack_roundtrip():
    r = np.random.RandomState(0)
    bits = (r.rand(256) > 0.5).astype(np.uint8)
    assert np.array_equal(unpack(pack(bits)), bits)


def test_remap_lut_semantics():
    lut = get_remap_lut()
    assert lut[0] == 0          # empty stays empty
    assert lut[1] == 255        # outlier -> invalid
    assert lut[10] == 1         # car
    assert lut[252] == 1        # moving-car -> car


def test_downscale_labels_majority_and_unknown():
    sem = np.zeros((4, 4, 4), np.uint8)
    # One 2x2x2 block: 5 voxels class 2, 3 voxels class 1 -> majority 2.
    sem[0:2, 0:2, 0:2] = 1
    sem[0, 0, 0] = 2
    sem[0, 0, 1] = 2
    sem[0, 1, 0] = 2
    sem[1, 0, 0] = 2
    sem[1, 1, 1] = 2
    # One block fully unknown.
    sem[2:4, 2:4, 2:4] = 255
    sems, geos = downscale_labels(sem, n_classes=3, scales=(1, 2))
    s2 = sems[2]
    assert s2[0, 0, 0] == 2          # majority class wins
    assert s2[1, 1, 1] == 255        # all-unknown block -> 255
    assert s2[1, 0, 0] == 0          # known empty block -> 0
    g2 = geos[2]
    assert g2[0, 0, 0] == 1
    assert g2[1, 1, 1] == 255


def test_prepare_mask_targets_disjoint():
    sem = np.zeros((6, 6, 2), np.uint8)
    inst = np.zeros((6, 6, 2), np.int32)
    sem[0:2] = 9            # stuff
    sem[3:5] = 1            # things
    inst[3:4] = 1
    inst[4:5] = 2
    labels, mask_id = prepare_mask_targets(sem, inst, thing_ids=(1,))
    assert len(labels) == 3
    assert labels[0] == 9
    assert set(labels[1:]) == {1}
    # Disjoint and consistent.
    assert (mask_id[0:2] == 0).all()
    assert (mask_id[3:4].max() != mask_id[4:5].max())
    assert (mask_id[5:] == -1).all()


def test_transform_roundtrip_identity():
    r = np.random.RandomState(1)
    coords = r.randint(0, 100, (50, 3))
    T = np.eye(4)
    out = tu.transform(coords, T)
    assert np.array_equal(out, coords)


def test_transform_scene_translation():
    """A pure +1-voxel translation must shift the grid exactly."""
    sem = np.zeros((8, 8, 4), np.float32)
    sem[2, 3, 1] = 7.0
    T = tu.generate_transformation(
        rot=0.0, translation=(tu.DEFAULT_RESOLUTION, 0, 0)
    )
    vals, coords, _ = tu.transform_scene(
        np.argwhere(sem > 0), T, sem[None]
    )
    nz = vals[:, 0] > 0
    moved = coords[nz]
    assert len(moved) == 1
    assert tuple(moved[0]) == (3, 3, 1)
    assert vals[nz][0, 0] == 7.0


def test_instance_label_generation_removes_small():
    sem = np.zeros((16, 16, 4), np.uint8)
    sem[0:4, 0:4, 0:2] = 1          # 32 voxels -> kept
    sem[10, 10, 0] = 1              # 1 voxel -> removed (min 8)
    inst, sem_clean = generate_instance_labels(sem, thing_ids=(1,))
    assert inst.max() == 1
    assert sem_clean[10, 10, 0] == 255
    assert (inst[0:4, 0:4, 0:2] == 1).all()


def test_voxelize_points_offsets():
    xyz = np.array([[0.31, -25.29, -1.89]])
    coords, feats = voxelize_points(xyz)
    assert tuple(coords[0]) == (1, 1, 0)
    # Offset = xyz - voxel center; center of (1,1,0) is (0.3, -25.3, -1.9).
    assert np.allclose(feats[0, :3], [0.01, 0.01, 0.01], atol=1e-5)


def test_process_and_collate_shapes():
    cfg = tiny_config(n_infers=2)
    rng = np.random.RandomState(0)
    subnets = [
        process_scene(
            make_scene(
                rng, scene_size=cfg.scene.scene_size, n_points=800,
                point_feat_dim=cfg.model.in_channels - 6, n_things=2,
            ),
            None,
            rng,
        )
        for _ in range(2)
    ]
    scene = collate(subnets, cfg, max_targets=16)
    P = cfg.capacity.num_points
    ext = cfg.scene.box_extent
    assert scene.point_feats.shape == (P, cfg.model.in_channels)
    assert scene.point_coords.shape == (P, 4)
    assert scene.targets.mask_id_dense.shape == (2, *ext)
    assert scene.targets.sem_label_2.shape == (2, *(e // 2 for e in ext))
    assert scene.targets.labels_valid.any()
    # Global bbox is a multiple of complete_scale and contains subnet boxes.
    assert (scene.global_min % cfg.scene.complete_scale == 0).all()
    assert (scene.global_min <= scene.subnet_min).all()


def test_fuse_multi_scan_matches_rigid_inverse():
    """fuse_multi_scan == inv(pose0) @ pose applied to the points
    (reference ``kitti_dataset.py:582-591``); feature columns pass through."""
    from pasco_tpu.data.semantic_kitti.dataset import fuse_multi_scan

    r = np.random.RandomState(0)

    def rigid(seed):
        rr = np.random.RandomState(seed)
        a, b, c = rr.uniform(-np.pi, np.pi, 3)

        def rz(t):
            return np.array(
                [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0],
                 [0, 0, 1]]
            )

        def rx(t):
            return np.array(
                [[1, 0, 0], [0, np.cos(t), -np.sin(t)],
                 [0, np.sin(t), np.cos(t)]]
            )

        T = np.eye(4)
        T[:3, :3] = rz(a) @ rx(b) @ rz(c)
        T[:3, 3] = rr.uniform(-5, 5, 3)
        return T

    pose0, pose = rigid(1), rigid(2)
    pts = np.concatenate(
        [r.uniform(-10, 10, (64, 3)), r.randn(64, 2)], axis=1
    ).astype(np.float32)

    fused = fuse_multi_scan(pts, pose0, pose)

    h = np.hstack([pts[:, :3], np.ones((64, 1))])
    expected = (np.linalg.inv(pose0) @ pose @ h.T).T[:, :3]
    np.testing.assert_allclose(fused[:, :3], expected, atol=1e-4)
    np.testing.assert_allclose(fused[:, 3:], pts[:, 3:], atol=0)


def test_parse_calib_poses_and_dataset_fusion(tmp_path):
    """calib/pose parsing (``kitti_dataset.py:528-580``) + end-to-end
    n_fuse_scans point concatenation with synthetic poses."""
    from pasco_tpu.data.semantic_kitti.dataset import (
        KittiDataset, parse_calibration, parse_poses)

    seq_dir = tmp_path / "dataset" / "sequences" / "00"
    (seq_dir / "velodyne").mkdir(parents=True)
    (seq_dir / "voxels").mkdir()

    # Identity Tr; poses: frame k translated by (0.5 * k, 0, 0).
    with open(seq_dir / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    with open(seq_dir / "poses.txt", "w") as f:
        for k in range(10):
            f.write(f"1 0 0 {0.5 * k} 0 1 0 0 0 0 1 0\n")

    calib = parse_calibration(str(seq_dir / "calib.txt"))
    poses = parse_poses(str(seq_dir / "poses.txt"), calib)
    assert len(poses) == 10
    np.testing.assert_allclose(poses[4][:3, 3], [2.0, 0, 0], atol=1e-6)

    # Two scans, 4 points each, inside the scene volume.
    pts0 = np.array(
        [[10, 0, 0.5], [11, 1, 0.5], [12, -1, 0.5], [13, 0, 1.0]], np.float32
    )
    pts5 = pts0 + np.array([5, 0, 0], np.float32)
    for frame, pts in (("000000", pts0), ("000005", pts5)):
        pc = np.concatenate([pts, np.full((4, 1), 0.5, np.float32)], 1)
        pc.astype(np.float32).tofile(seq_dir / "velodyne" / f"{frame}.bin")
    # Minimal label volume for frame 0 (bit-packed occupancy + invalid).
    n_vox = 256 * 256 * 32
    np.zeros(n_vox // 8, np.uint8).tofile(seq_dir / "voxels" / "000000.bin")
    np.full(n_vox, 0, np.uint16).tofile(seq_dir / "voxels" / "000000.label")
    np.zeros(n_vox // 8, np.uint8).tofile(seq_dir / "voxels" / "000000.invalid")

    ds = KittiDataset(
        root=str(tmp_path), split="train", use_waffleiron_feats=False,
        n_fuse_scans=2, data_aug=False,
    )
    scene = ds.load_scene("00", "000000")
    # 4 own points + 4 fused points shifted by pose delta (frame-5 pose is
    # +2.5 x, so its +5-x points land at +7.5 x in frame 0... all within
    # the [0, 51.2) x-extent, so every point survives the FOV crop).
    assert scene.xyz.shape[0] == 8
    np.testing.assert_allclose(
        sorted(scene.xyz[:, 0]),
        sorted(np.concatenate([pts0[:, 0], pts5[:, 0] + 2.5])),
        atol=1e-4,
    )

    ds1 = KittiDataset(
        root=str(tmp_path), split="train", use_waffleiron_feats=False,
        n_fuse_scans=1, data_aug=False,
    )
    assert ds1.load_scene("00", "000000").xyz.shape[0] == 4


def test_kitti360_match_file_and_sscbench_layout(tmp_path):
    """SSCBench layout: scans enumerate from label npy files; raw scans are
    read by the kitti_360_match.txt original id (reference
    ``kitti360_dataset.py:80-103,296,585-615``)."""
    from pasco_tpu.data.kitti360.dataset import (
        Kitti360Dataset, parse_match_file)

    drive = "2013_05_28_drive_0009_sync"   # test split
    label_root = tmp_path / "labels"
    (label_root / drive).mkdir(parents=True)
    raw_dir = tmp_path / "raw" / "data_3d_raw" / drive / "velodyne_points" / "data"
    raw_dir.mkdir(parents=True)

    with open(tmp_path / "match.txt", "w") as f:
        f.write(f"{drive} 0000000042.png 000000.png\n")
        f.write(f"{drive} 0000000057.png 000001.png\n")
    table = parse_match_file(str(tmp_path / "match.txt"))
    assert table[drive]["000001"] == "0000000057"

    sem = np.zeros((256, 256, 32), np.uint8)
    sem[10, 10, 5] = 3
    np.save(label_root / drive / "000000_1_1.npy", sem)
    pts = np.array([[10.0, 0.0, 0.5, 0.7]], np.float32)
    pts.tofile(raw_dir / "0000000042.bin")

    ds = Kitti360Dataset(
        root=str(tmp_path / "raw"),
        label_root=str(label_root),
        match_file=str(tmp_path / "match.txt"),
        split="test",
        data_aug=False,
    )
    assert len(ds.scans) == 1
    assert ds.scans[0] == (drive, "000000", "0000000042")
    scene = ds.load_scene(*ds.scans[0])
    assert scene.semantic_label[10, 10, 5] == 3
    assert scene.xyz.shape == (1, 3)
