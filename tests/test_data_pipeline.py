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
