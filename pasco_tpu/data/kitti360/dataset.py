"""SSCBench-KITTI360 dataset.

Config-driven variant of the SemanticKITTI pipeline (the reference clones
the whole dataset class, ``pasco/data/kitti360/kitti360_dataset.py``; here
the shared processing lives in
:mod:`pasco_tpu.data.semantic_kitti.dataset` and only the on-disk layout
and raw 8-channel point features differ: intensity + radius + voxel-offset
xyz + xyz, no WaffleIron embedding — reference
``kitti360_dataset.py:296-356``, ``net_panoptic_sparse_kitti360.py:27-90``).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from pasco_tpu.data.kitti360 import params
from pasco_tpu.data.semantic_kitti import io_data
from pasco_tpu.data.semantic_kitti import params as sk_params
from pasco_tpu.data.semantic_kitti.dataset import (
    SceneSample,
    SubnetSample,
    process_scene,
)
from pasco_tpu.data.transform_utils import generate_random_transformation


@dataclass
class Kitti360Dataset:
    """SSCBench-KITTI360: drives as splits, raw velodyne input."""

    root: str
    instance_label_root: str = ""
    split: str = "train"
    n_subnets: int = 1
    data_aug: bool = True
    frame_interval: int = 5
    max_angle: float = 30.0
    scale_range: float = 0.0
    max_translation: Sequence[float] = (0.0, 0.0, 0.0)
    seed: int = 0

    def __post_init__(self):
        self.drives = params.SPLIT_DRIVES[self.split]
        self.scans: List[Tuple[str, str]] = []
        for drive in self.drives:
            vox_dir = os.path.join(self.root, "data_2d_raw", drive, "voxels")
            if not os.path.isdir(vox_dir):
                continue
            frames = sorted(
                f[:-4] for f in os.listdir(vox_dir) if f.endswith(".bin")
            )
            self.scans += [(drive, f) for f in frames[:: self.frame_interval]]
        self.rng = np.random.RandomState(self.seed)

    def __len__(self) -> int:
        return len(self.scans)

    def load_scene(self, drive: str, frame: str) -> SceneSample:
        base = os.path.join(self.root, "data_2d_raw", drive)
        label_pkl = os.path.join(
            self.instance_label_root, drive, f"{frame}_1_1.pkl"
        )
        if os.path.exists(label_pkl):
            with open(label_pkl, "rb") as f:
                d = pickle.load(f)
            sem = d["semantic_labels"].astype(np.uint8)
            inst = d["instance_labels"].astype(np.int32)
        else:
            sem = io_data.get_label_volume(
                os.path.join(base, "voxels", f"{frame}.label"),
                os.path.join(base, "voxels", f"{frame}.invalid"),
                np.arange(2**16, dtype=np.int32),  # labels already train ids
            )
            inst = np.zeros_like(sem, np.int32)

        pc = io_data.read_pointcloud(
            os.path.join(base, "velodyne_points", "data", f"{frame}.bin")
        )
        xyz, intensity = pc[:, :3], pc[:, 3:4]
        radius = np.linalg.norm(xyz, axis=1, keepdims=True)
        feats = np.concatenate([intensity, radius], axis=1)
        keep = np.all(
            (xyz >= sk_params.VOX_ORIGIN[None]) & (xyz < sk_params.MAX_EXTENT[None]),
            axis=1,
        )
        return SceneSample(
            semantic_label=sem,
            instance_label=inst,
            xyz=xyz[keep],
            point_feats=feats[keep],
            frame_id=frame,
            sequence=drive,
        )

    def __getitem__(self, idx: int) -> List[SubnetSample]:
        out = []
        for s in range(self.n_subnets):
            i = idx
            if self.split == "train" and s > 0:
                i = int(self.rng.randint(0, len(self.scans)))
            drive, frame = self.scans[i]
            scene = self.load_scene(drive, frame)
            T = (
                generate_random_transformation(
                    self.rng,
                    max_angle=self.max_angle,
                    scale_range=self.scale_range,
                    max_translation=self.max_translation,
                )
                if self.data_aug
                else None
            )
            out.append(
                process_scene(
                    scene,
                    T,
                    self.rng,
                    n_classes=params.N_CLASSES,
                    thing_ids=params.THING_IDS,
                    train_crop=(self.split == "train"),
                )
            )
        return out
