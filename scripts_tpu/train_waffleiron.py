"""Train the WaffleIron point-segmentation frontend (TPU-native).

Counterpart of the reference ``WaffleIron_mod/launch_train.py`` (flags
mirror its config: 48 layers x 256 channels, grids (250,250)/(250,12)/
(250,12), voxel 0.1 m, FOV +-50 m, AdamW + WarmupCosine, CE + Lovász).
SemanticKITTI scans load through the same file layout the reference uses
(``dataset_root/sequences/<seq>/velodyne/*.bin`` + ``labels``); without a
dataset on disk, ``--synthetic`` trains on generated scenes so the full
loop is exercisable anywhere.
"""

from __future__ import annotations

import argparse
import os

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pasco_tpu.utils.cache import jax_cache_dir as _jax_cache_dir

import numpy as np


def synthetic_cloud(rng, n=12000, n_classes=19):
    xyz = rng.randn(n, 3).astype(np.float32) * np.array([15, 15, 1.5])
    intensity = rng.rand(n, 1).astype(np.float32)
    radius = np.linalg.norm(xyz[:, :2], axis=1, keepdims=True)
    pc = np.concatenate([xyz, intensity, radius], axis=1)
    labels = (
        (np.floor(xyz[:, 0] / 5) + np.floor(xyz[:, 1] / 5)) % n_classes
    ).astype(np.int32)
    labels[rng.rand(n) < 0.05] = 255
    return pc, labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--out", default="./logs/waffleiron")
    p.add_argument("--epochs", type=int, default=45)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_points", type=int, default=20000)
    p.add_argument("--depth", type=int, default=48)
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--n_classes", type=int, default=19)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--weight_decay", type=float, default=0.003)
    p.add_argument("--voxel", type=float, default=0.1)
    p.add_argument("--fov", type=float, default=50.0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps_per_epoch", type=int, default=8,
                   help="synthetic mode: batches per epoch")
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _jax_cache_dir()
    ),
    )

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
        make_waffleiron_optimizer,
    )

    rng = np.random.RandomState(0)
    aug = Compose(
        [
            Crop(fov=((-args.fov, -args.fov, -8), (args.fov, args.fov, 8))),
            Voxelize(voxel_size=args.voxel, random=True, rng=rng),
            LimitNumPoints(max_point=args.num_points, random=True, rng=rng),
            RandomApply(Rotation(rng=rng), prob=0.5, rng=rng),
            RandomApply(FlipXY(rng=rng), prob=0.5, rng=rng),
            RandomApply(Scale(rng=rng), prob=0.5, rng=rng),
        ]
    )
    val_prep = Compose(
        [
            Crop(fov=((-args.fov, -args.fov, -8), (args.fov, args.fov, 8))),
            Voxelize(voxel_size=args.voxel, rng=rng),
            LimitNumPoints(max_point=args.num_points, rng=rng),
        ]
    )

    if args.synthetic or args.dataset_root is None:
        def scans(n_scans):
            for _ in range(n_scans):
                yield synthetic_cloud(rng, n_classes=args.n_classes)

        def make_batches(prep, n_batches):
            def fn():
                for _ in range(n_batches):
                    clouds, labels = [], []
                    for pc, lab in scans(args.batch_size):
                        pc2, lab2 = prep(pc, lab)
                        clouds.append(pc2)
                        labels.append(lab2)
                    yield build_point_batch(
                        clouds, labels, args.num_points, fov=args.fov
                    )
            return fn

        train_fn = make_batches(aug, args.steps_per_epoch)
        val_fn = make_batches(val_prep, max(args.steps_per_epoch // 4, 1))
    else:
        from pasco_tpu.data.semantic_kitti.io_data import (
            get_remap_lut,
            read_point_label,
            read_pointcloud,
        )

        # WaffleIron's 19 classes = the 20-class SSC remap minus "empty"
        remap = get_remap_lut()

        def read_pointcloud_scan(root, seq, frame):
            base = os.path.join(root, "sequences", seq)
            pc = read_pointcloud(
                os.path.join(base, "velodyne", frame + ".bin")
            )
            raw = read_point_label(
                os.path.join(base, "labels", frame + ".label")
            )
            sem = remap[(raw & 0xFFFF).astype(np.uint16)].astype(np.int32)
            lab = np.where(sem == 0, 255, sem - 1)   # drop empty, 0-based
            return pc, lab.astype(np.int32)

        def seq_files(split):
            seqs = (
                ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"]
                if split == "train"
                else ["08"]
            )
            files = []
            for s in seqs:
                d = os.path.join(args.dataset_root, "sequences", s, "velodyne")
                if os.path.isdir(d):
                    files += [
                        (s, f[:-4]) for f in sorted(os.listdir(d))
                        if f.endswith(".bin")
                    ]
            return files

        def make_batches(split, prep):
            files = seq_files(split)

            def fn():
                order = rng.permutation(len(files))
                for i in range(0, len(order) - args.batch_size + 1,
                               args.batch_size):
                    clouds, labels = [], []
                    for j in order[i : i + args.batch_size]:
                        s, fr = files[j]
                        pc, lab = read_pointcloud_scan(args.dataset_root, s, fr)
                        radius = np.linalg.norm(
                            pc[:, :2], axis=1, keepdims=True
                        )
                        pc = np.concatenate([pc, radius], axis=1)
                        pc2, lab2 = prep(pc, lab)
                        clouds.append(pc2)
                        labels.append(lab2)
                    yield build_point_batch(
                        clouds, labels, args.num_points, fov=args.fov
                    )
            return fn

        train_fn = make_batches("train", aug)
        val_fn = make_batches("val", val_prep)

    net = Segmenter(
        n_classes=args.n_classes,
        channels=args.channels,
        depth=args.depth,
        in_channels=5,
    )
    tx = make_waffleiron_optimizer(
        lr=args.lr, weight_decay=args.weight_decay,
        warmup_end=4 * args.steps_per_epoch,
        max_iter=args.epochs * args.steps_per_epoch,
    )
    first = next(iter(train_fn()))
    state = create_waffle_state(net, first, tx, jax.random.PRNGKey(0))
    trainer = WaffleIronTrainer(net, tx, state, args.out)
    if args.resume and os.path.exists(os.path.join(args.out, "ckpt_last.pkl")):
        trainer.load_state()
    trainer.train(train_fn, val_fn, args.epochs)


if __name__ == "__main__":
    main()
