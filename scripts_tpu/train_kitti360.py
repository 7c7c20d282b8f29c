"""SSCBench-KITTI360 training CLI (counterpart of
``scripts/train_kitti360.py``: 19 classes, 8 raw input channels, 80
epochs — reference ``:111,115,152``)."""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--instance_label_root", default="")
    p.add_argument("--label_root", default="",
                   help="SSCBench-KITTI360 *_1_1.npy label volumes")
    p.add_argument("--match_file", default="",
                   help="kitti_360_match.txt (raw frame-id mapping)")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--n_infers", type=int, default=1)
    p.add_argument("--max_epochs", type=int, default=80)
    p.add_argument("--mask_weight", type=float, default=40.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--limit_train_batches", type=int, default=None)
    p.add_argument("--limit_val_batches", type=int, default=None)
    args = p.parse_args()

    from pasco_tpu.core.config import LossConfig, OptimConfig, kitti360_config
    from pasco_tpu.data.kitti360.dataset import Kitti360Dataset
    from pasco_tpu.data.kitti360.params import CLASS_FREQUENCIES
    from pasco_tpu.training.loop import train

    cfg = kitti360_config(n_infers=args.n_infers)
    cfg = cfg.replace(
        loss=LossConfig(mask_weight=args.mask_weight),
        optim=OptimConfig(lr=args.lr, weight_decay=args.weight_decay),
    )

    train_ds = Kitti360Dataset(
        root=args.dataset_root,
        label_root=args.label_root,
        instance_label_root=args.instance_label_root,
        match_file=args.match_file,
        split="train",
        n_subnets=args.n_infers,
        seed=args.seed,
    )
    val_ds = Kitti360Dataset(
        root=args.dataset_root,
        label_root=args.label_root,
        instance_label_root=args.instance_label_root,
        match_file=args.match_file,
        split="val",
        n_subnets=args.n_infers,
        seed=args.seed,
    )
    train(
        cfg,
        train_ds,
        val_dataset=val_ds,
        n_epochs=args.max_epochs,
        log_dir=os.path.join(args.log_dir, f"pasco_tpu_kitti360_np{args.n_infers}"),
        class_frequencies=CLASS_FREQUENCIES,
        seed=args.seed,
        limit_train_batches=args.limit_train_batches,
        limit_val_batches=args.limit_val_batches,
    )


if __name__ == "__main__":
    main()
