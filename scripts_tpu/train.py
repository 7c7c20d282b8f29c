"""SemanticKITTI training CLI.

TPU-native counterpart of ``scripts/train.py`` (reference ``:20-243``):
same experiment knobs (n_infers, mask weight, heavy decoder, dropouts,
augmentation ranges), exp-name composition, resume-if-exists, but driving
the jitted training loop instead of PyTorch Lightning.

Run: python scripts_tpu/train.py --dataset_root /path/to/semkitti \
        --n_infers 1 --log_dir logs
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def exp_name(args) -> str:
    """Config-encoding experiment name (reference ``train.py:90-109``)."""
    name = f"pasco_tpu_{args.dataset}_np{args.n_infers}"
    name += f"_f{args.f}_nq{args.num_queries}"
    name += f"_maskWeight{args.mask_weight}"
    if args.heavy_decoder:
        name += "_heavyDecoder"
    name += f"_drop{args.net_3d_dropout}_aug{int(args.data_aug)}"
    return name


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="semantic_kitti")
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--dataset_preprocess_root", default="")
    p.add_argument("--instance_label_root", default="")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--n_infers", type=int, default=1)
    p.add_argument("--f", type=int, default=64)
    p.add_argument("--num_queries", type=int, default=100)
    p.add_argument("--mask_weight", type=float, default=40.0)
    p.add_argument("--heavy_decoder", action="store_true")
    p.add_argument("--use_se_layer", action="store_true")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--max_epochs", type=int, default=60)
    p.add_argument("--transformer_dropout", type=float, default=0.2)
    p.add_argument("--net_3d_dropout", type=float, default=0.0)
    p.add_argument("--n_dropout_levels", type=int, default=3)
    p.add_argument("--point_dropout_ratio", type=float, default=0.05)
    p.add_argument("--data_aug", type=lambda x: x == "True", default=True)
    p.add_argument("--max_angle", type=float, default=30.0)
    p.add_argument("--translate_distance", type=float, default=0.2)
    p.add_argument("--scale_range", type=float, default=0.0)
    p.add_argument("--no_voxel_query_loss", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--limit_train_batches", type=int, default=None)
    p.add_argument("--limit_val_batches", type=int, default=None)
    # reference --accum_batch (scripts/train.py:62,203)
    p.add_argument("--accum_batch", type=int, default=1)
    # reference --n_fuse_scans (scripts/train.py:63,142)
    p.add_argument("--n_fuse_scans", type=int, default=1)
    args = p.parse_args()

    from pasco_tpu.core.config import (
        LossConfig,
        ModelConfig,
        OptimConfig,
        PaSCoConfig,
        TransformerConfig,
    )
    from pasco_tpu.data.semantic_kitti.dataset import KittiDataset
    from pasco_tpu.training.loop import train

    # Dropout schedule (reference train.py:83-87).
    encoder_dropouts = [args.point_dropout_ratio, 0.0, 0.0, 0.0, 0.0, 0.0]
    decoder_dropouts = [0.0] * 5
    for l in range(args.n_dropout_levels):
        encoder_dropouts[-l - 1] = args.net_3d_dropout
        decoder_dropouts[l] = args.net_3d_dropout

    cfg = PaSCoConfig(
        model=ModelConfig(
            f=args.f,
            n_infers=args.n_infers,
            num_queries=args.num_queries,
            heavy_decoder=args.heavy_decoder,
            use_se_layer=args.use_se_layer,
            encoder_dropouts=tuple(encoder_dropouts),
            decoder_dropouts=tuple(decoder_dropouts),
            transformer=TransformerConfig(
                num_queries=args.num_queries,
                dropout=args.transformer_dropout,
            ),
        ),
        loss=LossConfig(
            mask_weight=args.mask_weight,
            use_voxel_query_loss=not args.no_voxel_query_loss,
        ),
        optim=OptimConfig(lr=args.lr, weight_decay=args.weight_decay),
    )

    train_ds = KittiDataset(
        root=args.dataset_root,
        preprocess_root=args.dataset_preprocess_root,
        instance_label_root=args.instance_label_root,
        split="train",
        n_subnets=args.n_infers,
        data_aug=args.data_aug,
        max_angle=args.max_angle,
        scale_range=args.scale_range,
        max_translation=(
            args.translate_distance, args.translate_distance,
            args.translate_distance / 2,
        ),
        n_fuse_scans=args.n_fuse_scans,
        seed=args.seed,
    )
    val_ds = KittiDataset(
        root=args.dataset_root,
        preprocess_root=args.dataset_preprocess_root,
        instance_label_root=args.instance_label_root,
        split="val",
        n_subnets=args.n_infers,
        data_aug=args.data_aug,
        seed=args.seed,
    )

    log_dir = os.path.join(args.log_dir, exp_name(args))
    train(
        cfg,
        train_ds,
        val_dataset=val_ds,
        n_epochs=args.max_epochs,
        log_dir=log_dir,
        seed=args.seed,
        limit_train_batches=args.limit_train_batches,
        limit_val_batches=args.limit_val_batches,
        accum_steps=args.accum_batch,
    )


if __name__ == "__main__":
    main()
