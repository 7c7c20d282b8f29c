"""SemanticKITTI-C (Robo3D) corruption evaluation CLI
(counterpart of ``scripts/eval_robo3d.py``)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--dataset_preprocess_root", default="")
    p.add_argument("--instance_label_root", default="")
    p.add_argument("--model_path", required=True)
    p.add_argument("--n_infers", type=int, default=1)
    p.add_argument("--condition", default="fog")
    p.add_argument("--level", default="light")
    p.add_argument("--limit_batches", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--config",
        default="flagship",
        choices=("flagship", "flagship_narrow", "tiny"),
        help="model/scene config preset; non-flagship presets exist for "
        "smoke tests (tests/test_eval_robo3d.py) and CPU debugging",
    )
    args = p.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from pasco_tpu.core.config import PaSCoConfig
    from pasco_tpu.data.semantic_kitti.collate import collate
    from pasco_tpu.data.semantic_kitti.params import (
        CLASS_FREQUENCIES,
        CLASS_NAMES,
    )
    from pasco_tpu.data.semantic_kitti.robo3d import KittiDatasetRobo3D
    from pasco_tpu.inference.pipeline import Evaluator, run_scene_inference
    from pasco_tpu.metrics.tables import print_all
    from pasco_tpu.models.unet import build_net
    from pasco_tpu.training import step as tstep
    from pasco_tpu.training.checkpoint import CheckpointManager

    if args.config == "flagship":
        base = PaSCoConfig()
    elif args.config == "flagship_narrow":
        from pasco_tpu.core.config import flagship_narrow_config

        base = flagship_narrow_config(n_infers=args.n_infers)
    else:
        from pasco_tpu.core.config import tiny_config

        base = tiny_config(n_infers=args.n_infers)
    if args.config != "flagship":
        # On-disk labels live in the canonical (256, 256, 32) frame
        # (reference ``kitti_dataset.py:86-89``); see scripts_tpu/eval.py.
        base = base.replace(
            scene=dataclasses.replace(base.scene, scene_size=(256, 256, 32))
        )
    cfg = base.replace(
        model=dataclasses.replace(base.model, n_infers=args.n_infers)
    )

    ds = KittiDatasetRobo3D(
        root=args.dataset_root,
        preprocess_root=args.dataset_preprocess_root,
        instance_label_root=args.instance_label_root,
        split="val",
        n_subnets=args.n_infers,
        data_aug=True,
        condition=args.condition,
        level=args.level,
        seed=args.seed,
    )
    first = collate(ds[0], cfg)
    feat_dim = first.point_feats.shape[-1]
    if feat_dim != cfg.model.in_channels and args.config != "flagship":
        # Smoke presets adapt to the on-disk feature width (raw velodyne =
        # 8, WaffleIron robo3d dumps = 283); flagship must match its ckpt.
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, in_channels=feat_dim)
        )
        first = collate(ds[0], cfg)
    net = build_net(cfg)
    lw = tstep.labelweights_for(cfg, CLASS_FREQUENCIES)
    state, _ = tstep.create_train_state(
        net, cfg, tstep.scene_to_model_input(first), lw, jax.random.PRNGKey(0)
    )
    ckpt = CheckpointManager(args.model_path, None)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # Scene-adaptive working box: each scan dispatches to the
    # smallest pre-compiled box program covering its bbox
    # (pasco_tpu/inference/dispatch.py).
    from pasco_tpu.inference.dispatch import AdaptiveForward

    fwd = AdaptiveForward(cfg, lw)
    evaluator = Evaluator(cfg)
    n = len(ds) if not args.limit_batches else min(len(ds), args.limit_batches)
    for i in range(n):
        scene = collate(ds[i], cfg)
        inp = tstep.scene_to_model_input(scene)
        results = run_scene_inference(fwd, variables, inp, scene, cfg)
        evaluator.add_scene(
            results,
            scene.semantic_label_origin,
            scene.instance_label_origin,
            compute_uncertainty=True,
        )
    print(f"== Robo3D {args.condition} / {args.level} ==")
    print_all(evaluator.summary(), cfg.model.n_infers, CLASS_NAMES)


if __name__ == "__main__":
    main()
