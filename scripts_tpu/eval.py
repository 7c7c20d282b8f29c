"""SemanticKITTI evaluation CLI.

Counterpart of ``scripts/eval.py`` (reference ``:13-81``): build the val
loader with augmentation ON (each subnet sees a differently-augmented
copy, ``eval.py:56``), restore a checkpoint, run the full inference +
ensembling pipeline, and print README-style tables.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--dataset_preprocess_root", default="")
    p.add_argument("--instance_label_root", default="")
    p.add_argument("--model_path", default="", help="Orbax checkpoint dir")
    p.add_argument(
        "--torch_ckpt",
        default="",
        help="released reference .ckpt (e.g. pasco_single.ckpt, reference "
        "README.md:369-374): converted on the fly with "
        "training/convert_torch.py — convert->eval->tables in one command",
    )
    p.add_argument("--n_infers", type=int, default=1)
    p.add_argument("--split", default="val")
    p.add_argument("--limit_batches", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--config",
        default="flagship",
        choices=("flagship", "flagship_narrow", "tiny"),
        help="model/scene config preset; non-flagship presets exist for "
        "smoke tests (tests/test_eval_script.py) and CPU debugging",
    )
    args = p.parse_args()
    if not (args.model_path or args.torch_ckpt):
        p.error("one of --model_path / --torch_ckpt is required")

    import jax
    import numpy as np

    from pasco_tpu.core.config import PaSCoConfig, ModelConfig
    import dataclasses

    from pasco_tpu.data.semantic_kitti.collate import collate
    from pasco_tpu.data.semantic_kitti.dataset import KittiDataset
    from pasco_tpu.data.semantic_kitti.params import (
        CLASS_FREQUENCIES,
        CLASS_NAMES,
    )
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
        # On-disk SemanticKITTI labels live in the canonical
        # (256, 256, 32) frame (reference ``kitti_dataset.py:86-89``); the
        # smoke presets' synthetic ``scene_size`` would mis-frame the
        # ensembling warp and the Evaluator's canonical comparison.  The
        # working box (``box_candidates``) stays small — scans are pruned
        # to it, exactly like the flagship prunes to its union box.
        base = base.replace(
            scene=dataclasses.replace(base.scene, scene_size=(256, 256, 32))
        )
    cfg = base.replace(
        model=dataclasses.replace(base.model, n_infers=args.n_infers)
    )

    ds = KittiDataset(
        root=args.dataset_root,
        preprocess_root=args.dataset_preprocess_root,
        instance_label_root=args.instance_label_root,
        split=args.split,
        n_subnets=args.n_infers,
        data_aug=True,   # eval.py:56 — augmented validation
        seed=args.seed,
    )

    first = collate(ds[0], cfg)
    feat_dim = first.point_feats.shape[-1]
    if feat_dim != cfg.model.in_channels and args.config != "flagship":
        # Smoke presets adapt to whatever features the on-disk layout
        # provides (raw velodyne = 8, WaffleIron = 283); the flagship
        # config must match its checkpoint instead.
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, in_channels=feat_dim)
        )
    net = build_net(cfg)
    lw = tstep.labelweights_for(cfg, CLASS_FREQUENCIES)
    if args.torch_ckpt:
        import jax.numpy as jnp

        from pasco_tpu.training.convert_torch import (
            convert_reference_checkpoint,
            load_reference_ckpt,
        )

        sd = load_reference_ckpt(args.torch_ckpt)
        params, stats, unmatched = convert_reference_checkpoint(
            sd, args.n_infers
        )
        if unmatched:
            print(
                f"warning: {len(unmatched)} unconverted reference keys "
                f"(first 5: {unmatched[:5]})",
                file=sys.stderr,
            )
        variables = {
            "params": jax.tree_util.tree_map(jnp.asarray, params),
            "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
        }
    else:
        state, _ = tstep.create_train_state(
            net, cfg, tstep.scene_to_model_input(first), lw,
            jax.random.PRNGKey(0),
        )
        ckpt = CheckpointManager(args.model_path, None)
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
        variables = {
            "params": state.params, "batch_stats": state.batch_stats,
        }

    # Scene-adaptive working box: each scan dispatches to the
    # smallest pre-compiled box program covering its bbox
    # (pasco_tpu/inference/dispatch.py).
    from pasco_tpu.inference.dispatch import AdaptiveForward

    fwd = AdaptiveForward(cfg, lw)
    evaluator = Evaluator(cfg)
    inf_times, ens_times = [], []
    n = len(ds) if not args.limit_batches else min(len(ds), args.limit_batches)
    for i in range(n):
        scene = collate(ds[i], cfg)
        inp = tstep.scene_to_model_input(scene)
        results = run_scene_inference(
            fwd, variables, inp, scene, cfg, measure_time=True
        )
        inf_times.append(results["inference_time"])
        ens_times.append(results["ensemble_time"])
        evaluator.add_scene(
            results,
            scene.semantic_label_origin,
            scene.instance_label_origin,
            compute_uncertainty=True,
        )
        if (i + 1) % 10 == 0:
            print(f"[{i + 1}/{n}] scenes evaluated", file=sys.stderr)

    print_all(
        evaluator.summary(),
        cfg.model.n_infers,
        CLASS_NAMES,
        inference_time=float(np.mean(inf_times[1:]) if len(inf_times) > 1 else 0),
        ensemble_time=float(np.mean(ens_times[1:]) if len(ens_times) > 1 else 0),
    )


if __name__ == "__main__":
    main()
