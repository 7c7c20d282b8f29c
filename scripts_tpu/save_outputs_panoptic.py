"""Dump panoptic inference outputs for chosen frames (counterpart of
``scripts/save_outputs_panoptic.py``): pickled per-frame predictions plus
PLY exports for direct 3D viewing (the reference renders with Mayavi)."""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--dataset_preprocess_root", default="")
    p.add_argument("--instance_label_root", default="")
    p.add_argument("--model_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--n_infers", type=int, default=1)
    p.add_argument("--frames", nargs="*", default=None,
                   help="frame indices into the val split")
    p.add_argument("--export_ply", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from pasco_tpu.core.config import PaSCoConfig
    from pasco_tpu.data.semantic_kitti.collate import collate
    from pasco_tpu.data.semantic_kitti.dataset import KittiDataset
    from pasco_tpu.data.semantic_kitti.params import CLASS_FREQUENCIES
    from pasco_tpu.inference.pipeline import run_scene_inference
    from pasco_tpu.models.unet import build_net
    from pasco_tpu.training import step as tstep
    from pasco_tpu.training.checkpoint import CheckpointManager
    from pasco_tpu.utils.visualization import (
        export_panoptic_ply,
        export_semantic_ply,
        export_uncertainty_ply,
    )

    base = PaSCoConfig()
    cfg = base.replace(
        model=dataclasses.replace(base.model, n_infers=args.n_infers)
    )
    net = build_net(cfg)
    lw = tstep.labelweights_for(cfg, CLASS_FREQUENCIES)
    ds = KittiDataset(
        root=args.dataset_root,
        preprocess_root=args.dataset_preprocess_root,
        instance_label_root=args.instance_label_root,
        split="val",
        n_subnets=args.n_infers,
        data_aug=True,
        seed=args.seed,
    )
    first = collate(ds[0], cfg)
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

    os.makedirs(args.output_dir, exist_ok=True)
    frames = [int(f) for f in (args.frames or range(min(10, len(ds))))]
    for fi in frames:
        scene = collate(ds[fi], cfg)
        inp = tstep.scene_to_model_input(scene)
        results = run_scene_inference(fwd, variables, inp, scene, cfg)
        out_path = os.path.join(args.output_dir, f"frame_{fi:06d}.pkl")
        with open(out_path, "wb") as f:
            pickle.dump(
                {
                    "outputs": [
                        {
                            k: v
                            for k, v in o.items()
                            if k != "sem_prob_dense"  # large; recompute
                        }
                        for o in results["outputs"]
                    ],
                    "Ts": np.asarray(scene.Ts),
                },
                f,
            )
        if args.export_ply:
            ens = results["outputs"][-1]
            base_p = os.path.join(args.output_dir, f"frame_{fi:06d}")
            export_semantic_ply(base_p + "_semantic.ply", ens["semantic_seg_dense"])
            export_panoptic_ply(
                base_p + "_panoptic.ply",
                ens["panoptic_seg_dense"],
                ens["segments_info"],
            )
            export_uncertainty_ply(
                base_p + "_uncertainty.ply",
                ens["ssc_confidence"],
                ens["semantic_seg_dense"],
            )
        print(f"saved {out_path}")


if __name__ == "__main__":
    main()
