"""SSCBench-KITTI360 evaluation CLI (counterpart of
``scripts/eval_kitti360.py``, with the val/test split switch at ``:69-75``)."""

from __future__ import annotations

import argparse
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
    p.add_argument("--model_path", required=True)
    p.add_argument("--n_infers", type=int, default=1)
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--limit_batches", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    import jax
    import numpy as np

    from pasco_tpu.core.config import kitti360_config
    from pasco_tpu.data.kitti360.dataset import Kitti360Dataset
    from pasco_tpu.data.kitti360.params import CLASS_FREQUENCIES, CLASS_NAMES
    from pasco_tpu.data.semantic_kitti.collate import collate
    from pasco_tpu.inference.pipeline import Evaluator, run_scene_inference
    from pasco_tpu.metrics.tables import print_all
    from pasco_tpu.models.unet import build_net
    from pasco_tpu.training import step as tstep
    from pasco_tpu.training.checkpoint import CheckpointManager

    cfg = kitti360_config(n_infers=args.n_infers)
    net = build_net(cfg)
    lw = tstep.labelweights_for(cfg, CLASS_FREQUENCIES)

    ds = Kitti360Dataset(
        root=args.dataset_root,
        label_root=args.label_root,
        instance_label_root=args.instance_label_root,
        match_file=args.match_file,
        split=args.split,
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
    evaluator = Evaluator(cfg)
    inf_times, ens_times = [], []
    n = len(ds) if not args.limit_batches else min(len(ds), args.limit_batches)
    for i in range(n):
        scene = collate(ds[i], cfg)
        inp = tstep.scene_to_model_input(scene)
        results = run_scene_inference(fwd, variables, inp, scene, cfg)
        inf_times.append(results["inference_time"])
        ens_times.append(results["ensemble_time"])
        evaluator.add_scene(
            results,
            scene.semantic_label_origin,
            scene.instance_label_origin,
            compute_uncertainty=True,
        )
    print_all(
        evaluator.summary(),
        cfg.model.n_infers,
        CLASS_NAMES,
        inference_time=float(np.mean(inf_times[1:]) if len(inf_times) > 1 else 0),
        ensemble_time=float(np.mean(ens_times[1:]) if len(ens_times) > 1 else 0),
    )


if __name__ == "__main__":
    main()
