"""Train the flagship briefly on synthetic scenes and save an npz for
``BENCH_TRAINED_CKPT`` (bench.py).

The default bench initialises random weights, whose completion heads keep
~every decoder voxel ((C-1)/C of cells pass ``argmax != 0``) — the
opposite of a trained PaSCo, which prunes the generative decoder to
roughly the occupied fraction (~10%; reference occ_thres table,
``decoder_v3.py:210-230``, exists to CAP real models, not to keep them
dense).  A few hundred steps of the real loss recipe on synthetic scenes
collapse the keep sets to near ground-truth occupancy, making the
tile-skipping kernels' data-dependent win measurable with the same
protocol (PERF.md reports both rows).

Usage:  python scripts_tpu/make_bench_ckpt.py --steps 300 --out /tmp/bench_ckpt.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pasco_tpu.utils.cache import jax_cache_dir as _jax_cache_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="/tmp/bench_ckpt.npz")
    ap.add_argument("--log_every", type=int, default=25)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", _jax_cache_dir()),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from functools import partial

    import jax.numpy as jnp
    import numpy as np

    from pasco_tpu.core.config import PaSCoConfig
    from pasco_tpu.data.semantic_kitti.collate import collate
    from pasco_tpu.data.semantic_kitti.dataset import process_scene
    from pasco_tpu.data.semantic_kitti.params import CLASS_FREQUENCIES
    from pasco_tpu.data.synthetic import make_scene
    from pasco_tpu.models.unet import build_net
    from pasco_tpu.training.step import (
        class_weight_vector, create_train_state, labelweights_for,
        scene_to_model_input, targets_to_device, train_step)

    import dataclasses

    cfg = PaSCoConfig()
    if cfg.scene.train_box_extent is not None:
        # Pad/collate to the TRAIN crop box, like bench_train_step.py:66-69
        # — collating to the full union box makes the train step itself a
        # full-box program, which OOMs one chip (22.0 G needed vs 15.75 G;
        # the reference likewise trains on random 0.8-crops,
        # ``kitti_dataset.py:463-490``).  Weights are box-independent, so
        # the saved ckpt benches at any inference box.
        cfg = cfg.replace(
            scene=dataclasses.replace(
                cfg.scene, box_extent=cfg.scene.train_box_extent
            )
        )
    net = build_net(cfg)
    lw = labelweights_for(cfg, CLASS_FREQUENCIES)
    cw = jnp.asarray(
        class_weight_vector(cfg.model.n_classes, cfg.loss.no_object_weight)
    )
    rng = np.random.RandomState(0)

    def draw_scene():
        sc = make_scene(
            rng,
            scene_size=cfg.scene.scene_size,
            n_points=min(cfg.capacity.num_points, 120000),
            point_feat_dim=cfg.model.in_channels - 6,
        )
        # train_crop: the reference trains at the random 0.8 crop
        # (kitti_dataset.py:463-490) — the full union box OOMs the train
        # step on one chip (PERF.md memory ladder).
        return collate([process_scene(sc, None, rng, train_crop=True)], cfg)

    scene0 = draw_scene()
    state, tx = create_train_state(
        net, cfg, scene_to_model_input(scene0), lw, jax.random.PRNGKey(0)
    )
    step = jax.jit(
        partial(
            train_step, net=net, tx=tx, labelweights=lw, class_weight=cw,
            cfg=cfg,
        ),
        donate_argnums=(0,),
    )
    # Small pool of synthetic scenes; all share the training box program.
    scenes = [scene0] + [draw_scene() for _ in range(7)]
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        sc = scenes[i % len(scenes)]
        state, logs = step(
            state, scene_to_model_input(sc), targets_to_device(sc.targets),
            sub,
        )
        if i % args.log_every == 0 or i == args.steps - 1:
            print(
                f"step {i}: loss={float(logs['total_loss']):.2f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    # Save {params, batch_stats} flat as npz (bf16 arrays upcast to f32 so
    # np.load round-trips without ml_dtypes surprises).
    flat = {}

    def put(tree, prefix):
        for k, v in tree.items():
            kk = f"{prefix}/{k}"
            if isinstance(v, dict):
                put(v, kk)
            else:
                a = np.asarray(v)
                if a.dtype == jnp.bfloat16:
                    a = a.astype(np.float32)
                flat[kk] = a

    put(state.params, "params")
    put(state.batch_stats, "batch_stats")
    np.savez(args.out, **flat)
    print(f"saved {len(flat)} arrays to {args.out}", flush=True)


if __name__ == "__main__":
    main()
