"""On-chip timing of the flagship training step (batch 1, train-crop box).

Measures the same quantity PERF.md's "Training step" trail tracks: one
jitted, state-donating optimizer step of the full PaSCo-single config
(117M params, all losses incl. the pure-JAX Hungarian matching) on the
(256, 256, 32) training crop box — the reference trains on random
0.8-crops (``kitti_dataset.py:463-490``) at bs=2 x 2 GPUs
(``scripts/train.py:213,230``).

Usage: python scripts_tpu/bench_train_step.py [--steps 6] [--pallas on|off]

Prints one JSON line {"metric": "train_sec_per_step", ...}.  Honest
timing: each step fetches the scalar loss to host (block_until_ready is
unreliable on the tunnelled backend).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pasco_tpu.utils.cache import jax_cache_dir as _jax_cache_dir

# Baseline for vs_baseline: this repo's own best captured on-chip step time
# BEFORE the packed-conv custom VJP landed — 1.42 s/step (PERF.md "Training
# step": the batched-Lovász + row-oriented mask-gather measurement, full
# flagship, batch 1, (256, 256, 32) crop).  NOT a reference number: the
# reference publishes no per-step time (bs=2 across 2xV100,
# scripts/train.py:213 — wall-clock only).
PRE_VJP_SEC_PER_STEP = 1.42


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--pallas", choices=("on", "off"), default=None,
                    help="override cfg.model.pallas_conv for the train step")
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

    from __graft_entry__ import _synthetic_model_input
    from pasco_tpu.core.config import PaSCoConfig
    from pasco_tpu.data.semantic_kitti.params import CLASS_FREQUENCIES
    from pasco_tpu.models.unet import build_net
    from pasco_tpu.training import step as tstep

    cfg = PaSCoConfig()
    if cfg.scene.train_box_extent is not None:
        cfg = cfg.replace(
            scene=dataclasses.replace(
                cfg.scene, box_extent=cfg.scene.train_box_extent
            )
        )
    if args.pallas is not None:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, pallas_conv=args.pallas)
        )
    net = build_net(cfg)
    lw = tstep.labelweights_for(cfg, CLASS_FREQUENCIES)
    cw = jnp.asarray(
        tstep.class_weight_vector(cfg.model.n_classes, cfg.loss.no_object_weight)
    )
    inp, targets, _ = _synthetic_model_input(cfg)

    state, tx = tstep.create_train_state(net, cfg, inp, lw, jax.random.PRNGKey(0))
    fn = jax.jit(
        partial(
            tstep.train_step,
            net=net, tx=tx, labelweights=lw, class_weight=cw, cfg=cfg,
        ),
        donate_argnums=(0,),
    )

    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, logs = fn(state, inp, targets, rng)
    first = float(logs["total_loss"])  # host fetch = sync
    print(f"first step (incl. compile): {time.perf_counter() - t0:.1f}s "
          f"loss={first:.2f}", file=sys.stderr)

    samples = []
    for k in range(args.steps):
        t0 = time.perf_counter()
        state, logs = fn(state, inp, targets, rng)
        loss = float(logs["total_loss"])  # sync
        samples.append(time.perf_counter() - t0)
        print(f"step {k}: {samples[-1]:.3f}s loss={loss:.2f}",
              file=sys.stderr)
    sec = sorted(samples)[len(samples) // 2]
    print(
        json.dumps(
            {
                "metric": "train_sec_per_step",
                "value": round(sec, 3),
                "unit": "s/step",
                "vs_baseline": round(PRE_VJP_SEC_PER_STEP / sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
