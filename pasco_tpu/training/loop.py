"""Training loop: data feeding, jitted steps, logging, checkpointing.

TPU-native replacement for the reference's PyTorch-Lightning runtime
(``Net`` + ``Trainer`` wiring in ``scripts/train.py:176-239``): a plain
loop around one jitted train step, with background host-side data
preparation, periodic validation through the full inference pipeline, and
top-k checkpointing on the monitored PQ-dagger.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from functools import partial
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pasco_tpu.core.config import PaSCoConfig
from pasco_tpu.data.semantic_kitti.collate import CollatedScene, collate
from pasco_tpu.inference.pipeline import Evaluator, run_scene_inference
from pasco_tpu.models.unet import build_net
from pasco_tpu.training import step as tstep
from pasco_tpu.training.checkpoint import CheckpointManager


class MetricLogger:
    """JSONL metric log + optional TensorBoard (via torch, if present)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        rec = {"step": int(step)}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, rec[key], step)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def _prefetch(iterator: Iterable, size: int = 2):
    """Host-side prefetch thread (the reference uses DataLoader workers)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = object()

    def worker():
        for item in iterator:
            q.put(item)
        q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item


def scene_iterator(dataset, cfg: PaSCoConfig, indices, max_targets=64,
                   rng=None):
    for i in indices:
        subnets = dataset[i]
        yield collate(subnets, cfg, max_targets=max_targets, rng=rng)


# ---------------------------------------------------------------------------
# Multiprocess host pipeline.  `process_scene` does a full-grid hole-free
# resample plus per-class label pyramids in NumPy (>0.5 s/scene), so one
# thread cannot keep a ~1 s/step accelerator fed.  The reference uses 3
# DataLoader workers per GPU (kitti_dm.py); this is the equivalent: a
# process pool where each worker builds fully-collated scenes.  Work is
# deterministic regardless of worker assignment — every index derives its
# own RandomState.
# ---------------------------------------------------------------------------

_WORKER_STATE: Dict[str, object] = {}


def _worker_init(dataset, cfg, max_targets, seed):
    _WORKER_STATE.update(
        dataset=dataset, cfg=cfg, max_targets=max_targets, seed=seed
    )


def _worker_load(i: int):
    ds = _WORKER_STATE["dataset"]
    seed = _WORKER_STATE["seed"]
    # Deterministic per-index stream: the dataset's internal rng (subnet
    # scan pairing + augmentation draws) is re-seeded per item, so the
    # result does not depend on which worker gets the index.
    rng = np.random.RandomState((seed * 100_003 + i) % (2**31 - 1))
    if hasattr(ds, "rng"):
        ds.rng = rng
    return collate(
        ds[i], _WORKER_STATE["cfg"],
        max_targets=_WORKER_STATE["max_targets"], rng=rng,
    )


def parallel_scene_iterator(
    dataset, cfg: PaSCoConfig, indices, max_targets=64, num_workers=3,
    seed=0, prefetch=2,
):
    """Process-pool scene loader; falls back to the single-thread iterator
    for ``num_workers <= 0``.  Yields scenes in index order."""
    if num_workers <= 0:
        yield from scene_iterator(
            dataset, cfg, indices, max_targets,
            rng=np.random.RandomState(seed),
        )
        return
    import collections
    from concurrent.futures import ProcessPoolExecutor
    import multiprocessing as mp

    # spawn, not fork: the parent holds a live TPU client whose threads
    # do not survive forking; spawned workers import lazily and never
    # initialise a JAX backend (they only run NumPy).
    ctx = mp.get_context("spawn")
    with ProcessPoolExecutor(
        max_workers=num_workers,
        mp_context=ctx,
        initializer=_worker_init,
        initargs=(dataset, cfg, max_targets, seed),
    ) as ex:
        it = iter(indices)
        pending = collections.deque()
        for i in it:
            pending.append(ex.submit(_worker_load, i))
            if len(pending) >= num_workers + prefetch:
                break
        while pending:
            yield pending.popleft().result()
            for i in it:
                pending.append(ex.submit(_worker_load, i))
                break


def train(
    cfg: PaSCoConfig,
    dataset,
    val_dataset=None,
    n_epochs: int = 60,
    log_dir: str = "logs/pasco_tpu",
    class_frequencies=None,
    seed: int = 0,
    limit_train_batches: Optional[int] = None,
    limit_val_batches: Optional[int] = None,
    ckpt_every_epochs: int = 1,
    lr_mode: str = "reference",
    pretrain_sem_epochs: Optional[int] = None,
    accum_steps: int = 1,
    num_workers: int = 3,
):
    """Single-chip training entry point (DP variant lives in
    ``pasco_tpu/parallel/mesh.py``)."""
    from pasco_tpu.data.semantic_kitti.params import CLASS_FREQUENCIES

    freqs = class_frequencies or CLASS_FREQUENCIES
    net = build_net(cfg)
    # Train-time working box: parameters are box-independent (convs/BN are
    # per-channel, the transformer PE is computed from runtime coords), so
    # the train step compiles against the smaller crop box while validation
    # runs the full-scene box with the same params.
    train_cfg = cfg
    if cfg.scene.train_box_extent is not None:
        import dataclasses as _dc

        train_cfg = cfg.replace(
            scene=_dc.replace(
                cfg.scene, box_extent=cfg.scene.train_box_extent
            )
        )
    train_net = build_net(train_cfg) if train_cfg is not cfg else net
    lw = tstep.labelweights_for(cfg, freqs)
    cw = jnp.asarray(
        tstep.class_weight_vector(cfg.model.n_classes, cfg.loss.no_object_weight)
    )
    # Sem-only pretraining epochs for large ensembles
    # (net_panoptic_sparse.py:93-98).
    if pretrain_sem_epochs is None:
        pretrain_sem_epochs = {4: 2, 3: 1}.get(cfg.model.n_infers, 0)

    rng = np.random.RandomState(seed)
    first = collate(dataset[0], train_cfg, rng=rng)
    state, tx = tstep.create_train_state(
        train_net, train_cfg, tstep.scene_to_model_input(first), lw,
        jax.random.PRNGKey(seed),
    )

    logger = MetricLogger(log_dir)
    ckpt = CheckpointManager(os.path.join(log_dir, "checkpoints"), cfg)

    # Auto-resume from the latest checkpoint, mirroring the reference's
    # resume-if-exists + SLURM-requeue recovery (scripts/train.py:194-218):
    # preempted runs restart from the last saved state with no flags.
    try:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"resumed from step {int(state.step)}")
    except Exception:
        pass

    flags = {True} if pretrain_sem_epochs == 0 else {True, False}
    step_fns = {
        flag: jax.jit(
            partial(
                tstep.train_step,
                net=train_net, tx=tx, labelweights=lw, class_weight=cw,
                cfg=train_cfg, is_predict_panop=flag,
            ),
            # Donate the state: without in-place updates the optimizer
            # update holds two copies of 117M params + moments.
            donate_argnums=(0,),
        )
        for flag in flags
    }
    # Gradient accumulation (reference effective batch = accumulate x
    # n_gpus x 1 scene, scripts/train.py:213,230): grads-only microbatch
    # step + a summed-gradient optimizer apply.
    if accum_steps > 1:
        grad_fns = {
            flag: jax.jit(
                partial(
                    tstep.grad_step,
                    net=train_net, labelweights=lw, class_weight=cw,
                    cfg=train_cfg, is_predict_panop=flag,
                )
            )
            for flag in flags
        }
        acc_fn = jax.jit(tstep.accumulate_grads, donate_argnums=(0,))
        apply_fn = jax.jit(
            partial(tstep.apply_grads, tx=tx, n_accum=accum_steps),
            donate_argnums=(0, 1),
        )

    global_step = 0
    for epoch in range(n_epochs):
        is_panop = epoch >= pretrain_sem_epochs
        step_fn = step_fns[is_panop]
        order = rng.permutation(len(dataset))
        if limit_train_batches:
            order = order[:limit_train_batches]
        t_epoch = time.time()
        acc = None
        n_acc = 0
        epoch_iter = parallel_scene_iterator(
            dataset, train_cfg, order, num_workers=num_workers,
            seed=seed * 1009 + epoch,
        )
        for scene in _prefetch(epoch_iter):
            inp = tstep.scene_to_model_input(scene)
            tgt = tstep.targets_to_device(scene.targets)
            if accum_steps > 1:
                micro_key = jax.random.fold_in(
                    jax.random.PRNGKey(seed), global_step * accum_steps + n_acc
                )
                grads, logs, new_bs = grad_fns[is_panop](
                    state, inp, tgt, micro_key
                )
                state = state._replace(batch_stats=new_bs)
                acc = grads if acc is None else acc_fn(acc, grads)
                n_acc += 1
                if n_acc < accum_steps:
                    continue
                state = apply_fn(state, acc)
                acc, n_acc = None, 0
            else:
                # train_step folds state.step into this key, so each step's
                # dropout/Gumbel draws differ even with a constant base key.
                state, logs = step_fn(state, inp, tgt, jax.random.PRNGKey(seed))
            global_step += 1
            if global_step % 20 == 0:
                logger.log(
                    global_step,
                    {k: v for k, v in logs.items()},
                    prefix="train/",
                )
        epoch_time = time.time() - t_epoch

        monitor = 0.0
        if val_dataset is not None:
            monitor = validate(
                cfg, net, state, val_dataset, lw, logger, global_step,
                limit_val_batches,
            )
        logger.log(global_step, {"epoch": epoch, "epoch_time": epoch_time})
        if (epoch + 1) % ckpt_every_epochs == 0:
            ckpt.save(global_step, state, {"monitor": monitor})
    ckpt.wait()
    return state


def validate(
    cfg, net, state, val_dataset, labelweights, logger, global_step,
    limit_batches=None,
) -> float:
    """Validation pass: full inference + PQ-dagger monitor (the quantity
    the reference checkpoints on, ``scripts/train.py:180-189``)."""
    evaluator = Evaluator(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = jax.jit(
        lambda v, i: net.apply(v, i, labelweights, train=False)
    )
    n = len(val_dataset)
    indices = range(n if not limit_batches else min(n, limit_batches))
    for scene in _prefetch(scene_iterator(val_dataset, cfg, indices)):
        inp = tstep.scene_to_model_input(scene)
        results = run_scene_inference(fwd, variables, inp, scene, cfg)
        evaluator.add_scene(
            results,
            scene.semantic_label_origin,
            scene.instance_label_origin,
            eval_list=[0, cfg.model.n_infers],
            compute_uncertainty=False,
        )
    summaries = evaluator.summary()
    monitor = summaries[-1]["pq_all"]["pq_dagger"]
    logger.log(global_step, {"pq_dagger_all": monitor}, prefix="val/")
    return float(monitor)
