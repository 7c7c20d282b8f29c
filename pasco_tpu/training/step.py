"""Jittable training / eval step functions.

The TPU-native equivalent of ``Net.step`` (reference
``pasco/models/net_panoptic_sparse.py:314-537``): one pure function from
(params, batch) to (loss, metrics), differentiated and jitted whole.  The
loss is assembled exactly as the reference weights it
(``net_panoptic_sparse.py:141-166,355-483``):

    total = occ_weight * (compl_ce + compl_lovasz)
          + panop_weight * (2*CE + 40*mask + 1*dice)     [per subnet mean]
          + 0.3 * ssc_ce + 1.0 * ssc_lovasz              [voxel-query SSC]
          + the same terms for each aux prediction level

Note: the reference computes the main-level voxel-query SSC losses but
drops them from the total through a bookkeeping slip (``:387-388,479``
accumulate nothing); we include them, gated by
``LossConfig.use_voxel_query_loss``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pasco_tpu.core.config import PaSCoConfig
from pasco_tpu.data.semantic_kitti.collate import CollatedScene, TargetBundle
from pasco_tpu.loss.criterion import SubnetTargets, criterion_all_subnets
from pasco_tpu.loss.losses import compl_labelweights, compute_sem_compl_loss
from pasco_tpu.models.unet import ModelInput, PaSCoNet
from pasco_tpu.training.optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def class_weight_vector(n_classes: int, no_object_weight: float) -> np.ndarray:
    """ones(C+1) with empty (0) and dustbin (C) down-weighted
    (``scripts/train.py:117-123``)."""
    w = np.ones(n_classes + 1, np.float32)
    w[0] = 0.1
    w[-1] = no_object_weight
    return w


def labelweights_for(cfg: PaSCoConfig, class_frequencies) -> Dict[int, jnp.ndarray]:
    power = 1.0 / 3.0 if cfg.model.n_classes == 20 else 1.0 / 1.5
    return {
        s: jnp.asarray(compl_labelweights(class_frequencies[s], power))
        for s in (1, 2, 4)
    }


def scene_to_model_input(scene: CollatedScene) -> ModelInput:
    return ModelInput(
        point_feats=jnp.asarray(scene.point_feats),
        point_coords=jnp.asarray(scene.point_coords),
        point_mask=jnp.asarray(scene.point_mask),
        global_min=jnp.asarray(scene.global_min),
        global_max=jnp.asarray(scene.global_max),
        subnet_min=jnp.asarray(scene.subnet_min),
        subnet_max=jnp.asarray(scene.subnet_max),
    )


def targets_to_device(t: TargetBundle) -> TargetBundle:
    return TargetBundle(*[jnp.asarray(x) for x in t])


def _subnet_targets(t: TargetBundle) -> SubnetTargets:
    """Criterion targets with leading subnet axis (jnp)."""
    return SubnetTargets(
        labels=t.labels,
        valid=t.labels_valid,
        mask_id_dense=t.mask_id_dense,
        semantic_dense=t.semantic_dense.astype(jnp.int32),
        unknown_dense=t.unknown_dense,
    )


def compute_losses(
    net: PaSCoNet,
    variables,
    inp: ModelInput,
    targets: TargetBundle,
    labelweights: Dict[int, jnp.ndarray],
    class_weight: jnp.ndarray,
    cfg: PaSCoConfig,
    rngs,
    train: bool,
    is_predict_panop: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Any]:
    out, mutated = net.apply(
        variables,
        inp,
        labelweights,
        train=train,
        is_predict_panop=is_predict_panop,
        rngs=rngs,
        mutable=["batch_stats"] if train else [],
    ) if train else (
        net.apply(
            variables, inp, labelweights, train=False,
            is_predict_panop=is_predict_panop,
        ),
        {},
    )

    lc = cfg.loss
    logs: Dict[str, jnp.ndarray] = {}

    sem_labels = {
        1: targets.sem_label_1.astype(jnp.int32),
        2: targets.sem_label_2.astype(jnp.int32),
        4: targets.sem_label_4.astype(jnp.int32),
    }
    compl_ce, compl_lov = compute_sem_compl_loss(
        out.sem_grids,
        out.sem_logits,
        sem_labels,
        inp.subnet_min,
        inp.subnet_max,
        labelweights,
    )
    total = (compl_ce + compl_lov) * lc.occ_weight
    logs["compl_ce"] = compl_ce
    logs["compl_lovasz"] = compl_lov

    if is_predict_panop and out.predictor is not None:
        crit = criterion_all_subnets(
            out.predictor,
            out.panop_grids[1],
            out.sem_logits_pruned,
            _subnet_targets(targets),
            inp.subnet_min,
            class_weight,
            labelweights[1],
            lc,
            cfg.model.n_classes,
            include_aux=lc.include_aux,
        )
        for k, v in crit.items():
            logs[k] = v
            if k.startswith("loss_ce"):
                total = total + lc.ce_weight * v
            elif k.startswith("loss_mask"):
                total = total + lc.mask_weight * v
            elif k.startswith("loss_dice"):
                total = total + lc.dice_weight * v
            elif k.startswith("ssc_ce") and lc.use_voxel_query_loss:
                total = total + lc.ssc_ce_weight * v
            elif k.startswith("ssc_lovasz") and lc.use_voxel_query_loss:
                total = total + lc.ssc_lovasz_weight * v

    logs["total_loss"] = total
    return total, logs, mutated


def create_train_state(
    net: PaSCoNet,
    cfg: PaSCoConfig,
    sample_input: ModelInput,
    labelweights: Dict[int, jnp.ndarray],
    rng,
    lr_mode: str = "reference",
) -> Tuple[TrainState, Any]:
    # init must be jitted: eager (op-by-op) dispatch on the tunnelled TPU
    # backend takes seconds per primitive.
    variables = jax.jit(
        lambda i: net.init(
            {"params": rng, "dropout": rng, "sample": rng},
            i,
            labelweights,
            train=False,
        )
    )(sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg.optim, lr_mode)
    opt_state = tx.init(params)
    return (
        TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        ),
        tx,
    )


def train_step(
    state: TrainState,
    inp: ModelInput,
    targets: TargetBundle,
    rng: jax.Array,
    *,
    net: PaSCoNet,
    tx,
    labelweights: Dict[int, jnp.ndarray],
    class_weight: jnp.ndarray,
    cfg: PaSCoConfig,
    is_predict_panop: bool = True,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step; jit with static net/tx/cfg via functools.partial."""
    drop_rng, sample_rng = jax.random.split(jax.random.fold_in(rng, state.step))

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        total, logs, mutated = compute_losses(
            net,
            variables,
            inp,
            targets,
            labelweights,
            class_weight,
            cfg,
            {"dropout": drop_rng, "sample": sample_rng},
            train=True,
            is_predict_panop=is_predict_panop,
        )
        return total, (logs, mutated.get("batch_stats", state.batch_stats))

    (loss, (logs, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    logs["grad_norm"] = optax.global_norm(grads)
    return (
        TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        ),
        logs,
    )


def grad_step(
    state: TrainState,
    inp: ModelInput,
    targets: TargetBundle,
    rng: jax.Array,
    *,
    net: PaSCoNet,
    labelweights: Dict[int, jnp.ndarray],
    class_weight: jnp.ndarray,
    cfg: PaSCoConfig,
    is_predict_panop: bool = True,
):
    """One scene's gradients WITHOUT the optimizer update — the
    microbatch unit of gradient accumulation.  The reference's effective
    batch is ``bs=2 x 2 GPUs`` (``scripts/train.py:213,230``,
    ``README.md:340``); on one chip that batch is reproduced by
    accumulating ``accum_steps`` scene gradients before each update
    (``training/loop.py``).  Returns ``(grads, logs, new_batch_stats)``.
    """
    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        total, logs, mutated = compute_losses(
            net, variables, inp, targets, labelweights, class_weight, cfg,
            {"dropout": rng, "sample": jax.random.fold_in(rng, 1)},
            train=True, is_predict_panop=is_predict_panop,
        )
        return total, (logs, mutated.get("batch_stats", state.batch_stats))

    (_, (logs, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return grads, logs, new_bs


def accumulate_grads(acc, grads):
    """Running sum of gradient pytrees (jitted by the caller)."""
    if acc is None:
        return grads
    return jax.tree_util.tree_map(jnp.add, acc, grads)


def apply_grads(
    state: TrainState,
    grads,
    n_accum: int,
    *,
    tx,
) -> TrainState:
    """Optimizer update from accumulated gradients (mean over the
    window, matching Lightning's ``accumulate_grad_batches`` semantics)."""
    import optax

    grads = jax.tree_util.tree_map(lambda g: g / n_accum, grads)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(
        params=new_params,
        batch_stats=state.batch_stats,
        opt_state=new_opt,
        step=state.step + 1,
    )


def eval_step(
    variables,
    inp: ModelInput,
    *,
    net: PaSCoNet,
    labelweights: Dict[int, jnp.ndarray],
):
    """Pure forward for inference/benchmarking (reference
    ``step_inference``'s timed region, ``net_panoptic_sparse.py:539-648``)."""
    return net.apply(variables, inp, labelweights, train=False)


def mc_eval_step(
    variables,
    inp: ModelInput,
    rng,
    *,
    net: PaSCoNet,
    labelweights: Dict[int, jnp.ndarray],
):
    """Forward with dropout kept live (``enable_dropout`` equivalent,
    reference ``torch_util.py:34-40`` — commented out in the released
    ``eval.py:75`` but part of the paper's MC-dropout uncertainty recipe).
    BN still uses running statistics and the voxel caps stay in eval mode;
    different ``rng`` values give different stochastic forward samples.
    """
    return net.apply(
        variables, inp, labelweights, train=False, mc_dropout=True,
        rngs={"dropout": rng},
    )
