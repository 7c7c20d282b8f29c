"""Device-mesh data parallelism for training.

TPU-native replacement for the reference's distribution layer (PyTorch
Lightning ``DDPStrategy`` over NCCL with SyncBatchNorm,
``scripts/train.py:213-236``, ``unet3d_sparse_v2.py:172-175``): one
``jax.sharding.Mesh`` with a ``data`` axis; every device computes the loss
and gradients of its own scene inside ``shard_map`` and gradients are
``pmean``-reduced over ICI — XLA collectives instead of NCCL.  BatchNorm
modules receive the mesh axis name so batch statistics are cross-replica
(SyncBatchNorm parity) when ``sync_bn=True``.

The per-scene batch layout mirrors the reference exactly: 1 scene per
device (``README.md:340`` trains 1 item/GPU); scaling batch size = adding
devices.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pasco_tpu.core.config import PaSCoConfig
from pasco_tpu.data.semantic_kitti.collate import TargetBundle
from pasco_tpu.models.unet import ModelInput, PaSCoNet
from pasco_tpu.training.step import TrainState, compute_losses


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def stack_scenes(scenes) -> Tuple[ModelInput, TargetBundle]:
    """Stack per-device CollatedScenes along a leading batch axis."""
    import pasco_tpu.training.step as tstep

    inps = [tstep.scene_to_model_input(s) for s in scenes]
    tgts = [tstep.targets_to_device(s.targets) for s in scenes]
    inp = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *inps)
    tgt = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tgts)
    return inp, tgt


def dp_train_step(
    state: TrainState,
    inp: ModelInput,          # leading axis = device batch
    targets: TargetBundle,    # leading axis = device batch
    rng: jax.Array,
    *,
    mesh: Mesh,
    net: PaSCoNet,
    tx,
    labelweights: Dict[int, jnp.ndarray],
    class_weight: jnp.ndarray,
    cfg: PaSCoConfig,
    is_predict_panop: bool = True,
    fold_axis_rng: bool = True,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Data-parallel training step over the mesh ``data`` axis.

    Parameters are replicated; each device computes its scene's loss and
    gradient; gradients and logged scalars are ``pmean``-reduced over ICI,
    then one replicated optimizer update runs.

    ``fold_axis_rng=False`` gives every device the SAME dropout/sampling
    key — used by the scaling test to assert that DP over N copies of one
    scene produces exactly the single-device update.
    """
    axis = mesh.axis_names[0]

    def device_grads(params, batch_stats, inp_i, tgt_i, rng_i):
        # shard_map gives each device its slice with the leading axis kept;
        # squeeze it back to one scene.
        inp_i = jax.tree_util.tree_map(lambda x: x[0], inp_i)
        tgt_i = jax.tree_util.tree_map(lambda x: x[0], tgt_i)
        if fold_axis_rng:
            idx = jax.lax.axis_index(axis)
            rng_i = jax.random.fold_in(rng_i, idx)
        d_rng, s_rng = jax.random.split(jax.random.fold_in(rng_i, state.step))

        def loss_fn(p):
            variables = {"params": p, "batch_stats": batch_stats}
            total, logs, mutated = compute_losses(
                net, variables, inp_i, tgt_i, labelweights, class_weight,
                cfg, {"dropout": d_rng, "sample": s_rng}, train=True,
                is_predict_panop=is_predict_panop,
            )
            return total, (logs, mutated.get("batch_stats", batch_stats))

        (loss, (logs, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, axis)
        logs = jax.lax.pmean(logs, axis)
        new_bs = jax.lax.pmean(new_bs, axis)
        return grads, logs, new_bs

    sharded = shard_map(
        device_grads,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    grads, logs, new_bs = sharded(
        state.params, state.batch_stats, inp, targets, rng
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


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch_to_mesh(tree, mesh: Mesh):
    """Place a leading-axis batch sharded over the data axis."""
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.device_put(tree, sharding)


def ssc_counts_from_output(out, targets: TargetBundle, subnet_min,
                           n_classes: int):
    """Jittable per-class (tp, fp, fn) of the scale-1 semantic prediction
    vs the subnet-0 dense GT — the in-jit slice of ``SSCMetrics.add_batch``
    (reference ``metrics.py:525-560``) used for cross-replica evaluation.

    255-labelled GT cells are ignored, like the reference's masking.
    """
    grid = out.sem_grids[1]
    coords = grid.coords[..., -3:]
    mask = grid.mask
    if coords.ndim == 3:          # per-subnet grids: use subnet 0
        coords, mask = coords[0], mask[0]
    logits = out.sem_logits[1][:, 0]              # [cap, C]
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    gt_grid = targets.semantic_dense[0]           # [X, Y, Z] uint8
    shape = jnp.asarray(gt_grid.shape, jnp.int32)
    rel = coords - jnp.asarray(subnet_min, jnp.int32)[None, :]
    in_box = mask & jnp.all(rel >= 0, -1) & jnp.all(rel < shape[None], -1)
    relc = jnp.clip(rel, 0, shape[None] - 1)
    gt = gt_grid[relc[:, 0], relc[:, 1], relc[:, 2]].astype(jnp.int32)
    valid = in_box & (gt != 255)

    cls = jnp.arange(n_classes, dtype=jnp.int32)
    p = (pred[:, None] == cls[None]) & valid[:, None]
    g = (gt[:, None] == cls[None]) & valid[:, None]
    tp = jnp.sum(p & g, axis=0)
    fp = jnp.sum(p & ~g, axis=0)
    # fn counts GT cells the extraction missed too: scatter GT class
    # counts over the dense grid minus tp is host work; here fn is over
    # extracted cells only (the reference's sparse-side accumulator).
    fn = jnp.sum(~p & g, axis=0)
    return tp, fp, fn


def dp_eval_step(
    variables,
    inp: ModelInput,          # leading axis = device batch
    targets: TargetBundle,    # leading axis = device batch
    *,
    mesh: Mesh,
    net,
    labelweights,
    n_classes: int,
):
    """Sharded EVAL forward + cross-replica metric reduction.

    TPU-native equivalent of the reference's distributed validation: each
    rank runs its scenes and metrics are all-reduced (Lightning
    ``self.log(..., sync_dist=True)``, ``net_panoptic_sparse.py:182``).
    Each device computes its scene's per-class (tp, fp, fn) in-jit; the
    counts are ``psum``-reduced over ICI, so every device returns the
    GLOBAL counts — the host never gathers per-device outputs.
    """
    axis = mesh.axis_names[0]

    def device_eval(variables, inp_i, tgt_i):
        inp_i = jax.tree_util.tree_map(lambda x: x[0], inp_i)
        tgt_i = jax.tree_util.tree_map(lambda x: x[0], tgt_i)
        out = net.apply(variables, inp_i, labelweights, train=False)
        tp, fp, fn = ssc_counts_from_output(
            out, tgt_i, inp_i.subnet_min[0], n_classes
        )
        return (
            jax.lax.psum(tp, axis),
            jax.lax.psum(fp, axis),
            jax.lax.psum(fn, axis),
        )

    sharded = shard_map(
        device_eval,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return sharded(variables, inp, targets)
