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
