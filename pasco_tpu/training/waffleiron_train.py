"""WaffleIron segmentation training harness (TPU-native).

JAX/optax re-design of the reference frontend trainer
(``WaffleIron_mod/utils/trainer.py:25-306``, ``launch_train.py``,
``utils/{metrics,scheduler,transforms}.py``): jitted train/eval steps on
the flax :class:`~pasco_tpu.models.waffleiron.Segmenter`, the reference's
SemSeg loss (CE ignore-255 + Lovász on valid points,
``utils/metrics.py:44-63``), confusion-matrix mIoU/oAcc/mAcc scoring
(``utils/metrics.py:23-41``), the ``WarmupCosine`` factor schedule
(``utils/scheduler.py:19-33``), host-side point-cloud augmentations
(``utils/transforms.py``), and best/last checkpointing keyed on val mIoU
(``utils/trainer.py:276-306``).

PaSCo itself consumes *pretrained* WaffleIron checkpoints (the reference
trains the frontend in a separate environment); this harness makes the
frontend trainable inside the same framework.  Distribution follows the
framework convention: batches are sharded over the mesh ``data`` axis and
gradients/metrics reduce with ``pmean``/``psum`` — no DDP port.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pasco_tpu.loss.lovasz import lovasz_softmax
from pasco_tpu.models.waffleiron import (
    Segmenter,
    grid_cell_indices,
    knn_indices,
)

IGNORE = 255


# ---------------------------------------------------------------------------
# Loss (reference utils/metrics.py:44-63) and confusion metrics (:23-41)
# ---------------------------------------------------------------------------


def semseg_loss(
    logits: jnp.ndarray,      # [N, C] per-point logits (upsampled)
    labels: jnp.ndarray,      # [N] int, 255 = ignore
    valid: jnp.ndarray,       # [N] bool padding mask
    lovasz_weight: float = 1.0,
) -> jnp.ndarray:
    """Cross-entropy (ignore 255) + Lovász-softmax over valid points."""
    keep = valid & (labels != IGNORE)
    safe = jnp.where(keep, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    ce = jnp.sum(jnp.where(keep, nll, 0)) / jnp.maximum(
        jnp.sum(keep.astype(jnp.float32)), 1.0
    )
    loss = ce
    if lovasz_weight > 0:
        loss = loss + lovasz_weight * lovasz_softmax(logits, labels, keep)
    return loss


def fast_hist(pred: jnp.ndarray, label: jnp.ndarray, valid, n: int):
    """[n, n] confusion matrix over valid, labelled points."""
    keep = valid & (label != IGNORE)
    idx = jnp.where(keep, n * label + pred, n * n)
    return jnp.bincount(idx, length=n * n + 1)[: n * n].reshape(n, n)


def per_class_iu(hist: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))


def overall_accuracy(hist: np.ndarray) -> float:
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.diag(hist).sum() / hist.sum())


def per_class_accuracy(hist: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / hist.sum(1)


# ---------------------------------------------------------------------------
# Schedule (reference utils/scheduler.py:19-33)
# ---------------------------------------------------------------------------


def warmup_cosine_factor(warmup_end: int, max_iter: int, factor_min: float):
    """The reference ``WarmupCosine`` lambda, as an optax-compatible fn."""

    def fn(step):
        warm = step / max(warmup_end, 1)
        t = (step - warmup_end) / max(max_iter - warmup_end, 1) * jnp.pi
        cos = factor_min + 0.5 * (1 - factor_min) * (jnp.cos(t) + 1)
        return jnp.where(step < warmup_end, warm, cos)

    return fn


# ---------------------------------------------------------------------------
# Host-side augmentations (reference utils/transforms.py)
# ---------------------------------------------------------------------------


class Compose:
    def __init__(self, transformations: Sequence[Callable]):
        self.transformations = transformations

    def __call__(self, pcloud, labels):
        for t in self.transformations:
            pcloud, labels = t(pcloud, labels)
        return pcloud, labels


class RandomApply:
    def __init__(self, transformation, prob=0.5, rng=None):
        self.transformation = transformation
        self.prob = prob
        self.rng = rng or np.random

    def __call__(self, pcloud, labels):
        if self.rng.rand() < self.prob:
            pcloud, labels = self.transformation(pcloud, labels)
        return pcloud, labels


class Rotation:
    """Random rotation about axis ``dim`` (reference ``transforms.py:67-92``)."""

    def __init__(self, dim=2, range=np.pi, rng=None):
        self.dim = dim
        self.range = range
        self.rng = rng or np.random

    def __call__(self, pcloud, labels):
        theta = (2 * self.rng.rand() - 1) * self.range
        cos, sin = np.cos(theta), np.sin(theta)
        dims = [d for d in range(3) if d != self.dim]
        rot = np.array([[cos, -sin], [sin, cos]], pcloud.dtype)
        pcloud = pcloud.copy()
        pcloud[:, dims] = pcloud[:, dims] @ rot.T
        return pcloud, labels


class Scale:
    def __init__(self, dims=(0, 1), range=0.05, rng=None):
        self.dims = list(dims)
        self.range = range
        self.rng = rng or np.random

    def __call__(self, pcloud, labels):
        pcloud = pcloud.copy()
        pcloud[:, self.dims] *= 1 + (2 * self.rng.rand() - 1) * self.range
        return pcloud, labels


class FlipXY:
    def __init__(self, rng=None):
        self.rng = rng or np.random

    def __call__(self, pcloud, labels):
        pcloud = pcloud.copy()
        pcloud[:, self.rng.randint(2)] *= -1.0
        return pcloud, labels


class LimitNumPoints:
    """Keep the ``max_points`` closest to a (random or origin) center."""

    def __init__(self, dims=(0, 1, 2), max_point=30000, random=False, rng=None):
        self.dims = list(dims)
        self.max_points = max_point
        self.random = random
        self.rng = rng or np.random

    def __call__(self, pcloud, labels):
        if pcloud.shape[0] <= self.max_points:
            return pcloud, labels
        if self.random:
            center = pcloud[self.rng.randint(pcloud.shape[0])][None, self.dims]
        else:
            center = np.zeros((1, len(self.dims)), pcloud.dtype)
        d = np.square(pcloud[:, self.dims] - center).sum(axis=1)
        idx = np.argsort(d)[: self.max_points]
        return pcloud[idx], labels[idx]


class Crop:
    def __init__(self, dims=(0, 1, 2), fov=((-64, -64, -8), (64, 64, 8)), eps=1e-4):
        self.dims = list(dims)
        self.fov = fov
        self.eps = eps

    def __call__(self, pcloud, labels):
        where = np.ones(pcloud.shape[0], bool)
        for i, d in enumerate(self.dims):
            where &= (pcloud[:, d] > self.fov[0][i] + self.eps) & (
                pcloud[:, d] < self.fov[1][i] - self.eps
            )
        return pcloud[where], labels[where]


class Voxelize:
    """Downsample to one (random or first) point per voxel."""

    def __init__(self, dims=(0, 1, 2), voxel_size=0.1, random=False, rng=None):
        self.dims = list(dims)
        self.voxel_size = voxel_size
        self.random = random
        self.rng = rng or np.random

    def __call__(self, pcloud, labels):
        if self.voxel_size <= 0:
            return pcloud, labels
        pc = pcloud[:, self.dims]
        if self.random:
            permute = self.rng.permutation(pc.shape[0])
            pc, pcloud, labels = pc[permute], pcloud[permute], labels[permute]
        cells = np.floor(pc / self.voxel_size).astype(np.int64)
        cells -= cells.min(0, keepdims=True)
        key = (cells[:, 0] * (cells[:, 1].max() + 1) + cells[:, 1]) * (
            cells[:, 2].max() + 1
        ) + cells[:, 2]
        _, first = np.unique(key, return_index=True)
        return pcloud[first], labels[first]


class InstanceCutMix:
    """Training-time instance bank + paste augmentation (reference
    ``WaffleIron_mod/datasets/semantic_kitti.py:27-152``).

    First pass over the dataset ``cut``s rare-thing instances (bicycle 1,
    motorcycle 2, person 5, bicyclist 6 in WaffleIron train ids) out of
    every scan — centered on their xy-mean / z-min — into a per-class
    bank (in-memory, optionally mirrored to ``rootdir`` as ``.bin`` files
    like the reference's temp dir).  Once the bank is loaded, ``mix``
    pastes up to ``num_to_add`` augmented (flip/rotate/scale) instances
    per class onto random drivable-surface points (classes 8-10:
    road/parking/sidewalk), each at least 1 m apart (1 m random voxel
    downsample of the candidate surface).
    """

    BANK_CLASSES = (1, 2, 5, 6)
    SURFACE = (8, 10)                # road..sidewalk (inclusive)

    def __init__(self, rootdir: str = "", num_to_add: int = 40, rng=None):
        self.rootdir = rootdir
        self.num_to_add = num_to_add
        self.rng = rng or np.random.RandomState(0)
        self.bank = {c: [] for c in self.BANK_CLASSES}
        self.loaded = False
        self.aug = Compose(
            (
                FlipXY(rng=self.rng),
                Rotation(rng=self.rng),
                Scale(dims=(0, 1, 2), range=0.1, rng=self.rng),
            )
        )
        self.vox = Voxelize(
            dims=(0, 1, 2), voxel_size=1.0, random=True, rng=self.rng
        )
        if rootdir and os.path.isdir(rootdir):
            import glob as _glob

            for c in self.BANK_CLASSES:
                for f in sorted(_glob.glob(os.path.join(rootdir, str(c), "*.bin"))):
                    self.bank[c].append(
                        np.fromfile(f, dtype=np.float32).reshape(-1, 4)
                    )
            self.loaded = any(len(v) for v in self.bank.values())

    def finalize_bank(self):
        self.loaded = True

    def cut(self, pc, class_label, instance_label):
        """Harvest instances from one scan into the bank
        (reference ``:99-117``; instances of <= 5 points skipped)."""
        for c in self.BANK_CLASSES:
            for iid in np.unique(instance_label[class_label == c]):
                where = instance_label == iid
                if where.sum() <= 5:
                    continue
                inst = pc[where].astype(np.float32).copy()
                inst[:, :2] -= inst[:, :2].mean(0, keepdims=True)
                inst[:, 2] -= inst[:, 2].min(0, keepdims=True)
                self.bank[c].append(inst)
                if self.rootdir:
                    d = os.path.join(self.rootdir, str(c))
                    os.makedirs(d, exist_ok=True)
                    inst.tofile(
                        os.path.join(d, f"{len(self.bank[c]) - 1:07d}.bin")
                    )

    def mix(self, pc, class_label):
        """Paste augmented bank instances onto drivable surface points
        (reference ``:119-147``)."""
        pc_vox, lab_vox = self.vox(pc, class_label)
        surf = np.where(
            (lab_vox >= self.SURFACE[0]) & (lab_vox <= self.SURFACE[1])
        )[0]
        surf = surf[self.rng.permutation(len(surf))]
        new_pc, new_label = [pc], [class_label]
        id_tot = 0
        for c in self.BANK_CLASSES:
            if not self.bank[c]:
                continue
            n_add = int(self.rng.randint(self.num_to_add))
            for _ in range(n_add):
                if id_tot >= len(surf):
                    break
                p = pc_vox[surf[id_tot]]
                obj = self.bank[c][int(self.rng.randint(len(self.bank[c])))]
                lab = np.full((obj.shape[0],), c, class_label.dtype)
                obj, lab = self.aug(obj.copy(), lab)
                obj[:, :3] += p[:3][None]
                new_pc.append(obj)
                new_label.append(lab)
                id_tot += 1
        return np.concatenate(new_pc, 0), np.concatenate(new_label, 0)

    def __call__(self, pc, class_label, instance_label=None):
        if not self.loaded:
            if instance_label is not None:
                self.cut(pc, class_label, instance_label)
            return None, None
        return self.mix(pc, class_label)


# ---------------------------------------------------------------------------
# Batch assembly (reference datasets/pc_dataset.py:213-285, zero-padded)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PointBatch:
    feats: jnp.ndarray        # [B, N, C]
    neighbors: jnp.ndarray    # [B, K, N]
    cell_inds: jnp.ndarray    # [B, n_grids, N]
    mask: jnp.ndarray         # [B, N]
    labels: jnp.ndarray       # [B, N]


jax.tree_util.register_dataclass(
    PointBatch,
    data_fields=["feats", "neighbors", "cell_inds", "mask", "labels"],
    meta_fields=[],
)


def build_point_batch(
    clouds: Sequence[np.ndarray],     # per item [n_i, 3+f] (xyz + feats)
    labels: Sequence[np.ndarray],     # per item [n_i]
    num_points: int,
    k_neighbors: int = 16,
    grids_shape=((250, 250), (250, 12), (250, 12)),
    fov: float = 50.0,
) -> PointBatch:
    """Zero-pad a list of clouds to a static [B, num_points] batch with
    neighbor and 2D-cell indices precomputed on host."""
    B = len(clouds)
    C = clouds[0].shape[1]
    feats = np.zeros((B, num_points, C), np.float32)
    neigh = np.zeros((B, k_neighbors, num_points), np.int32)
    cells = np.zeros((B, len(grids_shape), num_points), np.int32)
    mask = np.zeros((B, num_points), bool)
    labs = np.full((B, num_points), IGNORE, np.int32)
    for b, (pc, lab) in enumerate(zip(clouds, labels)):
        n = min(pc.shape[0], num_points)
        feats[b, :n] = pc[:n]
        mask[b, :n] = True
        labs[b, :n] = lab[:n]
        neigh[b, :, :n] = knn_indices(pc[:n, :3], k=k_neighbors)
        cells[b, :, :n] = grid_cell_indices(pc[:n, :3], grids_shape, fov=fov)
    return PointBatch(
        feats=jnp.asarray(feats),
        neighbors=jnp.asarray(neigh),
        cell_inds=jnp.asarray(cells),
        mask=jnp.asarray(mask),
        labels=jnp.asarray(labs),
    )


# ---------------------------------------------------------------------------
# Train / eval steps
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class WaffleTrainState:
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jnp.ndarray


jax.tree_util.register_dataclass(
    WaffleTrainState,
    data_fields=["params", "batch_stats", "opt_state", "step"],
    meta_fields=[],
)


def make_waffleiron_optimizer(
    lr: float = 0.001,
    weight_decay: float = 0.003,
    warmup_end: int = 4000,
    max_iter: int = 45000,
    factor_min: float = 0.00001,
):
    """AdamW + the reference WarmupCosine factor (``launch_train.py``
    defaults: lr 1e-3, wd 3e-3, warmup 4 epochs of the 45-epoch run)."""
    import optax

    factor = warmup_cosine_factor(warmup_end, max_iter, factor_min)
    return optax.adamw(
        learning_rate=lambda s: lr * factor(s), weight_decay=weight_decay
    )


def create_waffle_state(net: Segmenter, batch: PointBatch, tx, rng):
    one = jax.tree_util.tree_map(lambda x: x[0], batch)
    variables = net.init(
        {"params": rng},
        one.feats, one.neighbors, one.cell_inds, one.mask, True,
    )
    params = variables["params"]
    return WaffleTrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def waffleiron_train_step(
    state: WaffleTrainState,
    batch: PointBatch,
    *,
    net: Segmenter,
    tx,
    lovasz_weight: float = 1.0,
):
    """One jitted step: vmapped forward over the batch, loss, update, and
    the step's confusion matrix for streaming mIoU."""

    def loss_fn(params):
        def fwd(f, nb, ci, m):
            out, mutated = net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                f, nb, ci, m, True,
                mutable=["batch_stats"],
            )
            return out[0], mutated["batch_stats"]

        logits, new_bs = jax.vmap(fwd, in_axes=0, out_axes=(0, 0))(
            batch.feats, batch.neighbors, batch.cell_inds, batch.mask
        )
        new_bs = jax.tree_util.tree_map(lambda x: x.mean(0), new_bs)
        flat_logits = logits.reshape(-1, logits.shape[-1])
        flat_labels = batch.labels.reshape(-1)
        flat_valid = batch.mask.reshape(-1)
        loss = semseg_loss(flat_logits, flat_labels, flat_valid, lovasz_weight)
        return loss, (flat_logits, new_bs)

    (loss, (flat_logits, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    import optax

    params = optax.apply_updates(state.params, updates)
    pred = jnp.argmax(flat_logits, axis=-1)
    hist = fast_hist(
        pred, batch.labels.reshape(-1), batch.mask.reshape(-1),
        net.n_classes,
    )
    new_state = WaffleTrainState(
        params=params, batch_stats=new_bs, opt_state=opt_state,
        step=state.step + 1,
    )
    return new_state, {"loss": loss, "hist": hist}


def waffleiron_eval_step(state, batch, *, net: Segmenter):
    def fwd(f, nb, ci, m):
        logits, _tokens = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            f, nb, ci, m, False,
        )
        return logits

    logits = jax.vmap(fwd)(
        batch.feats, batch.neighbors, batch.cell_inds, batch.mask
    )
    flat_logits = logits.reshape(-1, logits.shape[-1])
    pred = jnp.argmax(flat_logits, axis=-1)
    loss = semseg_loss(
        flat_logits, batch.labels.reshape(-1), batch.mask.reshape(-1)
    )
    hist = fast_hist(
        pred, batch.labels.reshape(-1), batch.mask.reshape(-1), net.n_classes
    )
    return {"loss": loss, "hist": hist}


# ---------------------------------------------------------------------------
# Trainer (reference utils/trainer.py:25-306)
# ---------------------------------------------------------------------------


class WaffleIronTrainer:
    """Epoch loop with streaming confusion metrics, per-epoch logging, and
    best/last checkpoints keyed on val mIoU."""

    def __init__(
        self,
        net: Segmenter,
        tx,
        state: WaffleTrainState,
        out_dir: str,
        class_names: Optional[List[str]] = None,
        lovasz_weight: float = 1.0,
    ):
        self.net = net
        self.tx = tx
        self.state = state
        self.out_dir = out_dir
        self.class_names = class_names
        self.best_miou = 0.0
        self.current_epoch = 0
        os.makedirs(out_dir, exist_ok=True)
        self._train_step = jax.jit(
            partial(
                waffleiron_train_step, net=net, tx=tx,
                lovasz_weight=lovasz_weight,
            )
        )
        self._eval_step = jax.jit(partial(waffleiron_eval_step, net=net))

    def _scores(self, hist: np.ndarray) -> Dict[str, float]:
        ious = per_class_iu(hist)
        return {
            "oAcc": 100 * overall_accuracy(hist),
            "mAcc": 100 * float(np.nanmean(per_class_accuracy(hist))),
            "mIoU": 100 * float(np.nanmean(ious)),
            "ious": [float(100 * v) for v in ious],
        }

    def one_epoch(self, batches, training=True) -> Dict[str, float]:
        hist = 0
        running = 0.0
        n = 0
        t0 = time.time()
        for batch in batches:
            if training:
                self.state, logs = self._train_step(self.state, batch)
            else:
                logs = self._eval_step(self.state, batch)
            running += float(logs["loss"])
            hist = hist + np.asarray(logs["hist"])
            n += 1
        out = self._scores(hist)
        out["loss"] = running / max(n, 1)
        out["sec"] = time.time() - t0
        tag = "train" if training else "val"
        line = (
            f"epoch {self.current_epoch} [{tag}] loss={out['loss']:.3f} "
            f"oAcc={out['oAcc']:.1f} mAcc={out['mAcc']:.1f} "
            f"mIoU={out['mIoU']:.1f} ({out['sec']:.1f}s)"
        )
        print(line)
        with open(os.path.join(self.out_dir, "log.jsonl"), "a") as f:
            f.write(json.dumps({"epoch": self.current_epoch, "tag": tag, **out}) + "\n")
        return out

    def save_state(self, best=False):
        name = "ckpt_best.pkl" if best else "ckpt_last.pkl"
        payload = {
            "epoch": self.current_epoch,
            "best_miou": self.best_miou,
            "state": jax.tree_util.tree_map(np.asarray, self.state),
        }
        with open(os.path.join(self.out_dir, name), "wb") as f:
            pickle.dump(payload, f)

    def load_state(self, best=False):
        name = "ckpt_best.pkl" if best else "ckpt_last.pkl"
        with open(os.path.join(self.out_dir, name), "rb") as f:
            payload = pickle.load(f)
        self.state = jax.tree_util.tree_map(
            jnp.asarray, payload["state"]
        )
        self.best_miou = payload["best_miou"]
        self.current_epoch = payload["epoch"] + 1

    def train(self, train_batches_fn, val_batches_fn, max_epoch: int):
        """``*_batches_fn()`` -> iterable of :class:`PointBatch` per epoch
        (callables so augmentation re-draws every epoch)."""
        for _ in range(self.current_epoch, max_epoch):
            self.one_epoch(train_batches_fn(), training=True)
            scores = self.one_epoch(val_batches_fn(), training=False)
            if scores["mIoU"] > self.best_miou:
                self.best_miou = scores["mIoU"]
                self.save_state(best=True)
                print(f"*** new best mIoU {self.best_miou:.1f}")
            self.save_state()
            self.current_epoch += 1
