"""Checkpoint save/restore (Orbax) with config snapshot.

TPU-native equivalent of the reference's Lightning checkpointing
(``ModelCheckpoint(save_last, monitor='val_subnet{n}/pq_dagger_all',
save_top_k=50)``, ``scripts/train.py:180-189``; hyperparameters embedded
via ``save_hyperparameters()``, ``net_panoptic_sparse.py:91``): the full
TrainState pytree is checkpointed asynchronously and the ``PaSCoConfig``
is serialised to JSON next to it so a checkpoint fully reconstructs the
model.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

from pasco_tpu.core.config import PaSCoConfig
from pasco_tpu.training.step import TrainState


class CheckpointManager:
    """Top-k + last checkpoint manager keyed on a monitored metric
    (greater is better, like the reference's ``pq_dagger_all``)."""

    def __init__(
        self,
        directory: str,
        cfg: Optional[PaSCoConfig] = None,
        max_to_keep: int = 5,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if cfg is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(cfg.to_dict(), f, indent=2, default=str)
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep,
                    best_fn=lambda m: m.get("monitor", 0.0),
                    best_mode="max",
                    create=True,
                ),
            )
        else:
            self._mgr = None

    def save(
        self, step: int, state: TrainState, metrics: Optional[Dict] = None
    ) -> None:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        if self._mgr is not None:
            self._mgr.save(
                step,
                args=ocp.args.StandardSave(state),
                metrics=metrics,
            )
        else:  # pragma: no cover - fallback without orbax
            path = os.path.join(self.directory, f"ckpt_{step}.npz")
            flat, treedef = jax.tree_util.tree_flatten(state)
            np.savez(path, *[np.asarray(x) for x in flat])

    def wait(self) -> None:
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        return None

    def restore(self, state_like: TrainState, step: Optional[int] = None):
        """Restore into the structure of ``state_like``."""
        if self._mgr is None:
            raise RuntimeError("orbax unavailable")
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )


def load_config(directory: str) -> Dict[str, Any]:
    with open(os.path.join(directory, "config.json")) as f:
        return json.load(f)
