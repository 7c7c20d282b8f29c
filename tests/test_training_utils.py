"""Tests for optimizer schedule, checkpointing, and logging."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pasco_tpu.core.config import OptimConfig, PaSCoConfig
from pasco_tpu.training.checkpoint import CheckpointManager
from pasco_tpu.training.optim import lr_schedule, make_optimizer
from pasco_tpu.training.step import TrainState


def test_reference_schedule():
    cfg = OptimConfig(lr=1e-4, warmup_steps=0)
    fn = lr_schedule(cfg, "reference")
    assert abs(float(fn(100)) - 1e-4) < 1e-9
    assert abs(float(fn(70000)) - 1e-5) < 1e-9  # x0.1 after 60k


def test_warmup():
    cfg = OptimConfig(lr=1e-3, warmup_steps=100)
    fn = lr_schedule(cfg, "reference")
    assert float(fn(0)) < 1e-4
    assert abs(float(fn(99)) - 1e-3) < 1e-7


def test_cosine_schedule_endpoints():
    cfg = OptimConfig(lr=1e-3, warmup_steps=10, max_steps=1000)
    fn = lr_schedule(cfg, "cosine")
    assert float(fn(9)) <= 1e-3 + 1e-9
    assert float(fn(1000)) < 2e-5 + 1e-3 * 0.01 + 1e-9


def test_optimizer_clips_gradients():
    cfg = OptimConfig(lr=1.0, warmup_steps=0, grad_clip=0.5)
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    huge = {"w": jnp.full(3, 100.0)}
    updates, _ = tx.update(huge, state, params)
    # Clipped grad has norm 0.5; adam normalises, but update must be finite
    # and bounded by lr.
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_checkpoint_roundtrip(tmp_path):
    state = TrainState(
        params={"w": jnp.arange(4.0)},
        batch_stats={"m": jnp.ones(2)},
        opt_state={"count": jnp.zeros(())},
        step=jnp.asarray(7, jnp.int32),
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"), PaSCoConfig(), max_to_keep=2)
    mgr.save(7, state, {"monitor": 0.5})
    mgr.wait()
    assert mgr.latest_step() == 7
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = mgr.restore(zero)
    assert float(restored.params["w"][3]) == 3.0
    assert int(restored.step) == 7
    # Config snapshot written next to checkpoints.
    assert os.path.exists(tmp_path / "ckpt" / "config.json")
