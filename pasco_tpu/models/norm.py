"""Normalisation layers for padded sparse voxel sets.

The reference architecture is BatchNorm-heavy (``ME.MinkowskiBatchNorm``
everywhere, converted to ``MinkowskiSyncBatchNorm`` for DDP training —
reference ``unet3d_sparse_v2.py:172-175``).  On TPU we implement *masked*
batch norm: statistics are computed over valid voxels only (padding rows
would otherwise poison the moments), with optional cross-replica ``pmean``
over a named mesh axis, which reproduces SyncBatchNorm through XLA
collectives instead of NCCL.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pasco_tpu.core.sparse import SparseGrid


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of a padded ``[N, C]`` feature set.

    Equivalent to ``ME.MinkowskiBatchNorm`` (statistics over all voxels of
    the sparse tensor).  When ``axis_name`` is set and the module runs inside
    ``shard_map``/``pjit`` with that mesh axis, batch statistics are averaged
    across replicas (SyncBatchNorm parity).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray, train: bool):
        c = feats.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if train:
            m = mask.astype(jnp.float32)[:, None]
            f32 = feats.astype(jnp.float32)
            cnt = jnp.sum(m)
            s1 = jnp.sum(f32 * m, axis=0)
            s2 = jnp.sum(jnp.square(f32) * m, axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (feats.astype(jnp.float32) - mean) * inv + bias
        return jnp.where(mask[:, None], out, 0).astype(feats.dtype)


class DenseBatchNorm(nn.Module):
    """BatchNorm3d over dense ``[B, X, Y, Z, C]`` tensors (channels last).

    Equivalent of ``nn.BatchNorm3d`` in the dense bottleneck (reference
    ``layers.py:659-702``); statistics over (B, X, Y, Z).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if train:
            f32 = x.astype(jnp.float32)
            mean = jnp.mean(f32, axis=axes)
            var = jnp.var(f32, axis=axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                var = jax.lax.pmean(var, self.axis_name)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


class BatchNorm1d(nn.Module):
    """BatchNorm over rows of ``[N, C]`` point features with a validity mask.

    Used by the CylinderFeat point MLP (reference
    ``unet3d_sparse_v2.py:22-34``).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, mask, train: bool):
        return MaskedBatchNorm(
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            name="bn",
        )(feats, mask, train)


def spatial_dropout(
    rng, feats: jnp.ndarray, rate: float, deterministic: bool
) -> jnp.ndarray:
    """Whole-channel (Dropout1d-style) dropout on ``[N, C]`` features.

    Equivalent of ``MinkowskiSpatialDropout`` (reference ``dropout.py:5-59``):
    drops entire feature channels across all voxels, used for MC-dropout
    subnet decorrelation.
    """
    if deterministic or rate == 0.0:
        return feats
    keep = jax.random.bernoulli(rng, 1.0 - rate, (1, feats.shape[-1]))
    return jnp.where(keep, feats / (1.0 - rate), 0).astype(feats.dtype)
