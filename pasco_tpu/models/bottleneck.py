"""Dense completion bottleneck at stride 8.

TPU-native equivalent of ``SPCDense3Dv2`` (reference
``pasco/models/layers.py:646-726``, SCPNet-style multi-branch anisotropic
dense conv aggregation) and of ``UNet3DV2.dense_bottleneck``
(``unet3d_sparse_v2.py:182-214``): sparse -> dense within the global box,
run the dense block, re-sparsify.

Dense 3D convolutions are exactly what the MXU wants: channels-last
``conv_general_dilated`` with 256 channels maps straight onto 128x128
systolic tiles, so this stage needs no Pallas.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pasco_tpu.core.sparse import Box, SparseGrid, from_dense, to_dense
from pasco_tpu.models.norm import DenseBatchNorm


class _Conv3d(nn.Module):
    """Bias-free channels-last 3D conv with 'same' anisotropic padding."""

    features: int
    kernel: Tuple[int, int, int]
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kx, ky, kz = self.kernel
        cd = self.compute_dtype or x.dtype
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (kx, ky, kz, x.shape[-1], self.features),
        )
        out = jax.lax.conv_general_dilated(
            x.astype(cd),
            w.astype(cd),
            window_strides=(1, 1, 1),
            padding=[(kx // 2, kx // 2), (ky // 2, ky // 2), (kz // 2, kz // 2)],
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype)


class SPCDense3D(nn.Module):
    """Multi-branch dense completion block (reference ``layers.py:646-726``).

    Branch structure (all convs bias-free, each followed by BN + ReLU):
      x1 = f331(x); x2..x4 = f331/f553/f775(x1); t = x2+x3+x4;
      x5..x7 = f331/f553/f775(t); s = x1+..+x7;
      y0 = 1x1(s); y1..y3 = f331/f553/f775(x);
      out = x1 + y0 + y1 + y2 + y3
    """

    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        ch = x.shape[-1]
        cd = self.compute_dtype

        def cbr(y, kernel, name):
            y = _Conv3d(ch, kernel, compute_dtype=cd, name=f"{name}_conv")(y)
            y = DenseBatchNorm(axis_name=self.axis_name, name=f"{name}_bn")(
                y, train
            )
            return nn.relu(y)

        k331, k553, k775 = (3, 3, 1), (5, 5, 3), (7, 7, 5)
        x1 = cbr(x, k331, "a1")
        x2 = cbr(x1, k331, "a2")
        x3 = cbr(x1, k553, "a3")
        x4 = cbr(x1, k775, "a4")
        t = x2 + x3 + x4
        x5 = cbr(t, k331, "a5")
        x6 = cbr(t, k553, "a6")
        x7 = cbr(t, k775, "a7")
        s = x1 + x2 + x3 + x4 + x5 + x6 + x7
        y0 = cbr(s, (1, 1, 1), "ch1")
        y1 = cbr(x, k331, "r1")
        y2 = cbr(x, k553, "r2")
        y3 = cbr(x, k775, "r3")
        return x1 + y0 + y1 + y2 + y3


class DenseBottleneck(nn.Module):
    """Sparse(s8) -> dense box -> SPCDense3D -> channel dropout -> sparse(s8).

    The reference densifies within the dynamic global bbox
    (``unet3d_sparse_v2.py:182-214``); with static shapes we densify the
    whole static working box at stride 8 (typically 48x48x8 cells), which
    keeps one compiled program for every scan.
    """

    out_capacity: int
    dropout: float = 0.0
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, grid: SparseGrid, box: Box, train: bool
    ) -> SparseGrid:
        dense = to_dense(grid, box, batch_size=1)  # [1, X, Y, Z, C]
        dense = SPCDense3D(
            axis_name=self.axis_name, compute_dtype=self.compute_dtype,
            name="spc",
        )(dense, train)
        if self.dropout > 0.0:
            # nn.Dropout3d equivalent: drop whole channels.
            dense = nn.Dropout(
                self.dropout, broadcast_dims=(0, 1, 2, 3),
            )(dense, deterministic=not train)
        return from_dense(dense, box, stride=grid.stride, capacity=self.out_capacity)
