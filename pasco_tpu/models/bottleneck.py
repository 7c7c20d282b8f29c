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


def shift_matmul_conv3d(
    x: jnp.ndarray,            # [B, X, Y, Z, C]
    w: jnp.ndarray,            # [kx, ky, kz, C, D]
    compute_dtype=None,
) -> jnp.ndarray:
    """'Same'-padded dense 3D conv as a scan of shift + MXU matmul taps.

    XLA's native spatial convolution on this backend compiles these
    anisotropic (7,7,5)x256ch shapes at ~1 min *per conv* (the SCPNet
    block alone cost 14 min of compile) and runs them at a few TFLOPs.
    Expressing the conv as K = kx*ky*kz shifted ``[N, C] @ [C, D]`` matmuls
    under ``lax.scan`` compiles in seconds and keeps the MXU fed.
    """
    b, X, Y, Z, c = x.shape
    kx, ky, kz = w.shape[:3]
    d = w.shape[-1]
    cd = compute_dtype or x.dtype
    xp = jnp.pad(
        x.astype(cd),
        ((0, 0), (kx // 2, kx // 2), (ky // 2, ky // 2), (kz // 2, kz // 2), (0, 0)),
    )
    offsets = jnp.asarray(
        [(i, j, k) for i in range(kx) for j in range(ky) for k in range(kz)],
        jnp.int32,
    )
    wk = w.reshape(kx * ky * kz, c, d).astype(cd)

    def tap(acc, inp):
        off, wi = inp
        sl = jax.lax.dynamic_slice(
            xp, (0, off[0], off[1], off[2], 0), (b, X, Y, Z, c)
        )
        out = jnp.dot(
            sl.reshape(-1, c), wi, preferred_element_type=jnp.float32
        )
        return acc + out, None

    acc0 = jnp.zeros((b * X * Y * Z, d), jnp.float32)
    acc, _ = jax.lax.scan(tap, acc0, (offsets, wk))
    return acc.reshape(b, X, Y, Z, d).astype(x.dtype)


def zfold_conv3d(
    x: jnp.ndarray,            # [B, X, Y, Z, C]
    w: jnp.ndarray,            # [kx, ky, kz, C, D]
    compute_dtype=None,
) -> jnp.ndarray:
    """'Same' anisotropic 3D conv as ONE native 2D conv with z folded into
    channels.

    At stride 8 the z extent is tiny (4 cells), so ``[B, X, Y, Z, C] ->
    [B, X, Y, Z*C]`` turns the (kx, ky, kz) conv into a (kx, ky) conv with
    block-banded ``[Z*C, Z*D]`` channel mixing (block (zi, zo) = the
    ``dz = zi - zo + kz//2`` kernel slice, zero outside the band).  Exact
    same math as :func:`shift_matmul_conv3d`, but a single 1024-channel
    MXU-shaped conv instead of kx*ky*kz shifted slice+matmul taps — the
    tap scan was ~1000 slices + small matmuls per scan (~150 ms, HBM-bound)
    while this runs in a few ms, and 2D convs sidestep the pathological
    minutes-long XLA compile of the native anisotropic 3D forms.
    """
    b, X, Y, Z, c = x.shape
    kx, ky, kz, _, d = w.shape
    cd = compute_dtype or x.dtype
    if kz == 1:
        # No z mixing: the folded [Z*c, Z*d] weight would be block-diagonal
        # (4x dead FLOPs at Z=4).  Run z as extra rows of a [*, c] @ [c, d]
        # dot per xy tap instead.
        xp = jnp.pad(
            x.astype(cd),
            ((0, 0), (kx // 2, kx // 2), (ky // 2, ky // 2), (0, 0), (0, 0)),
        )
        wk = w.astype(cd)
        acc = jnp.zeros((b * X * Y * Z, d), jnp.float32)
        for i in range(kx):
            for j in range(ky):
                sl = jax.lax.slice(
                    xp, (0, i, j, 0, 0), (b, i + X, j + Y, Z, c)
                ).reshape(b * X * Y * Z, c)
                acc += jnp.dot(
                    sl, wk[i, j, 0], preferred_element_type=jnp.float32
                )
        return acc.reshape(b, X, Y, Z, d).astype(x.dtype)
    xf = x.reshape(b, X, Y, Z * c).astype(cd)
    # Banded block expansion as ONE einsum against a constant one-hot
    # [kz, Z, Z] tensor (band[dz, zi, zo] = 1 iff dz == zi - zo + kz//2).
    # The loop-of-.at[].set form lowered to ~Z^2 sequential 100 MB
    # dynamic-update-slices per conv (~6 ms/scan of pure weight reshuffle
    # in the profile); the einsum fuses to a single broadcast-select pass.
    import numpy as _np

    band = _np.zeros((kz, Z, Z), _np.float32)
    for zo in range(Z):
        for zi in range(Z):
            dz = zi - zo + kz // 2
            if 0 <= dz < kz:
                band[dz, zi, zo] = 1
    # Expand in ``cd`` directly (one-hot multiply is exact in any dtype):
    # the f32 form materialised a 206 MB [7, 7, 1024, 1024] weight per
    # conv per forward and then converted it to ``cd`` in a second pass.
    w2 = jnp.einsum(
        "xyzcd,zio->xyicod", w.astype(cd), jnp.asarray(band, cd)
    ).reshape(kx, ky, Z * c, Z * d)
    # Native conv_general ran these 1024-channel 44x44 shapes at ~34 TFLOP/s
    # (r3_conv 5.84 ms in the round-4 trace).  kx*ky unrolled shifted
    # [X*Y, Z*c] @ [Z*c, Z*d] dots keep the MXU fed instead; f32
    # accumulation across taps matches the conv's internal accumulator.
    # (The conv VJP caveat is moot: dot_general takes preferred_element_type
    # in both forward and transpose.)
    xp = jnp.pad(
        xf, ((0, 0), (kx // 2, kx // 2), (ky // 2, ky // 2), (0, 0))
    )
    w2 = w2.astype(cd)
    acc = jnp.zeros((b * X * Y, Z * d), jnp.float32)
    for i in range(kx):
        for j in range(ky):
            sl = jax.lax.slice(
                xp, (0, i, j, 0), (b, i + X, j + Y, Z * c)
            ).reshape(b * X * Y, Z * c)
            acc += jnp.dot(sl, w2[i, j], preferred_element_type=jnp.float32)
    return acc.reshape(b, X, Y, Z, d).astype(x.dtype)


class _Conv3d(nn.Module):
    """Bias-free channels-last 3D conv with 'same' anisotropic padding."""

    features: int
    kernel: Tuple[int, int, int]
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kx, ky, kz = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (kx, ky, kz, x.shape[-1], self.features),
        )
        if kx == ky == kz == 1:
            out = jnp.dot(
                x.astype(self.compute_dtype or x.dtype).reshape(-1, x.shape[-1]),
                w[0, 0, 0].astype(self.compute_dtype or x.dtype),
                preferred_element_type=jnp.float32,
            )
            return out.reshape(*x.shape[:-1], self.features).astype(x.dtype)
        # z-fold pays a (Z/kz)-ish FLOP overhead for the banded blocks; it
        # wins whenever the folded channel count still tiles the MXU and z
        # is small (the stride-8 box).  Fall back to tap scans otherwise.
        if x.shape[3] <= 8:
            return zfold_conv3d(x, w, self.compute_dtype)
        return shift_matmul_conv3d(x, w, self.compute_dtype)


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
        self, grid: SparseGrid, box: Box, train: bool,
        drop_on: Optional[bool] = None,
    ) -> SparseGrid:
        if drop_on is None:
            drop_on = train
        dense = to_dense(grid, box, batch_size=1)  # [1, X, Y, Z, C]
        dense = SPCDense3D(
            axis_name=self.axis_name, compute_dtype=self.compute_dtype,
            name="spc",
        )(dense, train)
        if self.dropout > 0.0:
            # nn.Dropout3d equivalent: drop whole channels.
            dense = nn.Dropout(
                self.dropout, broadcast_dims=(0, 1, 2, 3),
            )(dense, deterministic=not drop_on)
        return from_dense(dense, box, stride=grid.stride, capacity=self.out_capacity)
