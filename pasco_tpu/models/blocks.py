"""Flax building blocks over the padded sparse-voxel substrate.

TPU-native equivalents of the reference's MinkowskiEngine blocks
(`pasco/maskpls/mink.py:505-658`): ``BasicConvolutionBlock``,
``BasicGenerativeDeconvolutionBlock``, pre-activation ``ResidualBlock``,
``DropPath`` and ``SELayer``.  Each module operates on a
:class:`~pasco_tpu.core.sparse.SparseGrid` plus its :class:`Box`, so the
whole network is one jittable function of static-shape arrays.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pasco_tpu.core.sparse import Box, SparseGrid, global_pool
from pasco_tpu.models.norm import MaskedBatchNorm
from pasco_tpu.ops.sparse_conv import (
    Rulebook,
    generative_deconv3d,
    strided_conv3d,
    submanifold_conv3d,
)


def _conv_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform over (K * Cin) fan-in, matching ME's reset scheme."""
    k, cin, cout = shape
    fan_in = k * cin
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SparseConv(nn.Module):
    """Submanifold sparse convolution (coords preserved).

    Equivalent of ``ME.MinkowskiConvolution(ks, stride=1)``.
    """

    out_channels: int
    kernel_size: int = 3
    use_bias: bool = True
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, grid: SparseGrid, box: Box, rulebook: Optional[Rulebook] = None
    ) -> SparseGrid:
        k = self.kernel_size**3
        w = self.param(
            "kernel", _conv_init, (k, grid.num_channels, self.out_channels)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        return submanifold_conv3d(
            grid, box, w, b, compute_dtype=self.compute_dtype, rulebook=rulebook
        )


class SparseDownConv(nn.Module):
    """Kernel-2 stride-2 downsampling conv (``ME.MinkowskiConvolution(ks=2,
    stride=2)`` as used by the encoder, reference ``encoder_v2.py:124-172``)."""

    out_channels: int
    out_capacity: int
    use_bias: bool = True
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: SparseGrid, box: Box) -> SparseGrid:
        w = self.param("kernel", _conv_init, (8, grid.num_channels, self.out_channels))
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        return strided_conv3d(
            grid, box, w, self.out_capacity, b, compute_dtype=self.compute_dtype
        )


class SparseGenerativeDeconv(nn.Module):
    """Kernel-2 stride-2 generative transposed conv
    (``ME.MinkowskiConvolutionTranspose(expand_coordinates=True)``,
    reference ``mink.py:520-534``).  Output capacity = 8x input."""

    out_channels: int
    use_bias: bool = True
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: SparseGrid) -> SparseGrid:
        w = self.param("kernel", _conv_init, (8, grid.num_channels, self.out_channels))
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        return generative_deconv3d(grid, w, b, compute_dtype=self.compute_dtype)


class SpatialDropout(nn.Module):
    """Whole-channel dropout on ``[N, C]`` sparse features.

    Equivalent of ``MinkowskiSpatialDropout`` (reference
    ``pasco/models/dropout.py:5-59``): used for MC-dropout subnet
    decorrelation, so it stays active at inference when ``mc_dropout``.
    """

    rate: float

    @nn.compact
    def __call__(self, feats: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return feats
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, (1, feats.shape[-1]))
        return jnp.where(keep, feats / (1.0 - self.rate), 0).astype(feats.dtype)


class DropPath(nn.Module):
    """Stochastic depth over the residual branch (reference
    ``mink.py:551-573``; drops the branch per-voxel)."""

    rate: float

    @nn.compact
    def __call__(self, feats: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return feats
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, (feats.shape[0], 1))
        return jnp.where(keep, feats / (1.0 - self.rate), 0).astype(feats.dtype)


class SELayer(nn.Module):
    """Squeeze-and-excitation over the global-pooled sparse features
    (reference ``mink.py:53-77``)."""

    channels: int
    reduction: int = 2
    batch_size: int = 1

    @nn.compact
    def __call__(self, grid: SparseGrid) -> SparseGrid:
        y = global_pool(grid, self.batch_size, reduce="mean")  # [B, C]
        y = nn.Dense(self.channels // self.reduction)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels)(y)
        y = jax.nn.sigmoid(y)
        gate = y[jnp.clip(grid.coords[:, 0], 0, self.batch_size - 1)]
        return grid.with_feats(
            jnp.where(grid.mask[:, None], grid.feats * gate, 0)
        )


class BasicConvBlock(nn.Module):
    """Down conv + BN + LeakyReLU (+ norm/act of the caller's wrapper).

    The reference composes ``BasicConvolutionBlock(ks=2, stride=2)`` (conv +
    BN + LeakyReLU, ``mink.py:505-518``) followed by an extra
    ``norm_layer + act_layer`` in the encoder (``encoder_v2.py:124-127``);
    ``extra_norm`` reproduces that double-norm quirk.
    """

    out_channels: int
    out_capacity: int
    extra_norm: bool = True
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: SparseGrid, box: Box, train: bool) -> SparseGrid:
        g = SparseDownConv(
            self.out_channels, self.out_capacity, compute_dtype=self.compute_dtype
        )(grid, box)
        f = MaskedBatchNorm(axis_name=self.axis_name)(g.feats, g.mask, train)
        f = nn.leaky_relu(f, 0.01)
        if self.extra_norm:
            f = MaskedBatchNorm(axis_name=self.axis_name)(f, g.mask, train)
            f = nn.relu(f)
        return g.with_feats(jnp.where(g.mask[:, None], f, 0))


class ResidualBlock(nn.Module):
    """Pre-activation residual block (reference ``mink.py:618-658``):

    ``skip = 1x1(x) if channels change else x``
    ``y = Conv3(ReLU(BN(Conv3(ReLU(BN(x))))))``
    ``out = ReLU(skip + y)``
    """

    out_channels: int
    drop_path: float = 0.0
    use_se: bool = False
    batch_size: int = 1
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        grid: SparseGrid,
        box: Box,
        train: bool,
        rulebook: Optional[Rulebook] = None,
    ) -> SparseGrid:
        in_ch = grid.num_channels
        if in_ch == self.out_channels:
            skip = grid.feats
        else:
            skip = SparseConv(
                self.out_channels, 1, use_bias=True,
                compute_dtype=self.compute_dtype, name="downsample",
            )(grid, box).feats

        f = MaskedBatchNorm(axis_name=self.axis_name, name="bn1")(
            grid.feats, grid.mask, train
        )
        f = nn.relu(f)
        g = SparseConv(
            self.out_channels, 3, use_bias=True,
            compute_dtype=self.compute_dtype, name="conv1",
        )(grid.with_feats(f), box, rulebook)
        f = MaskedBatchNorm(axis_name=self.axis_name, name="bn2")(
            g.feats, g.mask, train
        )
        f = nn.relu(f)
        g = SparseConv(
            self.out_channels, 3, use_bias=True,
            compute_dtype=self.compute_dtype, name="conv2",
        )(g.with_feats(f), box, rulebook)

        y = DropPath(self.rate_or_zero())(g.feats, deterministic=not train)
        out = g.replace(feats=y)
        if self.use_se:
            out = SELayer(self.out_channels, batch_size=self.batch_size)(out)
            y = out.feats
        out_f = nn.relu(skip + y)
        return g.with_feats(jnp.where(g.mask[:, None], out_f, 0))

    def rate_or_zero(self) -> float:
        return float(self.drop_path)


class MLP(nn.Module):
    """Plain MLP with ReLU between layers (reference
    ``transformer/blocks.py:122-138``)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.output_dim)(x)


def submanifold_maxpool(
    grid: SparseGrid, box: Box, kernel_size: int
) -> SparseGrid:
    """Stride-1 sparse max-pool over a ``kernel_size^3`` neighbourhood
    (``ME.MinkowskiMaxPooling(ks, stride=1)``): per output cell, the max
    over existing neighbours' features (the cell itself always exists)."""
    from pasco_tpu.ops.sparse_conv import build_rulebook

    rb = build_rulebook(grid.coords, grid.mask, box, grid.stride, kernel_size)
    feats = grid.masked_feats()
    neg = jnp.asarray(-jnp.inf, feats.dtype)

    def tap(acc, kr):
        rows, found = kr
        v = jnp.where(found[:, None], feats[rows], neg)
        return jnp.maximum(acc, v), None

    acc0 = jnp.full(feats.shape, neg, feats.dtype)
    acc, _ = jax.lax.scan(tap, acc0, (rb.rows, rb.found))
    out = jnp.where(grid.mask[:, None], acc, 0)
    return grid.with_feats(out)


class CAM(nn.Module):
    """Context attention module (reference ``layers.py:60-78``): gate each
    cell's features by sigmoid(1x1(relu(1x1(maxpool7(x)))))."""

    planes: int
    reduction: int = 2

    @nn.compact
    def __call__(self, grid: SparseGrid, box: Box) -> SparseGrid:
        y = submanifold_maxpool(grid, box, kernel_size=7)
        h = nn.Dense(self.planes // self.reduction, name="fc1")(y.feats)
        h = nn.relu(h)
        h = nn.Dense(self.planes, name="fc2")(h)
        gate = jax.nn.sigmoid(h)
        return grid.with_feats(
            jnp.where(grid.mask[:, None], grid.feats * gate, 0)
        )


class PointwiseConvMultiheads(nn.Module):
    """Block-diagonal (per-head) 1x1 conv (reference ``layers.py:111-135``):
    the kernel is masked so head i's output channels only read head i's
    input channels."""

    in_planes: int
    planes: int
    n_heads: int = 1

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_planes, self.planes),
        )
        ih = self.in_planes // self.n_heads
        oh = self.planes // self.n_heads
        hin = jnp.arange(self.in_planes) // ih
        hout = jnp.arange(self.planes) // oh
        blockmask = (hin[:, None] == hout[None, :]).astype(w.dtype)
        return feats @ (w * blockmask)


class DepthwiseSeparableConvMultiheads(nn.Module):
    """Channelwise (depthwise) sparse conv + per-head pointwise mix
    (reference ``layers.py:178-192``)."""

    planes: int
    kernel_size: int = 3
    n_heads: int = 1

    @nn.compact
    def __call__(self, grid: SparseGrid, box: Box) -> SparseGrid:
        from pasco_tpu.ops.sparse_conv import build_rulebook

        k = self.kernel_size**3
        w = self.param(
            "depthwise", _conv_init, (k, self.planes, 1)
        )[..., 0]                                     # [K, C] channelwise
        rb = build_rulebook(
            grid.coords, grid.mask, box, grid.stride, self.kernel_size
        )
        feats = grid.masked_feats()

        def tap(acc, krw):
            rows, found, wk = krw
            return acc + jnp.where(found[:, None], feats[rows], 0) * wk, None

        acc0 = jnp.zeros(feats.shape, feats.dtype)
        acc, _ = jax.lax.scan(tap, acc0, (rb.rows, rb.found, w))
        out = PointwiseConvMultiheads(
            self.planes, self.planes, self.n_heads, name="pointwise"
        )(acc)
        out = jnp.where(grid.mask[:, None], out, 0).astype(grid.feats.dtype)
        return grid.with_feats(out)
