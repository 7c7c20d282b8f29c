"""Sparse 4-stage encoder (strides 1 -> 2 -> 4 -> 8).

TPU-native re-design of ``Encoder3DSepV2`` (reference
``pasco/models/encoder_v2.py:89-183``).  Two modes matching the reference:

* ``heavy_decoder=False`` (the released config, ``scripts/train.py:58``):
  each stage is a ks=2/stride=2 down conv followed by 3 residual blocks.
* ``heavy_decoder=True``: stages are down conv + BN + ReLU + spatial
  dropout only (capacity moved into the decoder).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pasco_tpu.core.config import CapacityConfig, ModelConfig
from pasco_tpu.core.sparse import Box, SparseGrid
from pasco_tpu.models.blocks import (
    BasicConvBlock,
    ResidualBlock,
    SparseConv,
    SpatialDropout,
)
from pasco_tpu.ops.sparse_conv import build_rulebook


class Encoder(nn.Module):
    """Returns the 4 per-scale feature grids [s1, s2, s4, s8]."""

    cfg: ModelConfig
    cap: CapacityConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, grid: SparseGrid, box: Box, train: bool,
        drop_on: Optional[bool] = None,
    ) -> List[SparseGrid]:
        if drop_on is None:
            drop_on = train
        cfg = self.cfg
        f = cfg.f_maps
        cd = jnp.dtype(cfg.compute_dtype)
        heavy = cfg.heavy_decoder
        drops = cfg.encoder_dropouts

        x = SparseConv(f[0], 1, compute_dtype=cd, name="in_conv")(grid, box)

        n_res = cfg.res_blocks if cfg.res_blocks is not None else 3
        if not heavy:
            rb1 = build_rulebook(x.coords, x.mask, box, x.stride, 3)
            for i in range(n_res):
                x = ResidualBlock(
                    f[0], axis_name=self.axis_name, compute_dtype=cd,
                    name=f"s1_res{i}",
                )(x, box, train, rb1)
        s1 = x

        def down_stage(x, out_ch, stride, dropout, name):
            x = BasicConvBlock(
                out_ch,
                self.cap.enc_capacity(stride),
                extra_norm=True,
                axis_name=self.axis_name,
                compute_dtype=cd,
                name=f"{name}_down",
            )(x, box, train)
            if heavy:
                x = x.with_feats(
                    SpatialDropout(dropout, name=f"{name}_drop")(
                        x.feats, deterministic=not drop_on
                    )
                )
            else:
                rb = build_rulebook(x.coords, x.mask, box, x.stride, 3)
                for i in range(n_res):
                    x = ResidualBlock(
                        out_ch, axis_name=self.axis_name, compute_dtype=cd,
                        name=f"{name}_res{i}",
                    )(x, box, train, rb)
            return x

        s2 = down_stage(s1, f[1], 2, drops[-3], "s1s2")
        s4 = down_stage(s2, f[2], 4, drops[-2], "s2s4")
        s8 = down_stage(s4, f[3], 8, drops[-1], "s4s8")
        return [s1, s2, s4, s8]
