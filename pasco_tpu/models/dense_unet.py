"""Dense-with-masks PaSCo network — the TPU-fast compute path.

Same architecture, losses, and outputs as :class:`PaSCoNet` (which keeps
the gather-based sparse formulation), but every U-Net stage computes on
dense ``[X, Y, Z, C]`` volumes over the bounded working box with occupancy
masks.  A masked dense conv is numerically identical to the masked
submanifold conv — absent neighbours contribute zero either way and
absent outputs are re-masked — while dense slices/matmuls run near the
MXU/HBM roofline instead of the ~25 GB/s of random row gathers (measured
on the target chip; see ops/dense_ops.py).

Sparsity survives where it belongs on TPU: the per-scale *extraction* of
capped voxel sets feeding the mask transformer and the losses
(prefix-sum compaction), mirroring the reference's pruning
(``decoder_v3.py:319-451``).

Eval parity note: the reference skips the occupancy caps at test time
(``decoder_v3.py:347``), so dense eval is exact.  At train time the
reference prunes (multinomial-capped) voxels before the next decoder
block; :func:`pasco_tpu.ops.dense_ops.cap_keep_gumbel` reproduces that
(Gumbel-top-k == weighted sampling without replacement) on the dense
keep mask feeding the next stage and the extractions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pasco_tpu.core.config import PaSCoConfig
from pasco_tpu.core.sparse import Box, SparseGrid
from pasco_tpu.models.blocks import _conv_init
from pasco_tpu.models.bottleneck import SPCDense3D
from pasco_tpu.models.decoder import DecoderOutput
from pasco_tpu.models.norm import MaskedBatchNorm
from pasco_tpu.models.transformer import TransformerPredictor
from pasco_tpu.models.unet import ModelInput, ModelOutput
from pasco_tpu.ops.dense_ops import (
    bbox_mask,
    blockdiag2_weight,
    cap_keep_gumbel,
    cell_coords,
    conv3_dense,
    conv3_packed_z2,
    deconv2_dense,
    deconv2_packed_to_packed,
    deconv2_plain_to_packed,
    down2_dense,
    down2_packed_to_packed,
    down2_packed_to_plain,
    extract_sparse,
    extract_sparse_z2,
    mask_mul_z2,
    maxpool2_mask,
    pack_z2,
    scatter_max_rows,
    upsample2_mask,
)


# Internal volume layout of the dense substrate: [X, Z, Y, C].  Keeping
# the short z extent away from the sublane (channel-adjacent) position
# makes XLA's TPU convolutions 1.4-8x faster per scale (measured; see
# ops/dense_ops.py docstring).  Weight layouts are unchanged — the dense
# ops permute kernel taps internally — and all SparseGrid outputs carry
# explicit (x, y, z) coords, so nothing outside this module changes.
ORDER = "xzy"


def _mask_mul(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mask[..., None], x, 0)


def _mm(x: jnp.ndarray, mask: jnp.ndarray, packed: bool) -> jnp.ndarray:
    """Mask a (possibly z-pair-packed) volume with a LOGICAL [X, Z, Y]
    occupancy mask; slot masks are cheap strided views."""
    if packed:
        return mask_mul_z2(x, mask[:, 0::2], mask[:, 1::2])
    return jnp.where(mask[..., None], x, 0)


class DenseBN(nn.Module):
    """Masked BatchNorm over the valid cells of a dense volume (stats
    exclude empty cells, like ME BatchNorm over sparse voxels).

    Operates directly on the 4D volume: flattening to ``[N, C]`` forced an
    f32 relayout copy of the whole volume (1.7 GB at full scale) between
    the deconv and the normalisation.
    """

    axis_name: Optional[str] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    packed: bool = False   # x is z-pair packed [X, T, Y, 2C]; mask logical
    mask_output: bool = True  # False: caller guarantees empties are never read

    @nn.compact
    def __call__(self, x, mask, train, affine_only=False):
        c = x.shape[-1] // 2 if self.packed else x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if affine_only:
            # Inference-mode normalisation as per-channel (a, b) for the
            # fused kernel prologue: y = a*x + b == (x - mean)*inv + bias.
            assert not train
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            a = inv
            b = bias - ra_mean.value * inv
            if self.packed:
                a = jnp.concatenate([a, a])
                b = jnp.concatenate([b, b])
            return a, b

        axes = tuple(range(x.ndim - 1))
        if train:
            # Masked sums with f32 ACCUMULATION but no materialised f32
            # copy of the volume: the old shared ``mx.astype(f32)`` became
            # a full-volume HBM temp feeding both reduces (~15 ms/step at
            # the s1 shape).  Values are bf16 either way, so converting
            # per-element inside each reduce fusion is bit-identical.
            mx = _mm(x, mask, self.packed)
            cnt = jnp.maximum(
                jnp.sum(mask, dtype=jnp.float32), 1.0
            )
            s1 = jnp.sum(mx, axis=axes, dtype=jnp.float32)
            s2 = jnp.sum(
                jnp.square(mx.astype(jnp.float32)), axis=axes
            )
            if self.packed:  # fold the two slot halves per logical channel
                s1 = s1[:c] + s1[c:]
                s2 = s2[:c] + s2[c:]
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(x.dtype)
        mean = mean.astype(x.dtype)
        b = bias.astype(x.dtype)
        if self.packed:
            inv = jnp.concatenate([inv, inv])
            mean = jnp.concatenate([mean, mean])
            b = jnp.concatenate([b, b])
        out = (x - mean) * inv + b
        if not self.mask_output:
            return out
        return _mm(out, mask, self.packed)


class DenseBNResizeCoords(nn.Module):
    """``resize_bn`` + the 1x1 ``resize`` conv over [features ⊕ (x,y,z)
    cell coords] WITHOUT materialising the 2*(ch+3)-lane concat.

    The reference decoder concatenates normalised cell coordinates to the
    up-path features before a BN + 1x1 conv (``decoder_v3.py``); on TPU a
    134-lane packed volume tile-pads to 256 lanes — the (256,16,256,134)
    train-step temps were 512 MB each at 1.9x padding (the round-3 OOM's
    top allocation).  BN is per-channel and the 1x1 conv is linear, so the
    coord channels split off exactly: features stay on their tile-aligned
    [.., 2ch] buffer, and the coord contribution — affine in the cell
    coordinate — collapses to three rank-1 broadcast terms fused into the
    feature dot's epilogue.  Coord BN statistics come from mask marginals
    (sum_cells m*c_j = <marginal counts, coord vector>), never from a
    materialised coord volume.

    Parameter/stat tree is identical to ``DenseBN`` under the same name
    (scale/bias/mean/var of ch+3 channels), so checkpoints and the torch
    converter are unaffected; the fused up-preamble path keeps reading the
    same params through ``DenseBN(affine_only=True)`` on a token input.
    """

    axis_name: Optional[str] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, box, scale, wr, br, train,
                 compute_dtype=None):
        # x: [X, T, Y, 2ch] packed features (producer-masked or lean —
        # stats mask internally exactly like DenseBN); mask: [X, 2T, Y].
        X, T, Y, c2 = x.shape
        ch = c2 // 2
        c = ch + 3
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale_p = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias_p = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        # Per-axis coord value vectors, bit-matching the old
        # cell_coords/scale -> bf16 rounding (volume dims are x, z, y).
        mn = box.minimum
        cx = ((jnp.arange(X, dtype=jnp.int32) * scale + mn[0])
              .astype(jnp.float32) / scale).astype(x.dtype)
        cz = ((jnp.arange(2 * T, dtype=jnp.int32) * scale + mn[2])
              .astype(jnp.float32) / scale).astype(x.dtype)
        cy = ((jnp.arange(Y, dtype=jnp.int32) * scale + mn[1])
              .astype(jnp.float32) / scale).astype(x.dtype)

        if train:
            mx = _mm(x, mask, True).astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
            s1 = jnp.sum(mx, axis=(0, 1, 2))
            s2 = jnp.sum(jnp.square(mx), axis=(0, 1, 2))
            s1f = s1[:ch] + s1[ch:]
            s2f = s2[:ch] + s2[ch:]
            # Coord stats via mask marginals: sum_cells m * c_j depends on
            # one axis only, so it is a dot of the marginal count vector
            # with the (bf16-rounded) coord values.
            mf = mask.astype(jnp.float32)
            m_x, m_z, m_y = mf.sum((1, 2)), mf.sum((0, 2)), mf.sum((0, 1))
            cxf, cyf, czf = (v.astype(jnp.float32) for v in (cx, cy, cz))
            s1c = jnp.stack(
                [m_x @ cxf, m_y @ cyf, m_z @ czf]
            )
            s2c = jnp.stack(
                [m_x @ jnp.square(cxf), m_y @ jnp.square(cyf),
                 m_z @ jnp.square(czf)]
            )
            s1 = jnp.concatenate([s1f, s1c])
            s2 = jnp.concatenate([s2f, s2c])
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale_p
        # Features: y = a*x + b on the tile-aligned buffer, then the
        # feature block of the 1x1 resize as one packed dot.
        a_f = inv[:ch].astype(x.dtype)
        b_f = (bias_p[:ch] - mean[:ch] * inv[:ch]).astype(x.dtype)
        xbn = x * jnp.concatenate([a_f, a_f]) + jnp.concatenate([b_f, b_f])
        cd = compute_dtype or x.dtype
        wf = blockdiag2_weight(wr[:ch]).astype(cd)
        out = jnp.dot(xbn.astype(cd).reshape(-1, c2), wf).reshape(
            X, T, Y, -1
        )
        # Coords: ((c_j - mean_j)*inv_j + b_j) * W_row_j — three rank-1
        # broadcast terms (z differs per packed slot), plus the conv bias.
        co2 = out.shape[-1]
        a_c = inv[ch:]
        b_c = bias_p[ch:] - mean[ch:] * inv[ch:]
        wc = wr[ch:].astype(jnp.float32)                       # [3, co]
        cxb = cx.astype(jnp.float32) * a_c[0] + b_c[0]         # [X]
        cyb = cy.astype(jnp.float32) * a_c[1] + b_c[1]         # [Y]
        czb = cz.astype(jnp.float32) * a_c[2] + b_c[2]         # [2T]
        br2 = jnp.concatenate([br, br]).astype(jnp.float32)
        coord = (
            cxb[:, None, None, None] * jnp.tile(wc[0], 2)
            + cyb[None, None, :, None] * jnp.tile(wc[1], 2)
            + jnp.concatenate(
                [czb[0::2, None] * wc[2], czb[1::2, None] * wc[2]], axis=-1
            )[None, :, None, :]
            + br2
        )
        return (out.astype(jnp.float32) + coord).astype(x.dtype)


class DenseSpatialDropout(nn.Module):
    """Whole-channel dropout on a dense (optionally z-pair-packed) volume.

    Equivalent of ``MinkowskiSpatialDropout`` (reference
    ``pasco/models/dropout.py:41-59``: Dropout1d over the feature columns
    of a sparse tensor == one Bernoulli draw per *channel*, shared by all
    cells) and of the bottleneck's ``nn.Dropout3d``
    (``unet3d_sparse_v2.py:152-154``).  Packed volumes drop logical
    channels — both z-slots of a channel share its draw.  Stays live at
    inference when the caller passes ``deterministic=False`` (MC dropout).
    """

    rate: float
    packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        c = x.shape[-1] // 2 if self.packed else x.shape[-1]
        keep = jax.random.bernoulli(
            self.make_rng("dropout"), 1.0 - self.rate, (c,)
        )
        if self.packed:
            keep = jnp.concatenate([keep, keep])
        return jnp.where(keep, x / (1.0 - self.rate), 0).astype(x.dtype)


def point_dropout(
    pm: jnp.ndarray, rate: float, rng: jax.Array
) -> jnp.ndarray:
    """Drop a random 0..``rate`` fraction of the input points.

    Reference recipe: ``--point_dropout_ratio 0.05`` ("randomly drop from
    0 to 5% points in 3D input", ``scripts/train.py:42``) lands in
    ``encoder_dropouts[0]`` — which the released reference never actually
    consumes (``encoder_v2.py`` reads only ``dropouts[-3:]`` and only in
    the heavy branch).  The paper recipe includes it, so it is honoured
    here: the dropped points are removed from the validity mask before the
    point MLP and the voxel scatter.
    """
    r_rng, b_rng = jax.random.split(rng)
    frac = jax.random.uniform(r_rng) * rate
    keep = jax.random.bernoulli(b_rng, 1.0 - frac, pm.shape)
    return pm & keep


class DenseConv(nn.Module):
    """3x3x3 (or 1x1x1) masked dense conv, sparse-layout weights."""

    out_channels: int
    kernel_size: int = 3
    use_bias: bool = True
    compute_dtype: Optional[jnp.dtype] = None
    packed: bool = False
    mask_input: bool = False   # mask x inside the conv (packed: rides the
    #                            shifted-input build — no extra HBM pass)
    mask_output: bool = True   # False: caller guarantees empties unread
    use_pallas: bool = False   # packed 3^3 only: block-sparse fused kernel
    #                            (inference path; applies mask_input itself)

    @nn.compact
    def __call__(self, x, mask, params_only=False):
        k = self.kernel_size**3
        in_ch = x.shape[-1] // 2 if self.packed else x.shape[-1]
        w = self.param("kernel", _conv_init, (k, in_ch, self.out_channels))
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        if params_only:   # fused-chain path drives the kernel itself
            return w, b
        # Contract: without ``mask_input`` inputs are already masked by
        # their producer; the output mask stops bias leakage at empty cells
        # (skippable when every consumer ignores empties).
        cd = self.compute_dtype or x.dtype
        if self.kernel_size == 1:
            wk = w[0].astype(cd)
            if self.packed:
                wk = blockdiag2_weight(wk)
            out = jnp.dot(
                x.astype(cd).reshape(-1, x.shape[-1]), wk
            ).reshape(*x.shape[:-1], -1)
            if b is not None:
                bb = jnp.concatenate([b, b]) if self.packed else b
                out = out + bb.astype(out.dtype)
            out = out.astype(x.dtype)
        elif self.packed and self.use_pallas and x.shape[0] % 8 == 0:
            # Block-sparse fused kernel: skips empty (8, 16) xy tiles and
            # fuses input masking + the shifted-input build + bias.  The
            # custom-VJP wrapper makes it differentiable (backward data
            # pass = the same kernel with flipped taps), so training and
            # remat re-forwards run it too.
            from pasco_tpu.ops.pallas_conv import packed_conv_trainable

            b_arr = (
                b if b is not None
                else jnp.zeros((self.out_channels,), w.dtype)
            )
            out = packed_conv_trainable(x, w, b_arr, mask, b is not None, cd)
        elif self.packed:
            out = conv3_packed_z2(
                x, w, b, compute_dtype=cd,
                mask=mask if self.mask_input else None,
            )
        else:
            if self.mask_input:
                x = _mask_mul(x, mask)
            out = conv3_dense(
                x, w, b, compute_dtype=self.compute_dtype, axis_order=ORDER
            )
        if not self.mask_output:
            return out
        return _mm(out, mask, self.packed)


class DenseResBlock(nn.Module):
    """Pre-act residual block (mirrors ``blocks.ResidualBlock``)."""

    out_channels: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None
    packed: bool = False
    pallas: bool = False
    mask_output: bool = True   # False (lean only): every consumer of this
    #                            block masks internally — skip the output
    #                            pass too (stage-interior blocks, and all
    #                            decoder blocks: heads/extraction re-mask)
    fused_plan: Optional[Tuple[int, int, bool, bool]] = None
    #                            conv_plan tuple for the fused path; a
    #                            static attribute (NOT part of fused_ctx)
    #                            so nn.remat never traces it

    @nn.compact
    def __call__(self, x, mask, train, fused_ctx=None):
        if fused_ctx is not None:
            return self._fused(x, mask, train, fused_ctx)
        # Packed stages defer ALL masking to the single block-output pass:
        # 3^3 conv inputs are masked inside the packed conv's shifted-input
        # build (free), BN stats mask internally, and pointwise ops can't
        # mix cells — so interior _mm passes are redundant HBM traffic.
        # The block also tolerates unmasked *input* in this mode.
        lean = self.packed
        in_ch = x.shape[-1] // 2 if self.packed else x.shape[-1]
        if in_ch == self.out_channels:
            skip = x
        else:
            skip = DenseConv(
                self.out_channels, 1, compute_dtype=self.compute_dtype,
                packed=self.packed, mask_output=not lean, name="downsample",
            )(x, mask)
        f = DenseBN(
            self.axis_name, packed=self.packed, mask_output=not lean,
            name="bn1",
        )(x, mask, train)
        f = nn.relu(f)
        f = DenseConv(
            self.out_channels, 3, compute_dtype=self.compute_dtype,
            packed=self.packed, mask_input=lean, mask_output=not lean,
            use_pallas=self.pallas, name="conv1",
        )(f, mask)
        f = DenseBN(
            self.axis_name, packed=self.packed, mask_output=not lean,
            name="bn2",
        )(f, mask, train)
        f = nn.relu(f)
        f = DenseConv(
            self.out_channels, 3, compute_dtype=self.compute_dtype,
            packed=self.packed, mask_input=lean, mask_output=not lean,
            use_pallas=self.pallas, name="conv2",
        )(f, mask)
        out = nn.relu(skip + f)
        if lean and not self.mask_output:
            return out
        return _mm(out, mask, self.packed)

    def _fused(self, xpad, mask, train, fused_ctx):
        """Inference fused-chain: both convs run as single Pallas kernels
        with the BN affine + relu + mask as prologue and the residual
        add + relu as conv2's epilogue; ``xpad`` and the return value are
        zero-padded stage buffers (see ops/pallas_conv.py), so the chain
        has no interleaving XLA passes at all."""
        from pasco_tpu.ops.pallas_conv import fused_packed_conv

        m8, ids, n_act = fused_ctx
        plan = self.fused_plan
        cd = self.compute_dtype
        # Chain buffers may be lane-folded (ops/pallas_conv.py:lane_fold),
        # so BN/conv parameter shapes are inferred from a logical-lane
        # shape token, not from the buffer itself.
        tok = jnp.zeros((1, 1, 1, 2 * self.out_channels), xpad.dtype)
        a1, c1 = DenseBN(self.axis_name, packed=True, name="bn1")(
            tok, mask, train, affine_only=True
        )
        w1, b1 = DenseConv(
            self.out_channels, 3, compute_dtype=cd, packed=True, name="conv1"
        )(tok, mask, params_only=True)
        f = fused_packed_conv(
            xpad, w1, m8, ids, n_act, affine=(a1, c1), relu=True, bias=b1,
            out_padded=True, compute_dtype=cd, plan=plan,
        )
        a2, c2 = DenseBN(self.axis_name, packed=True, name="bn2")(
            tok, mask, train, affine_only=True
        )
        w2, b2 = DenseConv(
            self.out_channels, 3, compute_dtype=cd, packed=True, name="conv2"
        )(tok, mask, params_only=True)
        return fused_packed_conv(
            f, w2, m8, ids, n_act, affine=(a2, c2), relu=True, bias=b2,
            skip=xpad, out_padded=True, compute_dtype=cd, plan=plan,
        )


class DenseDown(nn.Module):
    """ks=2/s=2 down conv + BN + LeakyReLU (+ extra BN/ReLU quirk)."""

    out_channels: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None
    in_packed: bool = False
    out_packed: bool = False

    @nn.compact
    def __call__(self, x, mask, train, params_only=False):
        in_ch = x.shape[-1] // 2 if self.in_packed else x.shape[-1]
        w = self.param("kernel", _conv_init, (8, in_ch, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if params_only:
            # Fused down-kernel driver path (ops/pallas_down.py): weights
            # plus both inference BN affines; ``x`` is a channel-count
            # token.
            tok = jnp.zeros((1, 1, 1, 2 * self.out_channels), x.dtype)
            a1, c1 = DenseBN(
                self.axis_name, packed=self.out_packed, name="bn1"
            )(tok, mask, train, affine_only=True)
            a2, c2 = DenseBN(
                self.axis_name, packed=self.out_packed, name="bn2"
            )(tok, mask, train, affine_only=True)
            return w, b, (a1, c1), (a2, c2)
        if self.in_packed and self.out_packed:
            out = down2_packed_to_packed(x, w, b, self.compute_dtype)
        elif self.in_packed:
            out = down2_packed_to_plain(x, w, b, self.compute_dtype)
        else:
            out = down2_dense(x, w, b, self.compute_dtype, axis_order=ORDER)
        new_mask = maxpool2_mask(mask)
        # Interior masking deferred to the single output pass (BN stats
        # mask internally; leaky-relu is pointwise).
        f = DenseBN(
            self.axis_name, packed=self.out_packed, mask_output=False,
            name="bn1",
        )(out, new_mask, train)
        f = nn.leaky_relu(f, 0.01)
        f = DenseBN(
            self.axis_name, packed=self.out_packed, mask_output=False,
            name="bn2",
        )(f, new_mask, train)
        f = nn.relu(f)
        return _mm(f, new_mask, self.out_packed), new_mask


class DenseEncStage(nn.Module):
    """One encoder stage (optional down conv + residual stack).  With
    ``remat`` each residual block recomputes in backward, so the stored
    state per stage is one boundary tensor per block."""

    out_channels: int
    down: bool
    n_res: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = True
    in_packed: bool = False
    out_packed: bool = False
    pallas: bool = False

    @nn.compact
    def __call__(self, x, mask, train, prev_ctx=None):
        """``prev_ctx``: the PREVIOUS fused stage's (padded chain buffer,
        int8 stage mask) — lets the down step run as a Pallas kernel from
        padded to padded (ops/pallas_down.py) with zero XLA passes between
        the two chains.  Returns (x, mask, xpad, m8); xpad/m8 are None off
        the fused path."""
        from pasco_tpu.ops.pallas_conv import lane_fold

        ch = self.out_channels
        Block = (
            nn.remat(DenseResBlock, static_argnums=(3,))
            if self.remat
            else DenseResBlock
        )
        X1 = x.shape[0] // 2 if self.down else x.shape[0]
        T1 = x.shape[1] // 2 if self.down else x.shape[1]
        fused = (
            self.pallas and self.out_packed and not train and self.n_res > 0
            and X1 % 8 == 0
            and lane_fold(2 * ch, 2 * ch, T1) == 1
        )
        fused_down = (
            self.down and fused and self.in_packed and prev_ctx is not None
            and prev_ctx[0] is not None
            # the producer's padded buffer must be unfolded (the down
            # kernel reads the plain z-pair layout)
            and lane_fold(x.shape[-1], x.shape[-1], x.shape[1]) == 1
        )
        xpad = None
        # The stage plan (and therefore the padded buffers' y rounding) is
        # computed BEFORE the fused down step so the down kernel can write
        # its output directly in the chain's rounded layout.
        plan = None
        if fused:
            from pasco_tpu.ops.pallas_conv import conv_plan

            Yp1 = x.shape[2] // 2 if self.down else x.shape[2]
            plan = conv_plan(
                2 * ch, 2 * ch, T1 + 2, fused=True, X=X1, Y=Yp1
            )
        if fused_down:
            from pasco_tpu.ops.dense_ops import maxpool2_mask
            from pasco_tpu.ops.pallas_down import down_padded_to_padded

            new_mask = maxpool2_mask(mask)
            wdn, bdn, a1, a2 = DenseDown(
                ch, self.axis_name, self.compute_dtype,
                in_packed=True, out_packed=True, name="down",
            )(x, new_mask, train, params_only=True)
            xpad = down_padded_to_padded(
                prev_ctx[0], prev_ctx[1], jnp.any(new_mask, axis=1),
                wdn, bdn, a1, a2, y_out=x.shape[2] // 2,
                y_round=plan[1],
                compute_dtype=self.compute_dtype or x.dtype,
            )
            mask = new_mask
        elif self.down:
            x, mask = DenseDown(
                ch, self.axis_name, self.compute_dtype,
                in_packed=self.in_packed, out_packed=self.out_packed,
                name="down",
            )(x, mask, train)
        # Re-derive the chain gate on the post-down tensor when the Pallas
        # down was unavailable (channel mismatch etc. show up here).
        if not fused_down:
            fused = (
                fused and x.shape[0] % 8 == 0 and x.shape[-1] // 2 == ch
            )
        if fused:
            from pasco_tpu.ops.pallas_conv import (
                active_tiles, pad_stage, stage_mask8, unpad_stage)

            Y1 = x.shape[2] // 2 if fused_down else x.shape[2]
            m8 = stage_mask8(mask, 2 * ch, yt=plan[1])
            ctx = (
                m8,
                *active_tiles(mask, plan[0], plan[1], plan[2], plan[5]),
            )
            if xpad is None:
                xpad = pad_stage(x, yt=plan[1])
            for i in range(self.n_res):
                xpad = Block(
                    ch, self.axis_name, self.compute_dtype,
                    packed=True, pallas=True, fused_plan=plan,
                    name=f"res{i}",
                )(xpad, mask, train, ctx)
            # stage-final mask: consumers outside the kernels (XLA down
            # convs, dec preamble skip adds) read every cell, so empties
            # must be exact zeros.
            return (
                _mm(unpad_stage(xpad, y=Y1, c2=2 * ch), mask, True),
                mask,
                xpad,
                m8,
            )
        for i in range(self.n_res):
            # Only the stage-final block masks its output: the stage feeds
            # an XLA down conv (a strided matmul that reads every cell);
            # interior consumers all mask internally.
            x = Block(
                ch, self.axis_name, self.compute_dtype,
                packed=self.out_packed, pallas=self.pallas,
                mask_output=(i == self.n_res - 1), name=f"res{i}",
            )(x, mask, train)
        return x, mask, None, None


class DenseDecoderStage(nn.Module):
    """One generative decoder stage: deconv -> bbox mask -> coord concat ->
    resize -> +skip -> residual stack -> per-subnet heads.  Rematted as a
    unit; returns (features, sem logits bf16, stage mask)."""

    out_channels: int
    n_infers: int
    n_classes: int
    n_res: int
    scale: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = True
    in_packed: bool = False
    out_packed: bool = False
    pallas: bool = False
    dropout: float = 0.0       # spatial dropout after the res stack
    #                            (reference decoder_v3.py:116, heavy branch)

    @nn.compact
    def __call__(self, x, parent_keep, skip, skip_mask, box, gmin, gmax,
                 train, drop_on=False):
        cd = self.compute_dtype
        ch = self.out_channels
        pk = self.out_packed
        Block = (
            nn.remat(DenseResBlock, static_argnums=(3,))
            if self.remat
            else DenseResBlock
        )
        in_ch = x.shape[-1] // 2 if self.in_packed else x.shape[-1]
        wd = self.param("up_kernel", _conv_init, (8, in_ch, ch))
        bd = self.param("up_bias", nn.initializers.zeros, (ch,))
        # Fully-fused up preamble (ops/pallas_deconv.py): deconv, up_bn
        # affine, leaky, coords concat, resize 1x1, skip add run per tile
        # and write the padded chain input directly — the XLA form cost
        # ~6 full-volume passes (~10 ms/scan at dec_s1).
        from pasco_tpu.ops.pallas_conv import lane_fold

        fused_up = (
            self.pallas and pk and self.in_packed and not train
            and self.n_res > 0
            and (2 * x.shape[0]) % 8 == 0
            and (2 * x.shape[2]) % 32 == 0
            # the kernel emits the UNFOLDED padded layout; narrow stages
            # whose chain buffers lane-fold keep the XLA preamble
            and lane_fold(2 * ch, 2 * ch, 2 * x.shape[1]) == 1
        )
        xm = _mm(x, parent_keep, self.in_packed)
        # Stage domain is the UNION of generated children (pruned to the
        # global bbox) and the encoder skip's coordinate set: ME's
        # ``dec + shortcut`` adds features on the union coordinate map
        # (decoder_v3.py:163 — a skip cell whose parents were all pruned
        # still enters ``process`` carrying the shortcut features alone).
        msk_child = upsample2_mask(parent_keep) & bbox_mask(
            box, self.scale, gmin, gmax, ORDER
        )
        msk_early = msk_child | skip_mask
        if fused_up:
            from pasco_tpu.ops.pallas_conv import (
                active_tiles, conv_plan, stage_mask8, unpad_stage)
            from pasco_tpu.ops.pallas_deconv import up_preamble_padded

            msk = msk_early
            X1, T1, Y1 = 2 * x.shape[0], 2 * x.shape[1], 2 * x.shape[2]
            plan = conv_plan(2 * ch, 2 * ch, T1 + 2, fused=True, X=X1, Y=Y1)
            tok1 = jnp.zeros((1, 1, 1, 2 * ch), xm.dtype)
            a1, c1 = DenseBN(
                self.axis_name, packed=True, name="up_bn"
            )(tok1, msk, train, affine_only=True)
            tok2 = jnp.zeros((1, 1, 1, 2 * (ch + 3)), xm.dtype)
            a2, c2 = DenseBN(
                self.axis_name, packed=True, name="resize_bn"
            )(tok2, msk, train, affine_only=True)
            wr, br = DenseConv(
                ch, 1, compute_dtype=cd, packed=True, name="resize"
            )(tok2, msk, params_only=True)
            xpad = up_preamble_padded(
                xm, skip, jnp.any(msk, axis=1), box.minimum, self.scale,
                wd, bd, (a1, c1), (a2, c2), wr[0], br,
                child_m8=stage_mask8(msk_child, 2 * ch, yt=plan[1]),
                y_round=plan[1],
                compute_dtype=cd or xm.dtype,
            )
            ctx = (
                stage_mask8(msk, 2 * ch, yt=plan[1]),
                *active_tiles(msk, plan[0], plan[1], plan[2], plan[5]),
            )
            for ri in range(self.n_res):
                xpad = Block(
                    ch, self.axis_name, cd, packed=True, pallas=True,
                    fused_plan=plan, name=f"res{ri}",
                )(xpad, msk, train, ctx)
            # Decoder output needs no mask (heads/extraction re-mask).
            x = unpad_stage(xpad, y=Y1, c2=2 * ch)
            return self._finish(x, msk, pk, cd, drop_on, train, xpad)
        if self.in_packed and pk:
            x = deconv2_packed_to_packed(xm, wd, bd, cd)
        elif pk:
            x = deconv2_plain_to_packed(xm, wd, bd, cd)
        else:
            x = deconv2_dense(xm, wd, bd, cd, axis_order=ORDER)
        msk = msk_early
        # Packed ("lean") stages defer masking entirely to the residual
        # blocks' output passes: between here and res0 only BN (stats mask
        # internally) and pointwise ops touch x, and res0's convs mask
        # their inputs internally — values at empty cells are never read.
        lean = pk
        # The deconv/BN/coords/resize side exists only at CHILD cells (ME:
        # ``dec`` rows before the union add); BN statistics run over the
        # child set like the reference's, and the dec contribution is
        # zeroed outside it so skip-only union cells carry the shortcut
        # features alone.
        f = DenseBN(
            self.axis_name, packed=pk, mask_output=not lean, name="up_bn"
        )(x, msk_child, train)
        x = nn.leaky_relu(f, 0.01)
        if not lean:
            x = _mm(x, msk_child, pk)

        if pk:
            # Split resize: features stay on the tile-aligned [.., 2ch]
            # buffer, coords fold to closed-form broadcast terms — the
            # 2(ch+3)-lane concat lane-pads ~2x in HBM (see
            # DenseBNResizeCoords).  Identical math, identical param tree.
            tok2 = jnp.zeros((1, 1, 1, 2 * (ch + 3)), x.dtype)
            wr, br = DenseConv(
                ch, 1, compute_dtype=cd, packed=True, name="resize"
            )(tok2, msk_child, params_only=True)
            x = DenseBNResizeCoords(self.axis_name, name="resize_bn")(
                x, msk_child, box, self.scale, wr[0], br, train,
                compute_dtype=cd,
            )
        else:
            norm_c = (
                cell_coords(box, self.scale, ORDER).astype(jnp.float32)
                / self.scale
            ).astype(x.dtype)
            xc = jnp.concatenate([x, _mm(norm_c, msk_child, False)], axis=-1)
            xc = DenseBN(
                self.axis_name, packed=pk, mask_output=not lean,
                name="resize_bn",
            )(xc, msk_child, train)
            x = DenseConv(
                ch, 1, compute_dtype=cd, packed=pk, mask_output=not lean,
                name="resize",
            )(xc, msk_child)
        # Union add: dec side zeroed outside the child set; skip is masked
        # by its producer.  At msk-invalid cells the sum is garbage the
        # lean res blocks never read.
        sk = skip.astype(x.dtype)
        x = _mm(x, msk_child, pk) + (sk if lean else _mm(sk, skip_mask, pk))

        fused = (
            self.pallas and pk and not train and self.n_res > 0
            and x.shape[0] % 8 == 0
            and x.shape[-1] // 2 == ch
        )
        if fused:
            from pasco_tpu.ops.pallas_conv import (
                active_tiles, conv_plan, pad_stage, stage_mask8,
                unpad_stage)

            plan = conv_plan(
                x.shape[-1], x.shape[-1], x.shape[1] + 2, fused=True,
                X=x.shape[0], Y=x.shape[2],
            )
            ctx = (
                stage_mask8(msk, x.shape[-1], yt=plan[1]),
                *active_tiles(msk, plan[0], plan[1], plan[2], plan[5]),
            )
            xpad = pad_stage(x, yt=plan[1])
            for ri in range(self.n_res):
                xpad = Block(
                    ch, self.axis_name, cd, packed=True, pallas=True,
                    fused_plan=plan, name=f"res{ri}",
                )(xpad, msk, train, ctx)
            # Decoder output needs no mask (heads/extraction re-mask).
            x = unpad_stage(xpad, y=x.shape[2], c2=x.shape[-1])
            return self._finish(x, msk, pk, cd, drop_on, train, xpad)
        for ri in range(self.n_res):
            # Decoder blocks never need the output mask in lean mode:
            # the heads/extraction re-mask and the next stage's deconv
            # input is masked explicitly.
            x = Block(
                ch, self.axis_name, cd, packed=pk, pallas=self.pallas,
                mask_output=False, name=f"res{ri}",
            )(x, msk, train)
        return self._finish(x, msk, pk, cd, drop_on, train, None)

    def _finish(self, x, msk, pk, cd, drop_on, train, xpad=None):
        """Dropout + per-subnet sem heads (shared by both preamble paths).

        Returns (x, sem, top_class, top_prob, msk, xpad) — ``xpad`` is the
        fused chain's padded output buffer (None off the fused path), which
        the panop refiner reuses to skip re-padding the volume."""
        ch = self.out_channels
        if self.dropout > 0.0:
            x = DenseSpatialDropout(
                self.dropout, packed=pk, name="drop"
            )(x, deterministic=not drop_on)
            if drop_on:
                # xpad holds PRE-dropout values; MC-dropout consumers must
                # re-pad the dropped features instead.
                xpad = None

        wh = self.param(
            "head_kernel",
            nn.initializers.lecun_normal(),
            (self.n_infers, ch, self.n_classes),
        )
        bh = self.param(
            "head_bias", nn.initializers.zeros, (self.n_infers, self.n_classes)
        )
        S, K = self.n_infers, self.n_classes
        # bf16 operands + f32 accumulation: avoids materialising an f32
        # copy of the full-scale feature volume just for the head einsum.
        whx = wh.astype(x.dtype)

        def reduce_sem(sem_bf16):
            """(argmax class, its softmax prob) over the class axis.

            Reads the bf16 logits directly (max/argmax are order-preserving
            under the bf16->f32 convert, so indices and ties match the old
            f32-materialising form exactly) and accumulates the softmax
            denominator in f32 per element:  exp(max - logsumexp) ==
            1 / sum(exp(sem - max)).  The previous form materialised an f32
            copy of the full-scale sem volume (~590 MB at dec_s1, profiled
            2.25 ms/scan) because three reduction consumers defeated XLA's
            convert fusion."""
            mx = jnp.max(sem_bf16, axis=-1)
            tc = jnp.argmax(sem_bf16, axis=-1).astype(jnp.int32)
            se = jnp.sum(
                jnp.exp((sem_bf16 - mx[..., None]).astype(jnp.float32)),
                axis=-1,
            )
            return tc, (1.0 / se).astype(jnp.bfloat16)

        if pk:
            # ONE block-diagonal head dot producing sem directly in the
            # packed layout [X, T, Y, S*K | S*K] (lo | hi slot halves) and
            # in bf16.  The previous form — two f32 einsums with K=20
            # lanes (padded 6.4x to the 128-lane tile) plus an interleave
            # stack/reshape — cost ~13 ms/scale in relayout HBM traffic;
            # the packed sem also rides the feature gather in extraction
            # (extract_sparse_z2 extra_packed) instead of its own per-row
            # gather.
            w_flat = whx.transpose(1, 0, 2).reshape(ch, S * K)   # [ch, SK]
            wbd = blockdiag2_weight(w_flat)                      # [2ch, 2SK]
            b2 = jnp.tile(bh.reshape(-1), 2).astype(jnp.float32)
            X_, T_, Y_ = x.shape[0], x.shape[1], x.shape[2]
            sem = (
                (
                    jnp.einsum(
                        "xtyc,cd->xtyd", x, wbd,
                        preferred_element_type=jnp.float32,
                    )
                    + b2[None, None, None]
                ).astype(jnp.bfloat16)
            )                                                    # [X,T,Y,2SK]
            sem_v = sem.reshape(X_, T_, Y_, 2, S, K)
            tc, tp = reduce_sem(sem_v)                           # [X,T,Y,2,S]
            top_class = tc.transpose(0, 1, 3, 2, 4).reshape(
                X_, 2 * T_, Y_, S
            )
            top_prob = tp.transpose(0, 1, 3, 2, 4).reshape(
                X_, 2 * T_, Y_, S
            )
            sem = _mm(sem, msk, True)
            top_class = jnp.where(msk[..., None], top_class, 0)
            top_prob = jnp.where(msk[..., None], top_prob, 0)
        else:
            sem = (
                (
                    jnp.einsum(
                        "xyzc,sck->xyzsk", x, whx,
                        preferred_element_type=jnp.float32,
                    )
                    + bh[None, None, None]
                )
                .astype(jnp.bfloat16)
            )
            # Reduce from the bf16-ROUNDED logits (matching the packed
            # path, whose sem is stored bf16): keeps argmax tie-breaks —
            # and therefore the extraction sets — identical across the
            # packed/unpacked formulations.
            top_class, top_prob = reduce_sem(sem)
            sem = jnp.where(msk[..., None, None], sem, 0)
            top_class = jnp.where(msk[..., None], top_class, 0)
            top_prob = jnp.where(msk[..., None], top_prob, 0)
        return x, sem, top_class, top_prob, msk, xpad


class DenseVoxelFeatsRefiner(nn.Module):
    """Per-subnet two-conv refiner (reference ``decoder_v3.py:266-283``)
    in the dense-with-masks formulation.

    The reference applies a submanifold conv pair to the per-subnet
    *pruned* sparse tensor; masking the shared dense features to the
    subnet's keep set before/after each conv is numerically identical.
    Replaces the gather-based sparse refiner, which profiling showed
    running at 5-100 GB/s of random row fetches (~137 ms/scan) versus
    the near-roofline dense convs.  Parameter tree (conv1/bn/conv2)
    matches :class:`pasco_tpu.models.decoder.VoxelFeatsRefiner` and the
    checkpoint converter.
    """

    channels: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None
    packed: bool = False
    pallas: bool = False

    @nn.compact
    def __call__(self, x, keep, train, params_only=False):
        if params_only:
            # Fused-chain driver path: hand back this subnet's parameters
            # (conv taps + inference BN affine) so the caller can run the
            # per-subnet fused Pallas chain OUTSIDE nn.vmap — the
            # scalar-prefetch kernels do not vmap, which round 1 worked
            # around by restricting the fused refiner to S == 1.
            w1, _ = DenseConv(
                self.channels, 3, use_bias=False,
                compute_dtype=self.compute_dtype, packed=True, name="conv1",
            )(x, keep, params_only=True)
            a, c = DenseBN(self.axis_name, packed=True, name="bn")(
                x, keep, train, affine_only=True
            )
            w2, b2 = DenseConv(
                self.channels, 3, compute_dtype=self.compute_dtype,
                packed=True, name="conv2",
            )(x, keep, params_only=True)
            return w1, a, c, w2, b2
        # Packed: both convs mask their inputs inside the shifted build and
        # the output feeds extraction only (a gather of kept cells), so no
        # standalone mask passes are needed.
        lean = self.packed
        xin = x if lean else _mm(x, keep, self.packed)
        g = DenseConv(
            self.channels, 3, use_bias=False, compute_dtype=self.compute_dtype,
            packed=self.packed, mask_input=lean, mask_output=not lean,
            use_pallas=self.pallas, name="conv1",
        )(xin, keep)
        f = DenseBN(
            self.axis_name, packed=self.packed, mask_output=not lean,
            name="bn",
        )(g, keep, train)
        g = nn.relu(f)  # DenseBN zeroes masked cells; relu keeps them zero
        return DenseConv(
            self.channels, 3, compute_dtype=self.compute_dtype,
            packed=self.packed, mask_input=lean, mask_output=not lean,
            use_pallas=self.pallas, name="conv2",
        )(g, keep)


def fused_refine_one(x, keep, w1, aff, w2, b2, cd, xpad=None):
    """One subnet's refiner as a fused Pallas chain: conv1 with a
    mask-only prologue, the BN affine + relu as conv2's prologue,
    keep-based active tiles (keep is the subnet's pruned set — sparser
    than the stage mask).  ``xpad``: the decoder chain's padded output
    buffer when available — skips re-padding the volume the chain just
    unpadded (garbage at non-kept cells is masked by the prologue)."""
    from pasco_tpu.ops.pallas_conv import (
        active_tiles, conv_plan, fused_packed_conv, pad_stage,
        stage_mask8)

    plan = conv_plan(
        x.shape[-1], x.shape[-1], x.shape[1] + 2, fused=True,
        X=x.shape[0], Y=x.shape[2],
    )
    m8 = stage_mask8(keep, x.shape[-1], yt=plan[1])
    ids, n_act = active_tiles(keep, plan[0], plan[1], plan[2], plan[5])
    if xpad is None:
        xpad = pad_stage(x, yt=plan[1])
    g = fused_packed_conv(
        xpad, w1, m8, ids, n_act, out_padded=True, compute_dtype=cd,
        plan=plan,
    )
    out = fused_packed_conv(
        g, w2, m8, ids, n_act, affine=aff, relu=True, bias=b2,
        out_padded=False, compute_dtype=cd, plan=plan,
    )
    return out[:, :, : x.shape[2]]   # drop the y tile-rounding pad


class PointMLP(nn.Module):
    """CylinderFeat point MLP (unet3d_sparse_v2.py:22-34), rematted as one
    unit (its f32 activations over 160k points are ~1 GB of residuals)."""

    out_dim: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pf, pm, train):
        bn = lambda name: MaskedBatchNorm(axis_name=self.axis_name, name=name)
        f = bn("bn_in")(pf, pm, train)
        f = nn.Dense(64, name="fc1")(f)
        f = nn.relu(bn("bn1")(f, pm, train))
        f = nn.Dense(128, name="fc2")(f)
        f = nn.relu(bn("bn2")(f, pm, train))
        f = nn.Dense(256, name="fc3")(f)
        f = nn.relu(bn("bn3")(f, pm, train))
        f = nn.Dense(self.out_dim, name="fc4")(f)
        return jnp.where(pm[:, None], f, 0)


class DensePaSCoNet(nn.Module):
    """Dense-mode end-to-end network; same inputs/outputs as PaSCoNet."""

    cfg: PaSCoConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        inp: ModelInput,
        compl_labelweights: Dict[int, jnp.ndarray],
        train: bool = False,
        is_predict_panop: bool = True,
        mc_dropout: bool = False,
    ) -> ModelOutput:
        cfg = self.cfg
        m = cfg.model
        # ``enable_dropout`` equivalent (reference ``torch_util.py:34-40``):
        # with ``mc_dropout`` every dropout layer stays live at inference
        # (BN still uses running stats, caps stay off) for MC sampling.
        drop_on = train or mc_dropout
        cap = cfg.capacity
        S = m.n_infers
        cd = jnp.dtype(m.compute_dtype)
        # Rematerialise the conv stacks: the backward pass would otherwise
        # hold every dense activation (measured 47 GB at full scale vs the
        # chip's 15.75 GB).  Recompute-in-backward trades ~1 extra forward
        # of the wrapped blocks for fitting training on one chip.
        Bottleneck = (
            nn.remat(SPCDense3D, static_argnums=(2,)) if m.remat else SPCDense3D
        )
        box = Box.create(inp.global_min, cfg.scene.box_extent)
        ex, ey, ez = box.extent
        n_cells = ex * ey * ez

        # ---- point MLP (CylinderFeat, unet3d_sparse_v2.py:22-34) --------
        pf, pm = inp.point_feats, inp.point_mask
        if drop_on and m.encoder_dropouts[0] > 0.0:
            pm = point_dropout(
                pm, m.encoder_dropouts[0], self.make_rng("dropout")
            )
        # (Rematting the point MLP measurably worsened XLA's schedule.)
        f = PointMLP(m.f, self.axis_name, name="point_mlp")(pf, pm, train)

        # ---- scatter-max into the per-subnet dense grid + MIMO concat ---
        rel = inp.point_coords[:, 1:] - box.minimum[None, :]
        in_box = (
            pm
            & jnp.all(rel >= 0, -1)
            & (rel[:, 0] < ex) & (rel[:, 1] < ey) & (rel[:, 2] < ez)
        )
        subnet = jnp.clip(inp.point_coords[:, 0], 0, S - 1)
        # FINITE sentinel, far below any real feature (PointMLP outputs are
        # O(10)).  -inf here broke the packed 1x1/head block-diagonal dots:
        # their zero blocks compute 0 * (-inf) = NaN, which poisons the
        # VALID partner slot of every half-occupied z-pair (caught by
        # test_z_pack_model_equivalence).  A finite sentinel keeps the
        # padded-volume contract ("finite garbage at empty cells, consumers
        # select by mask") without the full-volume -inf-replace select the
        # round-4 fix needed (~3.3 ms/scan at the s1 shape).
        neg = jnp.asarray(-1e30, cd)

        # z-pack the stride-1/2 stages ([X, Z, Y, C] -> [X, Z/2, Y, 2C]):
        # fills the 128-lane tile and runs convs as batched 2D pairs —
        # measured ~1.8x per stride-1 conv in context.  Masks stay logical.
        zp = bool(m.z_pack) and ez % 4 == 0
        # Pack every scale whose z extent splits into pairs (s4's native 3D
        # conv measured ~31 TF/s vs 120+ for the packed pair formulation).
        packed_scales = (
            {s for s in (1, 2, 4) if ez % (2 * s) == 0 and (ez // s) % 2 == 0}
            if zp
            else set()
        )
        if zp:
            # Scatter rows land DIRECTLY in the z-pair-packed MIMO layout:
            # row (((x*T + t)*Y + y)*2 + slot)*S + s of a [.., f] table is
            # lane block [slot, s] of packed cell (x, t, y), so the
            # [N, 2*S*f] reshape below is a free bitcast — the old
            # [S, cells, f] -> transpose -> pack_z2 route paid three
            # ~508 MB relayout passes per scan at the s1 shape.
            tz = ez // 2
            cellrow = (rel[:, 0] * tz + rel[:, 2] // 2) * ey + rel[:, 1]
            row = (cellrow * 2 + (rel[:, 2] % 2)) * S + subnet
            n_rows = ex * tz * ey * 2 * S          # == n_cells * S
            flat_idx = jnp.where(in_box, row, n_rows)
            # Sorted conflict-free scatter-max (scatter_max_rows): the
            # naive .at[].max serialises on TPU (profiled 12 ms/scan here).
            grid_f = scatter_max_rows(f.astype(cd), flat_idx, n_rows, neg)
            # A cell is occupied iff any point scattered into it, iff its
            # row rose above the -inf init — spares a second (bool)
            # scatter pass (~14 ms/scan profiled).  Row-max + -inf select
            # fuse over one read of the volume.
            occ = jnp.max(grid_f, axis=-1) > neg
            if train or S > 1:
                # Zero the sentinel rows.  REQUIRED whenever S > 1: a cell
                # occupied by one subnet but empty for another is mask-VALID,
                # and enc_in mixes its subnet lane blocks — empty blocks
                # must be zero like the reference's ``Augmenter.merge``
                # densify (``augmenter.py:17-27``).  At S == 1 row-validity
                # == lane-validity, so inference skips the full-volume
                # select (~3.3 ms/scan): the finite sentinel is garbage the
                # masked-consumer contract already covers (0 * sentinel == 0
                # exactly, unlike the -inf form).  Training keeps it
                # unconditionally so every magnitude stays O(1).
                grid_f = jnp.where(grid_f == neg, jnp.zeros((), cd), grid_f)
            grid_f = grid_f[:-1]
            x = grid_f.reshape(ex, tz, ey, 2 * S * m.f)
            # Occupancy is tiny (i1): unzip the packed row order back to
            # logical [S, X, Z, Y].
            sub_mask = (
                occ[:-1].reshape(ex, tz, ey, 2, S)
                .transpose(4, 0, 1, 3, 2)          # [S, X, T, slot, Y]
                .reshape(S, ex, ez, ey)
            )
        else:
            # Volumes are laid out [X, Z, Y, C] (see ORDER above): cell
            # ids enumerate y fastest.
            cell = (rel[:, 0] * ez + rel[:, 2]) * ey + rel[:, 1]
            flat_idx = jnp.where(in_box, subnet * n_cells + cell, S * n_cells)
            grid_f = scatter_max_rows(f.astype(cd), flat_idx, S * n_cells, neg)
            occ = jnp.max(grid_f, axis=-1) > neg
            if train or S > 1:
                # See the packed branch: S > 1 mixes subnet lane blocks at
                # enc_in, so empty blocks must be exact zeros.
                grid_f = jnp.where(grid_f == neg, jnp.zeros((), cd), grid_f)
            grid_f = grid_f[:-1]
            sub_mask = occ[:-1].reshape(S, ex, ez, ey)
            x = (
                grid_f.reshape(S, n_cells, m.f)
                .transpose(1, 0, 2)
                .reshape(ex, ez, ey, S * m.f)
            )
        mask1 = jnp.any(sub_mask, axis=0)
        # Block-sparse Pallas conv for the packed stages, on a real TPU
        # backend only (tests run the XLA formulation on CPU).  Training
        # uses the custom-VJP wrapper (ops/pallas_conv.py:
        # packed_conv_trainable); the fused *chain* (BN-affine prologue)
        # remains inference-only — its gates below include ``not train``.
        # "force" engages the kernels regardless of backend — used by the
        # whole-pipeline pallas-on/off equivalence test, which runs them
        # on CPU under pltpu.force_tpu_interpret_mode().
        pallas = zp and (
            m.pallas_conv == "force"
            or (m.pallas_conv != "off" and jax.default_backend() == "tpu")
        )

        # ---- encoder ----------------------------------------------------
        fm = m.f_maps
        n_res = (
            m.res_blocks
            if m.res_blocks is not None
            else (0 if m.heavy_decoder else 3)
        )
        # enc_in's output mask is skippable when the packed s1 res blocks
        # (which mask internally) re-mask at their outputs.
        x = DenseConv(
            fm[0], 1, compute_dtype=cd, packed=zp,
            mask_output=not (zp and n_res > 0), name="enc_in",
        )(x, mask1)
        x, _, enc_xpad, enc_m8 = DenseEncStage(
            fm[0], False, n_res, self.axis_name, cd, m.remat,
            in_packed=zp, out_packed=zp, pallas=pallas, name="enc_s1",
        )(x, mask1, train)
        enc = {1: (x, mask1)}
        masks = {1: mask1}
        for si, stride in enumerate((2, 4, 8)):
            x, msk, enc_xpad, enc_m8 = DenseEncStage(
                fm[si + 1], True, n_res, self.axis_name, cd, m.remat,
                in_packed=(stride // 2) in packed_scales,
                out_packed=stride in packed_scales,
                pallas=pallas and stride in packed_scales,
                name=f"enc_s{stride}",
            )(x, masks[stride // 2], train, (enc_xpad, enc_m8))
            # Per-stage spatial dropout (reference encoder_v2.py:157-171;
            # the reference only builds these layers in the heavy branch —
            # here they act in both branches whenever the rate is non-zero,
            # which the released recipe never sets).
            edr = m.encoder_dropouts[-3 + si]
            if edr > 0.0:
                x = DenseSpatialDropout(
                    edr, packed=stride in packed_scales,
                    name=f"enc_drop_s{stride}",
                )(x, deterministic=not drop_on)
                enc_xpad = enc_m8 = None   # padded buffer is pre-dropout
            enc[stride] = (x, msk)
            masks[stride] = msk

        # ---- dense bottleneck at stride 8 (SPCDense3D) ------------------
        # SPCDense3D's anisotropic (kx, ky, kz) kernels expect [X, Y, Z, C];
        # the stride-8 volume is tiny (44x44x4 cells), so transposing in
        # and out costs nothing.
        x8 = enc[8][0].transpose(0, 2, 1, 3)
        xb = Bottleneck(
            axis_name=self.axis_name, compute_dtype=cd, name="bottleneck"
        )(x8[None].astype(jnp.float32), train)[0].astype(cd)
        if m.dense3d_dropout > 0.0:
            # nn.Dropout3d after SPCDense3Dv2 (unet3d_sparse_v2.py:152-154).
            xb = DenseSpatialDropout(m.dense3d_dropout, name="dense3d_drop")(
                xb, deterministic=not drop_on
            )
        xb = xb.transpose(0, 2, 1, 3)
        mask8 = bbox_mask(box, 8, inp.global_min, inp.global_max, ORDER)
        x = _mask_mul(xb, mask8)
        parent_keep = mask8

        # ---- generative decoder -----------------------------------------
        dec_ch = fm[::-1]
        xs: Dict[int, SparseGrid] = {}
        sem_at: Dict[int, jnp.ndarray] = {}
        dense_sem: Dict[int, jnp.ndarray] = {}
        dense_keep: Dict[int, jnp.ndarray] = {}
        dense_feats: Dict[int, jnp.ndarray] = {}
        dense_feats_pad: Dict[int, Optional[jnp.ndarray]] = {}

        dense_top: Dict[int, jnp.ndarray] = {}
        dec_n_res = (
            m.res_blocks
            if m.res_blocks is not None
            else (7 if m.heavy_decoder else 3)
        )
        for i, scale in enumerate((4, 2, 1)):
            ch = dec_ch[i + 1]
            x, sem, top_class, top_prob, msk, x_padbuf = DenseDecoderStage(
                ch, S, m.n_classes, dec_n_res, scale, self.axis_name, cd,
                m.remat,
                in_packed=(scale * 2) in packed_scales,
                out_packed=scale in packed_scales,
                pallas=pallas and scale in packed_scales,
                dropout=m.decoder_dropouts[i],
                name=f"dec_s{scale}",
            )(
                x, parent_keep, enc[scale][0], enc[scale][1], box,
                inp.global_min, inp.global_max, train, drop_on,
            )
            # top_class/top_prob are logical [X, Z, Y, S]; sem stays in the
            # packed slot-concat layout for packed scales.
            keep = jnp.any(top_class != 0, axis=-1) & msk
            if train:
                # Reference train-time voxel cap (decoder_v3.py:347-377):
                # weighted multinomial sampling == Gumbel-top-k on the best
                # subnet's (max prob x class weight); capped keep feeds the
                # next decoder stage and the extractions.
                w = compl_labelweights.get(scale)
                tp = top_prob.astype(jnp.float32)             # [X,Z,Y,S]
                if w is not None:
                    tp = tp * w[top_class]
                score = jnp.max(tp * (top_class != 0), axis=-1)
                keep = cap_keep_gumbel(
                    keep, score, cap.dec_capacity(scale),
                    self.make_rng("sample"),
                )
            dense_sem[scale] = sem
            dense_top[scale] = top_class
            dense_keep[scale] = keep
            dense_feats[scale] = x
            dense_feats_pad[scale] = x_padbuf

            # Aux sem logits at scales 2/4 feed the multiscale completion
            # loss only; at inference only scale 1 is consumed (semantic
            # ensembling) — skip the payload gathers for the others.
            need_extra = train or scale == 1
            # The dec grids' FEATURES have no consumer anywhere (the
            # sem-compl loss reads coords/mask + the sem payload; the
            # panop/transformer path extracts its own refined feats), so
            # the payload gather carries sem only — or nothing at all at
            # inference scales 2/4.
            if scale in packed_scales:
                grid, extra = extract_sparse_z2(
                    x, keep, box, scale, cap.dec_capacity(scale),
                    extra=sem if need_extra else None, extra_packed=True,
                    gather_feats=False,
                    stream=pallas and not train,
                )
            else:
                grid, extra = extract_sparse(
                    x, keep, box, scale, cap.dec_capacity(scale),
                    extra=(
                        sem.reshape(*sem.shape[:3], S * m.n_classes)
                        if need_extra
                        else None
                    ),
                    axis_order=ORDER,
                    gather_feats=False,
                )
            xs[scale] = grid
            sem_at[scale] = (
                extra.astype(jnp.float32).reshape(
                    cap.dec_capacity(scale), S, m.n_classes
                )
                if extra is not None
                else jnp.zeros(
                    (cap.dec_capacity(scale), S, m.n_classes), jnp.float32
                )
            )
            parent_keep = keep

        # ---- panop: per-subnet dense refiners + extraction --------------
        panop_grids: Dict[int, SparseGrid] = {}
        sem_pruned = jnp.zeros((S, cap.panop_s1, m.n_classes), jnp.float32)
        if is_predict_panop:
            for scale in (4, 2, 1):
                sem = dense_sem[scale]
                top_class = dense_top[scale]
                xdense = dense_feats[scale]
                pcap = cap.panop_capacity(scale)
                keep_stack = jnp.stack(
                    [
                        (top_class[..., s] != 0)
                        & bbox_mask(
                            box, scale, inp.subnet_min[s], inp.subnet_max[s],
                            ORDER,
                        )
                        & dense_keep[scale]
                        for s in range(S)
                    ]
                )                                             # [S, X, Z, Y]
                RefBase = (
                    nn.remat(DenseVoxelFeatsRefiner, static_argnums=(3, 4))
                    if m.remat
                    else DenseVoxelFeatsRefiner
                )
                pscale = scale in packed_scales
                ch_s = (
                    xdense.shape[-1] // 2 if pscale else xdense.shape[-1]
                )
                # The scalar-prefetch Pallas kernels do not vmap, so the
                # vmapped module always runs the XLA formulation; the fused
                # inference path instead pulls the stacked per-subnet
                # params out and drives one fused chain per subnet below.
                fused_ref = (
                    pallas and pscale and not train
                    and xdense.shape[0] % 8 == 0
                )
                ref_mod = nn.vmap(
                    RefBase,
                    in_axes=(None, 0, None, None),
                    out_axes=0,
                    variable_axes={"params": 0, "batch_stats": 0},
                    split_rngs={"params": True, "dropout": True},
                )(
                    channels=ch_s,
                    axis_name=self.axis_name,
                    compute_dtype=cd,
                    packed=pscale,
                    pallas=False,
                    name=f"voxel_feats_s{scale}",
                )
                if fused_ref:
                    w1s, a_s, c_s, w2s, b2s = ref_mod(
                        xdense, keep_stack, train, True
                    )
                    refined = jnp.stack(
                        [
                            fused_refine_one(
                                xdense, keep_stack[s], w1s[s],
                                (a_s[s], c_s[s]), w2s[s], b2s[s], cd,
                                xpad=dense_feats_pad.get(scale),
                            )
                            for s in range(S)
                        ]
                    )                                         # [S, X, Z, Y, C]
                else:
                    refined = ref_mod(xdense, keep_stack, train, False)
                K = m.n_classes
                # Pruned per-subnet sem logits feed the criterion's
                # semantic-inference aux loss only — inference reads the
                # transformer outputs + the scale-1 completion logits, so
                # the extra gathers are train-only.
                need_extra = train and scale == 1
                sub_grids, sub_sems = [], []
                for s in range(S):
                    if pscale:
                        # per-subnet packed sem slice [X, T, Y, K | K]
                        sem_s = None
                        if need_extra and S == 1:
                            sem_s = sem
                        elif need_extra:
                            sem_s = jnp.concatenate(
                                [
                                    sem[..., s * K : (s + 1) * K],
                                    sem[..., S * K + s * K : S * K + (s + 1) * K],
                                ],
                                axis=-1,
                            )
                        g, e = extract_sparse_z2(
                            refined[s], keep_stack[s], box, scale, pcap,
                            extra=sem_s, extra_packed=True,
                            stream=pallas and not train,
                        )
                    else:
                        g, e = extract_sparse(
                            refined[s], keep_stack[s], box, scale, pcap,
                            extra=sem[..., s, :] if need_extra else None,
                            axis_order=ORDER,
                        )
                    g = g.replace(coords=g.coords.at[:, 0].set(s))
                    sub_grids.append(g)
                    if e is not None:
                        sub_sems.append(e.astype(jnp.float32))
                panop_grids[scale] = jax.tree_util.tree_map(
                    lambda *a: jnp.stack(a), *sub_grids
                )
                if scale == 1 and sub_sems:
                    sem_pruned = jnp.stack(sub_sems)

        predictor = None
        if is_predict_panop:
            predictor = TransformerPredictor(
                cfg=m.transformer,
                n_classes=m.n_classes,
                n_infers=S,
                in_channels=(m.f * 4, m.f * 2, m.f),
                name="transformer",
            )(panop_grids, box, train, mc_dropout=mc_dropout)

        return ModelOutput(
            sem_grids=xs,
            sem_logits=sem_at,
            panop_grids=panop_grids,
            sem_logits_pruned=sem_pruned,
            predictor=predictor,
        )
