"""Generative sparse decoder with per-scale occupancy capping.

TPU-native re-design of ``DecoderGenerativeSepConvV2`` (reference
``pasco/models/decoder_v3.py:77-511``).  Three decoder blocks take the
stride-8 dense-bottleneck output back to full resolution; at each scale a
bank of ``n_infers`` semantic completion heads decides which voxels stay
occupied, with hard caps that the reference enforces by ``torch.topk`` /
``torch.multinomial`` (``decoder_v3.py:319-394``) and we enforce with the
same quantities as *static capacities* (top-k / Gumbel-top-k compaction).

Key TPU-first differences from the reference:
* Coordinate bookkeeping is explicit: every stage is a padded
  :class:`SparseGrid`; pruning = masking + (optional) top-k compaction.
* The training-time ``torch.multinomial(occ_prob, k)`` weighted sample
  without replacement is realised as Gumbel-top-k over ``log(occ_prob)`` —
  the standard equivalence — so it stays inside ``jit``.
* U-Net skips are feature lookups at the generated coordinates, plus an
  explicit append of the skip cells the generation pruned away — together
  exactly MinkowskiEngine's coordinate-manager union-add
  (``decoder_v3.py:163``): a scan-occupied cell whose parents were all
  pruned still enters the residual stack carrying the shortcut features.
* The per-subnet mask/refine path (``predict_panop``,
  ``decoder_v3.py:396-451``) produces a batched per-subnet grid (leading
  subnet axis) processed by one lifted-vmap module with per-subnet weights,
  replacing the reference's ``nn.ModuleDict`` of per-subnet clones.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pasco_tpu.core.config import CapacityConfig, ModelConfig
from pasco_tpu.core.sparse import (
    Box,
    SparseGrid,
    build_dense_table,
    compact,
    lookup_dense_table,
    prune_outside_box,
    top_k_compact,
)
from pasco_tpu.models.blocks import (
    ResidualBlock,
    SparseConv,
    SparseGenerativeDeconv,
    SpatialDropout,
)
from pasco_tpu.models.norm import MaskedBatchNorm
from pasco_tpu.ops.sparse_conv import Rulebook, build_rulebook, lookup_features


def union_skip(g: SparseGrid, skip: SparseGrid, box: Box) -> SparseGrid:
    """Append ``skip`` cells absent from ``g`` into ``g``'s free rows.

    With the preceding per-cell skip-feature add this realises ME's
    union-add ``dec + shortcut`` (``decoder_v3.py:163``): appended rows
    carry the shortcut features alone (the dec side has no row there).
    Surplus cells beyond ``g``'s free capacity are dropped (the same
    static-capacity contract as every other cap in this decoder).
    """
    table = build_dense_table(g.coords, g.mask, box, g.stride)
    _, found = lookup_dense_table(table, skip.coords, skip.mask, box, g.stride)
    extra = skip.mask & ~found
    cap = g.capacity
    free = ~g.mask
    n_free = jnp.sum(free.astype(jnp.int32))
    # rank r free slot <- rank r extra row (prefix-sum pairing)
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    slot_of_rank = (
        jnp.zeros((cap,), jnp.int32)
        .at[jnp.where(free, free_rank, cap)]
        .set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    )
    extra_rank = jnp.cumsum(extra.astype(jnp.int32)) - 1
    dest = jnp.where(
        extra & (extra_rank < n_free),
        slot_of_rank[jnp.clip(extra_rank, 0, cap - 1)],
        cap,
    )
    return SparseGrid(
        coords=g.coords.at[dest].set(skip.coords, mode="drop"),
        feats=g.feats.at[dest].set(
            skip.feats.astype(g.feats.dtype), mode="drop"
        ),
        mask=g.mask.at[dest].set(True, mode="drop"),
        stride=g.stride,
    )


class DecoderOutput(NamedTuple):
    """Per-scale decoder state.  ``sem_logits[scale]`` has shape
    ``[cap_scale, n_infers, n_classes]`` on the coords of ``xs[scale]``."""

    xs: Dict[int, SparseGrid]
    sem_logits: Dict[int, jnp.ndarray]
    # Batched per-subnet pruned grids for the transformer (leading axis =
    # subnet): feats [S, cap, C].
    panop_grids: Dict[int, SparseGrid]
    # Per-subnet pruned scale-1 semantic logits [S, cap1, n_classes] on
    # panop_grids[1] coords.
    sem_logits_pruned: jnp.ndarray


class DecoderBlock(nn.Module):
    """One generative upsampling block (reference ``decoder_v3.py:77-172``).

    upsample(gen deconv ks2 s2 + BN + LeakyReLU) -> prune to global bbox ->
    concat normalized coords -> 1x1 resize -> + encoder skip -> residual
    stack -> per-subnet 1x1 completion heads.
    """

    out_channels: int
    n_infers: int
    n_classes: int
    num_res_blocks: int
    dropout: float = 0.0
    ups_capacity: Optional[int] = None  # compact after bbox prune if set
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: SparseGrid,
        skip: SparseGrid,
        box: Box,
        bbox_min: jnp.ndarray,
        bbox_max: jnp.ndarray,
        train: bool,
        drop_on: Optional[bool] = None,
    ) -> Tuple[SparseGrid, jnp.ndarray]:
        if drop_on is None:
            drop_on = train
        cd = self.compute_dtype
        g = SparseGenerativeDeconv(self.out_channels, compute_dtype=cd, name="up")(x)
        f = MaskedBatchNorm(axis_name=self.axis_name, name="up_bn")(
            g.feats, g.mask, train
        )
        g = g.with_feats(jnp.where(g.mask[:, None], nn.leaky_relu(f, 0.01), 0))

        g = prune_outside_box(g, bbox_min, bbox_max)
        if self.ups_capacity is not None and self.ups_capacity < g.capacity:
            g = compact(g, g.mask, self.ups_capacity)

        # Normalised coordinates as 3 extra features (decoder_v3.py:138-146).
        norm_c = (g.coords[:, 1:].astype(jnp.float32) / g.stride).astype(
            g.feats.dtype
        )
        fc = jnp.concatenate([g.feats, jnp.where(g.mask[:, None], norm_c, 0)], -1)
        fc = MaskedBatchNorm(axis_name=self.axis_name, name="resize_bn")(
            fc, g.mask, train
        )
        g = SparseConv(self.out_channels, 1, compute_dtype=cd, name="resize")(
            g.with_feats(fc), box
        )

        skip_f, _ = lookup_features(skip, g.coords, g.mask, box)
        g = g.with_feats(g.feats + skip_f.astype(g.feats.dtype))
        g = union_skip(g, skip, box)

        rb = build_rulebook(g.coords, g.mask, box, g.stride, 3)
        for i in range(self.num_res_blocks):
            g = ResidualBlock(
                self.out_channels, axis_name=self.axis_name, compute_dtype=cd,
                name=f"res{i}",
            )(g, box, train, rb)
        if self.dropout > 0.0:
            g = g.with_feats(
                SpatialDropout(self.dropout, name="drop")(
                    g.feats, deterministic=not drop_on
                )
            )

        # Per-subnet completion heads (decoder_v3.py:130-136): one einsum.
        wh = self.param(
            "head_kernel",
            nn.initializers.lecun_normal(),
            (self.n_infers, self.out_channels, self.n_classes),
        )
        bh = self.param(
            "head_bias", nn.initializers.zeros, (self.n_infers, self.n_classes)
        )
        sem_logits = (
            jnp.einsum(
                "nc,sck->nsk",
                g.feats.astype(jnp.float32),
                wh.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            + bh[None]
        )
        sem_logits = jnp.where(g.mask[:, None, None], sem_logits, 0)
        return g, sem_logits


class VoxelFeatsRefiner(nn.Module):
    """Two-conv refiner applied per (scale, subnet)
    (reference ``decoder_v3.py:266-283``)."""

    channels: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: SparseGrid, box: Box, train: bool) -> SparseGrid:
        rb = build_rulebook(grid.coords, grid.mask, box, grid.stride, 3)
        g = SparseConv(
            self.channels, 3, use_bias=False, compute_dtype=self.compute_dtype,
            name="conv1",
        )(grid, box, rb)
        f = MaskedBatchNorm(axis_name=self.axis_name, name="bn")(
            g.feats, g.mask, train
        )
        g = g.with_feats(jnp.where(g.mask[:, None], nn.relu(f), 0))
        return SparseConv(
            self.channels, 3, use_bias=True, compute_dtype=self.compute_dtype,
            name="conv2",
        )(g, box, rb)


def occupancy_keep_scores(
    sem_logits: jnp.ndarray,     # [N, S, C]
    mask: jnp.ndarray,           # [N]
    compl_labelweights: Optional[jnp.ndarray],  # [C] or None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Union keep mask + capping score, mirroring
    ``predict_completion_sem_logit`` (reference ``decoder_v3.py:319-394``).

    keep = any subnet's argmax class is non-empty; score = the best
    subnet's (max prob x class weight) — the reference's multinomial weight.
    """
    probs = jax.nn.softmax(sem_logits, axis=-1)        # [N, S, C]
    top_prob = jnp.max(probs, axis=-1)                  # [N, S]
    top_class = jnp.argmax(probs, axis=-1)              # [N, S]
    keep_any = jnp.any(top_class != 0, axis=-1) & mask  # [N]
    if compl_labelweights is not None:
        w = compl_labelweights[top_class]               # [N, S]
        score = jnp.max(top_prob * w * (top_class != 0), axis=-1)
    else:
        score = jnp.max(top_prob * (top_class != 0), axis=-1)
    return keep_any, score


class GenerativeDecoder(nn.Module):
    """Full decoder: 3 blocks (s8->s4->s2->s1) + per-scale caps + panop prep."""

    cfg: ModelConfig
    cap: CapacityConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: SparseGrid,                       # bottleneck output, stride 8
        enc_feats: List[SparseGrid],         # [s1, s2, s4]
        box: Box,
        bbox_min: jnp.ndarray,               # [3] global bbox (stride-1 units)
        bbox_max: jnp.ndarray,
        subnet_bbox_min: jnp.ndarray,        # [S, 3] per-subnet bboxes
        subnet_bbox_max: jnp.ndarray,
        compl_labelweights: Dict[int, jnp.ndarray],  # scale -> [n_classes]
        train: bool,
        is_predict_panop: bool = True,
        drop_on: Optional[bool] = None,
    ) -> DecoderOutput:
        if drop_on is None:
            drop_on = train
        cfg = self.cfg
        S = cfg.n_infers
        cd = jnp.dtype(cfg.compute_dtype)
        f = cfg.f_maps
        dec_ch = f[::-1]                      # (4f, 4f, 2f, f) reversed maps
        skips = enc_feats[::-1]               # [s4, s2, s1]
        n_res = (
            cfg.res_blocks
            if cfg.res_blocks is not None
            else (7 if cfg.heavy_decoder else 3)
        )

        xs: Dict[int, SparseGrid] = {}
        sem_at: Dict[int, jnp.ndarray] = {}

        for i, scale in enumerate((4, 2, 1)):
            block = DecoderBlock(
                out_channels=dec_ch[i + 1],
                n_infers=S,
                n_classes=cfg.n_classes,
                num_res_blocks=n_res,
                dropout=cfg.decoder_dropouts[i],
                ups_capacity=self.cap.ups_s4 if scale == 4 else None,
                axis_name=self.axis_name,
                compute_dtype=cd,
                name=f"block_s{scale}",
            )
            x, sem_logits = block(
                x, skips[i], box, bbox_min, bbox_max, train, drop_on
            )

            # Occupancy cap (decoder_v3.py:319-394): keep non-empty union,
            # cap to the static per-scale capacity.  Training uses weighted
            # sampling (Gumbel top-k == multinomial without replacement).
            keep, score = occupancy_keep_scores(
                sem_logits, x.mask, compl_labelweights.get(scale)
            )
            score = jnp.log(jnp.maximum(score, 1e-20))
            if train:
                gumbel = jax.random.gumbel(
                    self.make_rng("sample"), score.shape, jnp.float32
                )
                score = score + gumbel

            capacity = self.cap.dec_capacity(scale)
            carry = jnp.concatenate(
                [x.feats, sem_logits.reshape(x.capacity, -1).astype(x.feats.dtype)],
                axis=-1,
            )
            packed = top_k_compact(x.with_feats(carry), score, keep, capacity)
            x = packed.with_feats(packed.feats[:, : dec_ch[i + 1]])
            sem_logits = (
                packed.feats[:, dec_ch[i + 1]:]
                .astype(jnp.float32)
                .reshape(capacity, S, cfg.n_classes)
            )
            xs[scale] = x
            sem_at[scale] = sem_logits

        panop_grids: Dict[int, SparseGrid] = {}
        sem_pruned = jnp.zeros((S, self.cap.panop_s1, cfg.n_classes), jnp.float32)
        if is_predict_panop:
            for scale in (4, 2, 1):
                g = xs[scale]
                sem_logits = sem_at[scale]
                probs = jax.nn.softmax(sem_logits, axis=-1)
                top_class = jnp.argmax(sem_logits, axis=-1)       # [N, S]
                top_prob = jnp.max(probs, axis=-1)

                pcap = self.cap.panop_capacity(scale)

                def prune_one(keep_i, score_i, sem_i):
                    carry = jnp.concatenate(
                        [g.feats, sem_i.astype(g.feats.dtype)], axis=-1
                    )
                    return top_k_compact(
                        g.with_feats(carry), score_i, keep_i, pcap
                    )

                # keep: non-empty for this subnet AND inside its bbox
                # (decoder_v3.py:414-434).
                c = g.coords[None, :, 1:]
                in_bbox = jnp.all(
                    (c >= subnet_bbox_min[:, None, :])
                    & (c <= subnet_bbox_max[:, None, :]),
                    axis=-1,
                )  # [S, N]
                keeps = (top_class.T != 0) & in_bbox & g.mask[None, :]
                per_subnet = jax.vmap(prune_one)(
                    keeps, top_prob.T, sem_logits.transpose(1, 0, 2)
                )
                # Stamp the subnet index into the batch column so downstream
                # consumers can tell the rows apart.
                sub_ids = jnp.arange(S, dtype=jnp.int32)[:, None]
                per_subnet = per_subnet.replace(
                    coords=per_subnet.coords.at[:, :, 0].set(
                        jnp.broadcast_to(sub_ids, (S, pcap))
                    )
                )
                # Split refiner input channels / carried sem logits.
                ch = g.num_channels
                refel = per_subnet.replace(feats=per_subnet.feats[:, :, :ch])
                carried_sem = per_subnet.feats[:, :, ch:].astype(jnp.float32)

                refined = nn.vmap(
                    VoxelFeatsRefiner,
                    in_axes=(0, None, None),
                    out_axes=0,
                    variable_axes={"params": 0, "batch_stats": 0},
                    split_rngs={"params": True, "dropout": True},
                )(
                    channels=ch,
                    axis_name=self.axis_name,
                    compute_dtype=cd,
                    name=f"voxel_feats_s{scale}",
                )(refel, box, train)

                panop_grids[scale] = refined
                if scale == 1:
                    sem_pruned = carried_sem

        return DecoderOutput(
            xs=xs,
            sem_logits=sem_at,
            panop_grids=panop_grids,
            sem_logits_pruned=sem_pruned,
        )
