"""Full PaSCo-TPU network assembly.

TPU-native equivalent of ``UNet3DV2`` (reference
``pasco/models/unet3d_sparse_v2.py:89-256``) plus the model-side parts of
``Net`` (``net_panoptic_sparse.py:210-340``): point featurizer -> MIMO
merge -> encoder -> dense bottleneck -> generative decoder -> mask
transformer.

The whole forward is one jittable function of fixed-shape arrays; per-scan
variation lives entirely in validity masks and the dynamic box minimum.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pasco_tpu.core.config import PaSCoConfig
from pasco_tpu.core.sparse import Box, SparseGrid
from pasco_tpu.models.bottleneck import DenseBottleneck
from pasco_tpu.models.cylinder_feat import CylinderFeat, mimo_merge
from pasco_tpu.models.decoder import DecoderOutput, GenerativeDecoder
from pasco_tpu.models.encoder import Encoder
from pasco_tpu.models.transformer import PredictorOutput, TransformerPredictor


class ModelInput(NamedTuple):
    """One scene (= n_infers augmented views of one scan at eval / distinct
    scans at train), already voxelised on host.  Shapes are static.

    Produced by :mod:`pasco_tpu.data.semantic_kitti.collate`.
    """

    point_feats: jnp.ndarray       # [P, in_ch] float
    point_coords: jnp.ndarray      # [P, 4] int32 (subnet, x, y, z)
    point_mask: jnp.ndarray        # [P] bool
    global_min: jnp.ndarray        # [3] int32 — global bbox (stride-1 units)
    global_max: jnp.ndarray        # [3] int32
    subnet_min: jnp.ndarray        # [S, 3] int32 per-subnet bboxes
    subnet_max: jnp.ndarray        # [S, 3] int32


class ModelOutput(NamedTuple):
    sem_grids: Dict[int, SparseGrid]          # scale -> voxel grid
    sem_logits: Dict[int, jnp.ndarray]        # scale -> [cap, S, n_classes]
    panop_grids: Dict[int, SparseGrid]        # scale -> per-subnet [S, cap,...]
    sem_logits_pruned: jnp.ndarray            # [S, cap1, n_classes]
    predictor: Optional[PredictorOutput]


class PaSCoNet(nn.Module):
    """End-to-end network. ``cfg`` is static (hashable dataclass)."""

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
        cap = cfg.capacity
        S = m.n_infers
        # MC-dropout switch (``enable_dropout``, torch_util.py:34-40).
        drop_on = train or mc_dropout

        box = Box.create(inp.global_min, cfg.scene.box_extent)

        pm = inp.point_mask
        if drop_on and m.encoder_dropouts[0] > 0.0:
            from pasco_tpu.models.dense_unet import point_dropout

            pm = point_dropout(
                pm, m.encoder_dropouts[0], self.make_rng("dropout")
            )

        # --- Point featurizer + MIMO channel-concat fusion ---------------
        per_subnet = CylinderFeat(
            out_dim=m.f,
            voxel_capacity=cap.enc_s1,
            axis_name=self.axis_name,
            name="cylinder_feat",
        )(
            inp.point_feats, inp.point_coords, pm, box, S, train
        )
        merged = mimo_merge(per_subnet, box, S, cap.enc_s1)
        # Hot-path precision: carry features in the compute dtype (bfloat16
        # on TPU halves HBM traffic of the gather-heavy sparse convs and
        # doubles MXU rate; accumulations stay f32 via
        # preferred_element_type, normalisation stats are computed in f32).
        cd = jnp.dtype(m.compute_dtype)
        if merged.feats.dtype != cd:
            merged = merged.with_feats(merged.feats.astype(cd))

        # --- Encoder ------------------------------------------------------
        enc = Encoder(m, cap, axis_name=self.axis_name, name="encoder")(
            merged, box, train, drop_on
        )

        # --- Dense bottleneck at stride 8 --------------------------------
        bott = DenseBottleneck(
            out_capacity=cap.bottleneck,
            dropout=m.dense3d_dropout,
            axis_name=self.axis_name,
            compute_dtype=jnp.dtype(m.compute_dtype),
            name="dense_bottleneck",
        )(enc[3], box, train, drop_on)

        # --- Generative decoder ------------------------------------------
        dec: DecoderOutput = GenerativeDecoder(
            m, cap, axis_name=self.axis_name, name="decoder"
        )(
            bott,
            enc[:3],
            box,
            inp.global_min,
            inp.global_max,
            inp.subnet_min,
            inp.subnet_max,
            compl_labelweights,
            train,
            is_predict_panop=is_predict_panop,
            drop_on=drop_on,
        )

        predictor = None
        if is_predict_panop:
            t = m.transformer
            predictor = TransformerPredictor(
                cfg=t,
                n_classes=m.n_classes,
                n_infers=S,
                in_channels=(m.f * 4, m.f * 2, m.f),
                name="transformer",
            )(dec.panop_grids, box, train, mc_dropout=mc_dropout)

        return ModelOutput(
            sem_grids=dec.xs,
            sem_logits=dec.sem_logits,
            panop_grids=dec.panop_grids,
            sem_logits_pruned=dec.sem_logits_pruned,
            predictor=predictor,
        )


def build_net(cfg: PaSCoConfig, axis_name: Optional[str] = None):
    """Factory: pick the compute substrate from config (dense is the fast
    TPU path; sparse is the gather-based formulation)."""
    if cfg.model.substrate == "dense":
        from pasco_tpu.models.dense_unet import DensePaSCoNet

        return DensePaSCoNet(cfg, axis_name=axis_name)
    return PaSCoNet(cfg, axis_name=axis_name)
