"""Full evaluation pipeline: forward -> ensemble -> panoptic -> metrics.

Equivalent of ``Net.step_inference`` + ``evaluate_all`` /
``evaluate_panoptic`` (reference ``net_panoptic_sparse.py:539-765``): run
the jitted model once, fuse the MIMO subnets in the canonical frame,
assemble panoptic segments for every subnet and the ensemble, and update
the SSC / PQ / uncertainty accumulators against the canonical-frame GT.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from pasco_tpu.core.config import PaSCoConfig
from pasco_tpu.data.semantic_kitti.collate import CollatedScene
from pasco_tpu.data.semantic_kitti.dataset import prepare_mask_targets
from pasco_tpu.inference.ensemble import (
    ensemble_panop,
    ensemble_sem_compl,
    ssc_confidence,
)
from pasco_tpu.inference.panoptic import _softmax, panoptic_inference
from pasco_tpu.metrics.pq import (
    PQStat,
    find_matched_segments,
    mask_labels_to_panoptic,
    pq_update,
)
from pasco_tpu.metrics.ssc import SSCMetrics
from pasco_tpu.metrics.uncertainty import UncertaintyMetrics


def _np(x):
    return np.asarray(jax.device_get(x))


def subnet_sem_prob_dense(
    out, s: int, subnet_min: np.ndarray, subnet_max: np.ndarray
) -> np.ndarray:
    """Dense [C, X', Y', Z'] softmax probs of subnet ``s`` at scale 1, in
    its own frame (reference ``ensemble_sem_compl`` input prep,
    ``ensembler.py:166-180``)."""
    grid = out.sem_grids[1]
    coords = _np(grid.coords)[:, 1:]
    mask = _np(grid.mask)
    logits = _np(out.sem_logits[1])[:, s]  # [N, C]
    keep = (
        mask
        & np.all(coords >= subnet_min[None], axis=1)
        & np.all(coords <= subnet_max[None], axis=1)
    )
    size = subnet_max - subnet_min + 1
    c = logits.shape[-1]
    dense = np.zeros((c, *size), np.float32)
    rel = coords[keep] - subnet_min[None]
    dense[:, rel[:, 0], rel[:, 1], rel[:, 2]] = _softmax(logits[keep]).T
    return dense


def run_scene_inference(
    forward_fn,
    variables,
    inp,
    scene: CollatedScene,
    cfg: PaSCoConfig,
    measure_time: bool = False,
) -> Dict[str, object]:
    """Forward + MIMO ensembling for one scene.

    Returns per-output (subnet 0..S-1, then ensemble) canonical-frame
    predictions plus timing.
    """
    S = cfg.model.n_infers
    icfg = cfg.inference
    scene_size = cfg.scene.scene_size

    t0 = time.perf_counter()
    out = forward_fn(variables, inp)
    out = jax.block_until_ready(out)
    inference_time = time.perf_counter() - t0

    subnet_min = np.asarray(scene.subnet_min)
    subnet_max = np.asarray(scene.subnet_max)
    Ts = np.asarray(scene.Ts)

    # --- semantic ensembling (ensembler.py:159-187) ----------------------
    sem_dense = [
        subnet_sem_prob_dense(out, s, subnet_min[s], subnet_max[s])
        for s in range(S)
    ]
    t1 = time.perf_counter()
    sem_prob_denses = ensemble_sem_compl(
        sem_dense, [subnet_min[s] for s in range(S)], list(Ts), scene_size
    )

    # --- panoptic ensembling (ensembler.py:20-131) -----------------------
    grid1 = out.panop_grids[1]
    vox_probs, coords_list, qlogits = [], [], []
    for s in range(S):
        m = _np(grid1.mask[s])
        coords_list.append(_np(grid1.coords[s])[m][:, 1:])
        logits = _np(out.predictor.voxel_logits[s])[m]
        vox_probs.append(1.0 / (1.0 + np.exp(-logits)))
        qlogits.append(_np(out.predictor.query_logits[s]))

    panop_outputs = ensemble_panop(
        vox_probs, coords_list, qlogits,
        [subnet_min[s] for s in range(S)], list(Ts), sem_prob_denses,
        iou_threshold=icfg.iou_threshold, out_size=scene_size,
    )
    ensemble_time = time.perf_counter() - t1

    # --- per-output panoptic assembly + confidence -----------------------
    results = []
    for i, po in enumerate(panop_outputs):
        dense_probs = po["voxel_probs_dense"]        # [Q', X, Y, Z]
        occupied = dense_probs.sum(0) > 0
        coords = np.argwhere(occupied)
        vprob = dense_probs[:, coords[:, 0], coords[:, 1], coords[:, 2]].T
        panop = panoptic_inference(
            vprob,
            coords,
            po["query_probs"],
            np.zeros(3, np.int32),
            scene_size,
            cfg.thing_ids,
            overlap_threshold=icfg.overlap_threshold,
            object_mask_threshold=icfg.object_mask_threshold,
            vox_occ_threshold=icfg.vox_occ_threshold,
        )
        panop["sem_prob_dense"] = po["sem_probs_dense"]
        panop["ssc_confidence"] = ssc_confidence(
            po["sem_probs_dense"], icfg.ensemble_confidence_type
        )
        results.append(panop)

    return {
        "outputs": results,
        "inference_time": inference_time,
        "ensemble_time": ensemble_time,
    }


class Evaluator:
    """Accumulates SSC / PQ / uncertainty metrics over scenes for every
    output head (subnets + ensemble), like the reference's per-``i_infer``
    metric dictionaries (``net_panoptic_sparse.py:193-208``)."""

    def __init__(self, cfg: PaSCoConfig):
        self.cfg = cfg
        n_out = cfg.model.n_infers + 1
        c = cfg.model.n_classes
        self.ssc = [SSCMetrics(c) for _ in range(n_out)]
        self.pq = [PQStat() for _ in range(n_out)]
        self.unc = [UncertaintyMetrics() for _ in range(n_out)]

    def add_scene(
        self,
        results: Dict[str, object],
        semantic_label_origin: np.ndarray,   # canonical [256, 256, 32]
        instance_label_origin: np.ndarray,
        eval_list: Optional[Sequence[int]] = None,
        compute_uncertainty: bool = True,
    ):
        cfg = self.cfg
        outputs = results["outputs"]
        if eval_list is None:
            eval_list = range(len(outputs))

        gt_labels, gt_mask_id = prepare_mask_targets(
            semantic_label_origin, instance_label_origin, cfg.thing_ids
        )
        t = len(gt_labels)
        gt_masks = gt_mask_id[None] == np.arange(t)[:, None, None, None]
        gt_panoptic, gt_segments = mask_labels_to_panoptic(
            gt_labels, gt_masks, cfg.thing_ids
        )
        unknown = semantic_label_origin == 255

        for i in eval_list:
            o = outputs[i]
            pred_pan = o["panoptic_seg_dense"].copy()
            gt_pan = gt_panoptic.copy()
            pred_pan[unknown] = 0
            gt_pan[unknown] = 0
            pred_ids = set(np.unique(pred_pan).tolist())
            gt_ids = set(np.unique(gt_pan).tolist())
            pred_info = [s for s in o["segments_info"] if s["id"] in pred_ids]
            gt_info = [s for s in gt_segments if s["id"] in gt_ids]

            pq_update(
                self.pq[i], gt_info, pred_info, gt_pan, pred_pan,
                cfg.thing_ids,
            )

            sem_prob = o["sem_prob_dense"]
            ssc_pred = sem_prob.argmax(0)
            self.ssc[i].add_batch(ssc_pred, semantic_label_origin)
            if compute_uncertainty:
                self.ssc[i].add_batch_ece(
                    o["ssc_confidence"], ssc_pred, sem_prob,
                    semantic_label_origin,
                    inference_time=results["inference_time"],
                )
                matched = find_matched_segments(
                    gt_info, pred_info, gt_pan, pred_pan,
                    threshold=0.5,
                )
                self.unc[i].compute_ece_panop(
                    pred_pan, pred_info, o["vox_confidence_dense"],
                    matched, gt_pan, gt_info, cfg.model.n_classes,
                )

    def summary(self) -> List[Dict[str, object]]:
        out = []
        for i in range(len(self.ssc)):
            all_res, per_class = self.pq[i].pq_average(
                None, 0, self.cfg.thing_ids
            )
            thing_res, _ = self.pq[i].pq_average(True, 0, self.cfg.thing_ids)
            stuff_res, _ = self.pq[i].pq_average(False, 0, self.cfg.thing_ids)
            out.append(
                {
                    "pq_all": all_res,
                    "pq_things": thing_res,
                    "pq_stuff": stuff_res,
                    "per_class": per_class,
                    "ssc": self.ssc[i].get_stats(),
                    "uncertainty": self.unc[i].get_stats(),
                }
            )
        return out
