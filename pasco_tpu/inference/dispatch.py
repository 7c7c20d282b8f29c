"""Scene-adaptive working-box dispatch.

The dense-with-masks substrate computes over a static axis-aligned box, so
its FLOPs scale with the box volume — but a scan's true bbox varies with
the augmentation draw (an unaugmented SemanticKITTI scene spans the
canonical 256x256x32; a 30deg-rotated one up to ~350x350x32).  The
reference never pays for the union: MinkowskiEngine sparse tensors span
each scan's actual coordinate range (dynamic coordinate maps).  This
module restores that behaviour under XLA's static-shape model by
pre-declaring a small ladder of candidate box sizes
(``SceneConfig.box_candidates``), jitting ONE program per candidate
(lazily, cached by XLA's persistent compile cache), and dispatching every
scan to the smallest candidate that covers its bbox.

Correctness is box-independent: all programs share one variable tree
(convs/BN are per-channel, the transformer PE is computed from runtime
coordinates), the in-box bbox masks use the runtime ``global_min/max``,
and the padded sparse extractions use the same static capacities — so a
scan produces identical outputs (up to bf16 noise) through any candidate
that covers it.  Verified by ``tests/test_dispatch.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np

from pasco_tpu.core.config import PaSCoConfig
from pasco_tpu.models.unet import ModelInput, build_net


def candidate_boxes(cfg: PaSCoConfig) -> Tuple[Tuple[int, int, int], ...]:
    cands = cfg.scene.box_candidates
    if not cands:
        return (tuple(cfg.scene.box_extent),)
    # Largest candidate must cover everything the static box covered.
    cands = tuple(sorted(set(tuple(c) for c in cands), key=np.prod))
    return cands


def pick_box(
    cands: Tuple[Tuple[int, int, int], ...],
    global_min: np.ndarray,
    global_max: np.ndarray,
) -> Tuple[int, int, int]:
    """Smallest candidate covering ``[global_min, global_max]``; falls back
    to the largest if none does (matching the old fixed-box behaviour —
    out-of-box voxels are masked off, exactly as before)."""
    ext = np.asarray(global_max) - np.asarray(global_min) + 1
    for cand in cands:
        if np.all(ext <= np.asarray(cand)):
            return cand
    return cands[-1]


class AdaptiveForward:
    """Callable ``(variables, inp) -> ModelOutput`` with per-scan box
    dispatch.  Jitted programs are built lazily per candidate and reused.
    """

    def __init__(
        self,
        cfg: PaSCoConfig,
        labelweights,
        axis_name: Optional[str] = None,
    ):
        self.cfg = cfg
        self.lw = labelweights
        self.axis_name = axis_name
        self.cands = candidate_boxes(cfg)
        self._fns: Dict[Tuple[int, int, int], Callable] = {}

    def fn_for(self, cand: Tuple[int, int, int]) -> Callable:
        if cand not in self._fns:
            cfg = self.cfg.replace(
                scene=dataclasses.replace(self.cfg.scene, box_extent=cand)
            )
            net = build_net(cfg, axis_name=self.axis_name)
            lw = self.lw
            self._fns[cand] = jax.jit(
                lambda v, i: net.apply(v, i, lw, train=False)
            )
        return self._fns[cand]

    def box_for(self, inp: ModelInput) -> Tuple[int, int, int]:
        return pick_box(
            self.cands, np.asarray(inp.global_min), np.asarray(inp.global_max)
        )

    def __call__(self, variables, inp: ModelInput):
        return self.fn_for(self.box_for(inp))(variables, inp)

    def warmup(self, variables, inp: ModelInput):
        """Compile every candidate program once (first dispatch of a new
        box size otherwise pays its compile mid-measurement)."""
        for cand in self.cands:
            jax.block_until_ready(self.fn_for(cand)(variables, inp))
