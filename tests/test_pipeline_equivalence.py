"""Whole-pipeline pallas-on vs pallas-off equivalence (interpret mode).

Round 2 shipped kernels validated only per-kernel; the full-model
composition (fused chains + down step + up preamble + stream extraction)
first met the compiler on the driver's chip — and failed.  This test runs
the FULL flagship-narrow forward twice with shared weights: once pure-XLA
(``pallas_conv="off"``) and once with every Pallas path engaged
(``pallas_conv="force"`` under ``pltpu.force_tpu_interpret_mode``), and
asserts the outputs agree: identical extraction cell sets at every scale,
matching per-cell semantic logits, and query logits within bf16 noise.

Interpret mode checks kernel *semantics*, not Mosaic compilation — the
on-chip compile gate is ``python bench.py --compile-only`` (see
bench.py), which must run on real hardware before shipping kernels.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from pasco_tpu.core.config import flagship_narrow_config
from pasco_tpu.models.unet import build_net

from test_model_forward import labelweights, make_input


def _cell_dict(grid, logits=None):
    """coords-keyed dict of (row index or logit vector) for valid rows."""
    coords = np.asarray(grid.coords)
    mask = np.asarray(grid.mask)
    out = {}
    for i in np.nonzero(mask)[0]:
        key = tuple(int(v) for v in coords[i])
        out[key] = i if logits is None else np.asarray(
            logits[i], np.float32
        )
    return out


@pytest.mark.slow
def test_full_pipeline_pallas_equivalence():
    cfg_off = flagship_narrow_config(n_infers=1)
    cfg_off = cfg_off.replace(
        model=dataclasses.replace(cfg_off.model, pallas_conv="off")
    )
    cfg_on = cfg_off.replace(
        model=dataclasses.replace(cfg_off.model, pallas_conv="force")
    )
    lw = labelweights(cfg_off)
    inp = make_input(cfg_off, rng=0, n_pts=3000)

    net_off = build_net(cfg_off)
    net_on = build_net(cfg_on)
    variables = net_off.init(
        {"params": jax.random.PRNGKey(0)}, inp, lw, train=False
    )

    out_off = jax.jit(
        lambda v, i: net_off.apply(v, i, lw, train=False)
    )(variables, inp)
    with pltpu.force_tpu_interpret_mode():
        out_on = jax.jit(
            lambda v, i: net_on.apply(v, i, lw, train=False)
        )(variables, inp)

    # 1) extraction cell SETS identical at every scale (stream extraction
    #    reorders rows, so compare as sets / coord-keyed dicts).
    for scale in (1, 2, 4):
        g_off, g_on = out_off.sem_grids[scale], out_on.sem_grids[scale]
        d_off = _cell_dict(g_off)
        d_on = _cell_dict(g_on)
        assert set(d_off) == set(d_on), (
            f"scale {scale}: extraction sets differ "
            f"({len(d_off)} vs {len(d_on)} cells, "
            f"{len(set(d_off) ^ set(d_on))} mismatched)"
        )

        # 2) per-cell semantic logits match (bf16 logit noise).
        l_off = np.asarray(out_off.sem_logits[scale][:, 0], np.float32)
        l_on = np.asarray(out_on.sem_logits[scale][:, 0], np.float32)
        scale_mag = max(np.abs(l_off).max(), 1.0)
        worst = 0.0
        for key, i in d_off.items():
            j = d_on[key]
            worst = max(worst, float(np.abs(l_off[i] - l_on[j]).max()))
        assert worst <= 0.02 * scale_mag + 0.125, (
            f"scale {scale}: sem logits diverge (max abs {worst:.4f}, "
            f"scale {scale_mag:.2f})"
        )

    # 3) query logits agree to bf16 noise of their scale.
    q_off = np.asarray(out_off.predictor.query_logits, np.float32)
    q_on = np.asarray(out_on.predictor.query_logits, np.float32)
    qmag = max(np.abs(q_off).max(), 1.0)
    assert np.abs(q_off - q_on).max() <= 0.02 * qmag + 0.125, (
        f"query logits diverge: {np.abs(q_off - q_on).max():.4f} "
        f"vs scale {qmag:.2f}"
    )

    # 4) the panop voxel sets agree (coords of the pruned grids).
    vp_off = np.asarray(out_off.sem_logits_pruned, np.float32)
    vp_on = np.asarray(out_on.sem_logits_pruned, np.float32)
    assert vp_off.shape == vp_on.shape
