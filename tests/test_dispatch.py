"""Scene-adaptive box dispatch: bucket selection + output equivalence."""

import jax
import numpy as np
import pytest

from pasco_tpu.core.config import tiny_config
from pasco_tpu.inference.dispatch import AdaptiveForward, pick_box
from tests.test_model_forward import labelweights, make_input


def test_pick_box():
    cands = ((48, 48, 16), (64, 64, 16))
    gmin = np.zeros(3, np.int32)
    assert pick_box(cands, gmin, np.array([31, 31, 15])) == (48, 48, 16)
    assert pick_box(cands, gmin, np.array([47, 47, 15])) == (48, 48, 16)
    assert pick_box(cands, gmin, np.array([48, 31, 15])) == (64, 64, 16)
    # nothing covers -> largest (old fixed-box behaviour)
    assert pick_box(cands, gmin, np.array([80, 31, 15])) == (64, 64, 16)
    # offset minimum
    assert pick_box(cands, np.array([8, 8, 0]), np.array([50, 50, 15])) == (
        48, 48, 16,
    )


@pytest.mark.slow
def test_adaptive_outputs_match_full_box():
    """A scan dispatched to the small candidate must produce the same
    outputs as the full-box program (the masks confine every computation
    to the scan's bbox either way)."""
    cfg = tiny_config(n_infers=1)
    from pasco_tpu.models.unet import build_net

    net = build_net(cfg)   # full 64-box program
    lw = labelweights(cfg)
    inp = make_input(cfg, rng=0)   # scene extent 32 -> fits (48, 48, 16)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda i: net.init({"params": k}, i, lw, train=False)
    )(inp)

    adaptive = AdaptiveForward(cfg, lw)
    assert adaptive.box_for(inp) == (48, 48, 16)
    out_small = adaptive(variables, inp)
    out_full = jax.jit(lambda v, i: net.apply(v, i, lw, train=False))(
        variables, inp
    )

    # Same compaction order (lexicographic cell order is box-independent
    # for a shared minimum), so sparse outputs align row-for-row.
    np.testing.assert_array_equal(
        np.asarray(out_small.sem_grids[1].coords),
        np.asarray(out_full.sem_grids[1].coords),
    )
    np.testing.assert_array_equal(
        np.asarray(out_small.sem_grids[1].mask),
        np.asarray(out_full.sem_grids[1].mask),
    )
    # Tolerance: bf16 logits through two DIFFERENT box programs.  The
    # attention KV chunk clamps to the (box-dependent) KV length, so the
    # f32 accumulation order differs between programs — a handful of
    # borderline elements land ~2 bf16 ulps apart (measured 3 of 81920 at
    # 0.094 after the clamp landed).
    a = np.asarray(out_small.sem_logits[1], np.float32)
    b = np.asarray(out_full.sem_logits[1], np.float32)
    np.testing.assert_allclose(a, b, atol=1.5e-1, rtol=1e-2)
    qa = np.asarray(out_small.predictor.query_logits, np.float32)
    qb = np.asarray(out_full.predictor.query_logits, np.float32)
    np.testing.assert_allclose(qa, qb, atol=1.5e-1, rtol=1e-2)
