"""Multi-chip (virtual 8-device CPU mesh) sharding tests."""

import numpy as np
import pytest

import jax


@pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 virtual devices"
)
def test_dryrun_multichip_4():
    import sys, os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)


def test_mesh_helpers():
    from pasco_tpu.parallel.mesh import make_mesh, replicate_to_mesh

    mesh = make_mesh(min(2, len(jax.devices())))
    x = replicate_to_mesh({"a": np.ones((4, 4))}, mesh)
    assert np.allclose(np.asarray(x["a"]), 1.0)
