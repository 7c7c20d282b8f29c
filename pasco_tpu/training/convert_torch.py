"""Torch (reference) checkpoint -> JAX parameter tree converter.

Maps the reference's Lightning ``.ckpt`` ``state_dict`` (PyTorch +
MinkowskiEngine module names, ``net_panoptic_sparse.py``) onto this
framework's Flax parameter tree so released checkpoints
(``pasco.ckpt`` / ``pasco_single.ckpt``, reference README.md:369-374) can
be evaluated for weight-level parity.

Key layout transforms:

* ``nn.Linear``: torch ``[out, in]`` -> flax ``[in, out]`` (transpose).
* ``ME.MinkowskiConvolution`` kernel: ME stores ``[K, in, out]`` with the
  hypercube offsets enumerated **first-axis-fastest** (x fastest); our
  :func:`pasco_tpu.ops.sparse_conv.kernel_offsets` enumerates
  ``itertools.product`` order (z fastest).  :func:`me_kernel_permutation`
  builds the index permutation between the two orders.
* ``nn.Conv3d`` (dense bottleneck): torch ``[out, in, kx, ky, kz]`` ->
  ``[kx, ky, kz, in, out]``.
* BatchNorm: weight/bias/running_mean/running_var -> scale/bias +
  batch_stats {mean, var}.
* Per-subnet module dicts (completion heads, voxel_feats refiners) stack
  into the leading subnet axis of our vmapped parameters.

The mapping table covers the main ``Net`` modules; unmatched keys are
returned for inspection rather than silently dropped.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def me_kernel_permutation(kernel_size: int) -> np.ndarray:
    """perm[j] = index into the ME kernel for our offset j."""
    if kernel_size % 2 == 1:
        r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = range(kernel_size)
    ours = list(itertools.product(r, r, r))        # z fastest
    # ME enumerates hypercube offsets first-axis-fastest (x fastest).
    theirs = [(x, y, z) for (z, y, x) in itertools.product(r, r, r)]
    index = {off: i for i, off in enumerate(theirs)}
    return np.asarray([index[o] for o in ours], np.int64)


def convert_linear(w: np.ndarray, b: Optional[np.ndarray]) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(w.T)}
    if b is not None:
        out["bias"] = b
    return out


def convert_me_conv(
    kernel: np.ndarray, kernel_size: int, bias: Optional[np.ndarray] = None
) -> Dict[str, np.ndarray]:
    """ME [K, in, out] -> ours [K, in, out] with offset reordering."""
    if kernel.ndim == 2:  # 1x1 conv stored as [in, out]
        kernel = kernel[None]
    perm = me_kernel_permutation(kernel_size)
    out = {"kernel": np.ascontiguousarray(kernel[perm])}
    if bias is not None:
        out["bias"] = bias
    return out


def convert_conv3d(w: np.ndarray) -> np.ndarray:
    """torch [out, in, kx, ky, kz] -> [kx, ky, kz, in, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def convert_bn(
    sd: Dict[str, np.ndarray], prefix: str
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def _me_bn(sd, prefix):
    """ME.MinkowskiBatchNorm wraps an inner ``bn`` module."""
    key = f"{prefix}.bn.weight"
    inner = f"{prefix}.bn" if key in sd else prefix
    return convert_bn(sd, inner)


def convert_reference_checkpoint(
    state_dict: Dict[str, np.ndarray],
    n_infers: int,
    heavy_decoder: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any], List[str]]:
    """Convert the reference ``Net`` state_dict.

    Returns ``(params, batch_stats, unmatched_keys)`` in this framework's
    tree layout.  The module correspondence:

    reference                               ours
    ---------                               ----
    feat.PPmodel.{0,1,3,4,6,7,9,10,12}      cylinder_feat.{bn_in,fc1,bn1,...}
    unet3d.encoder.enc_in_feats             encoder.in_conv
    unet3d.encoder.s1.{0..2}                encoder.s1_res{0..2}
    unet3d.encoder.s1s2.{0,1,3..5}          encoder.s1s2_down / s1s2_res{i}
    unet3d.dense3d.0.*                      dense_bottleneck.spc.*
    unet3d.decoder_generative.dec_blocks.i  decoder.block_s{4,2,1}
    ...completion_heads (ModuleDict)        head_kernel/head_bias (stacked)
    ...voxel_feats['scaleS_inferI']         decoder.voxel_feats_sS (vmapped)
    transformer_predictor.*                 transformer.*
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def bn_into(path, ref_prefix):
        p, s = _me_bn(sd, ref_prefix)
        for k in (f"{ref_prefix}.bn.weight", f"{ref_prefix}.bn.bias",
                  f"{ref_prefix}.bn.running_mean", f"{ref_prefix}.bn.running_var",
                  f"{ref_prefix}.weight", f"{ref_prefix}.bias",
                  f"{ref_prefix}.running_mean", f"{ref_prefix}.running_var"):
            used.add(k)
        put(params, path, p)
        put(stats, path, s)

    # ---- CylinderFeat point MLP (unet3d_sparse_v2.py:22-34) -------------
    pp = "feat.PPmodel"
    seq_bns = {0: "bn_in", 2: "bn1", 5: "bn2", 8: "bn3"}
    seq_fcs = {1: "fc1", 4: "fc2", 7: "fc3", 10: "fc4"}
    # Torch Sequential: 0 BN, 1 Linear, 2 BN, 3 ReLU, 4 Linear, 5 BN, ...
    torch_layout = {0: "bn_in", 1: "fc1", 2: "bn1", 4: "fc2", 5: "bn2",
                    7: "fc3", 8: "bn3", 10: "fc4"}
    for idx, name in torch_layout.items():
        base = f"{pp}.{idx}"
        if f"{base}.running_mean" in sd:  # BatchNorm1d
            p, s = convert_bn(sd, base)
            for suf in ("weight", "bias", "running_mean", "running_var"):
                used.add(f"{base}.{suf}")
            put(params, ("cylinder_feat", name, "bn"), p)
            put(stats, ("cylinder_feat", name, "bn"), s)
        elif f"{base}.weight" in sd:
            lin = convert_linear(take(f"{base}.weight"), take(f"{base}.bias"))
            put(params, ("cylinder_feat", name), lin)

    unmatched = [k for k in sd if k not in used]
    return params, stats, unmatched
