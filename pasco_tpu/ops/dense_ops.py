"""Dense masked 3D ops — the TPU-preferred compute formulation.

Profiling on the target chip showed sparse gather-based convs bound at
~25 GB/s (random 128-byte row fetches) while dense slices and matmuls run
near peak.  Since a *masked* dense convolution is numerically identical to
the masked submanifold conv (absent neighbours contribute zero either
way, and outputs at absent sites are re-masked), the hot U-Net stages run
dense-with-masks over the bounded working box and only the attention /
loss stages extract padded sparse sets.

All ops take channels-last ``[X, Y, Z, C]`` volumes plus ``[X, Y, Z]``
occupancy masks.  Weight layouts are shared with the sparse path
(``[K, Cin, Cout]``, offsets ordered z-fastest by
:func:`pasco_tpu.ops.sparse_conv.kernel_offsets`), so parameters are
interchangeable between formulations.

Axis order: ops with an ``axis_order`` parameter also accept volumes laid
out ``[X, Z, Y, C]`` (``axis_order="xzy"``).  Keeping the short z extent
away from the channel-adjacent (sublane) position makes XLA's spatial
convolutions dramatically faster on TPU — measured on the target chip,
3^3 bf16 convs run 1.4x faster at the stride-1 shape (352x352x32, C=64),
1.9x at stride 2, and 8x at stride 4 (88x88x8, C=256, whose z=8 pads to
a 16-sublane tile in xyz order).  Weight layouts are unchanged; the tap
enumeration is permuted internally.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pasco_tpu.core.sparse import Box, SparseGrid


def shift_matmul_conv3d(
    x: jnp.ndarray,            # [B, X, Y, Z, C]
    w: jnp.ndarray,            # [kx, ky, kz, C, D]
    compute_dtype=None,
    group: int = 9,
) -> jnp.ndarray:
    """'Same'-padded dense 3D conv as a scan of shifted slice+matmul taps.

    XLA's native spatial convolution on this backend compiles anisotropic
    high-channel shapes at ~1 min per conv and runs them at a few TFLOPs;
    K shifted ``[N, C] @ [C, D]`` matmuls under ``lax.scan`` compile in
    seconds and keep the MXU fed.  ``group`` taps run per scan step so the
    f32 accumulator round-trips HBM K/group times instead of K.
    """
    b, X, Y, Z, c = x.shape
    kx, ky, kz = w.shape[:3]
    d = w.shape[-1]
    k = kx * ky * kz
    cd = compute_dtype or x.dtype
    xp = jnp.pad(
        x.astype(cd),
        ((0, 0), (kx // 2, kx // 2), (ky // 2, ky // 2), (kz // 2, kz // 2), (0, 0)),
    )
    offsets = jnp.asarray(
        [(i, j, kk) for i in range(kx) for j in range(ky) for kk in range(kz)],
        jnp.int32,
    )
    wk = w.reshape(k, c, d).astype(cd)

    if k % group != 0:
        group = 1
    steps = k // group
    off_g = offsets.reshape(steps, group, 3)
    w_g = wk.reshape(steps, group, c, d)

    def step(acc, inp):
        off, wi = inp
        partial = 0.0
        for g in range(group):
            sl = jax.lax.dynamic_slice(
                xp, (0, off[g, 0], off[g, 1], off[g, 2], 0), (b, X, Y, Z, c)
            )
            partial = partial + jnp.dot(
                sl.reshape(-1, c), wi[g], preferred_element_type=jnp.float32
            )
        return acc + partial, None

    acc0 = jnp.zeros((b * X * Y * Z, d), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (off_g, w_g))
    return acc.reshape(b, X, Y, Z, d).astype(x.dtype)


def xzy_tap_perm(k: int):
    """Permutation of ``k^3`` kernel taps from the canonical z-fastest
    (dx, dy, dz) enumeration to the (dx, dz, dy) enumeration matching an
    ``[X, Z, Y, C]`` volume."""
    perm = []
    for dx in range(k):
        for dz in range(k):
            for dy in range(k):
                perm.append((dx * k + dy) * k + dz)
    return jnp.asarray(perm, jnp.int32)


def conv3_dense(
    x: jnp.ndarray,            # [X, Y, Z, C] (batchless)
    weight: jnp.ndarray,       # [27, Cin, Cout] sparse-layout kernel
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
    axis_order: str = "xyz",
) -> jnp.ndarray:
    """3x3x3 masked-dense conv with the sparse path's weight layout.

    Uses XLA's native spatial convolution: for plain 3^3 kernels it runs at
    ~50+ TFLOP/s on the target chip — 13x faster than the shift-matmul
    form, whose f32 accumulator round-trips dominate at these sizes.  (The
    shift-matmul form remains for the bottleneck's anisotropic kernels,
    where native compilation is pathological.)
    """
    cd = compute_dtype or x.dtype
    if axis_order == "xzy":
        weight = weight[xzy_tap_perm(3)]
    w = weight.reshape(3, 3, 3, weight.shape[1], weight.shape[2])
    # Uniform operand/output dtype keeps the VJP's transposed convs
    # type-consistent; the TPU conv unit accumulates in f32 internally.
    out = jax.lax.conv_general_dilated(
        x[None].astype(cd),
        w.astype(cd),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )[0].astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def down2_dense(
    x: jnp.ndarray,            # [X, Y, Z, C]
    weight: jnp.ndarray,       # [8, Cin, Cout] (kernel_offsets(2) order)
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
    axis_order: str = "xyz",
) -> jnp.ndarray:
    """Kernel-2 stride-2 downsampling conv as ONE matmul: gather each output
    cell's 2x2x2 children by reshape and contract ``[N, 8C] @ [8C, D]``."""
    X, Y, Z, c = x.shape
    cd = compute_dtype or x.dtype
    if axis_order == "xzy":
        weight = weight[xzy_tap_perm(2)]
    xr = (
        x.astype(cd)
        .reshape(X // 2, 2, Y // 2, 2, Z // 2, 2, c)
        .transpose(0, 2, 4, 1, 3, 5, 6)       # [X/2, Y/2, Z/2, 2, 2, 2, C]
        .reshape(-1, 8 * c)
    )
    w = weight.astype(cd).reshape(8 * c, -1)
    out = jnp.dot(xr, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.reshape(X // 2, Y // 2, Z // 2, -1).astype(x.dtype)


def deconv2_dense(
    x: jnp.ndarray,            # [X, Y, Z, C]
    weight: jnp.ndarray,       # [8, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
    axis_order: str = "xyz",
) -> jnp.ndarray:
    """Kernel-2 stride-2 generative transposed conv as ONE matmul + a
    depth-to-space reshape (every child has exactly one parent)."""
    X, Y, Z, c = x.shape
    cd = compute_dtype or x.dtype
    d = weight.shape[-1]
    if axis_order == "xzy":
        weight = weight[xzy_tap_perm(2)]
    w = weight.astype(cd).transpose(1, 0, 2).reshape(c, 8 * d)
    out = jnp.dot(x.astype(cd).reshape(-1, c), w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.reshape(1, -1).repeat(8, 0).reshape(1, 8 * d)
    # Cast before the depth-to-space shuffle so the relayout moves bf16,
    # not f32 (halves the transpose traffic).
    out = out.astype(x.dtype).reshape(X, Y, Z, 2, 2, 2, d)
    out = out.transpose(0, 3, 1, 4, 2, 5, 6).reshape(2 * X, 2 * Y, 2 * Z, d)
    return out


# ---------------------------------------------------------------------------
# z-pair packing ("packed" layout of the s1/s2 stages)
#
# A packed volume folds pairs of adjacent z cells into the channel dim:
# [X, Z, Y, C] (xzy order) -> [X, T=Z/2, Y, 2C], lanes = [z=2t | z=2t+1].
# Why: C=64/128 volumes pad to 128 lanes physically (2x HBM on every pass),
# and XLA's conv runs the packed (3,2,3)-kernel formulation at 121-153
# TF/s vs 53 TF/s unpacked (measured, stride-1/2 shapes) — the packed
# kernel covers all 27 logical taps with 6/8 nonzero channel blocks
# (1.33x logical FLOPs) on full 128-lane output tiles.
#
# Occupancy masks at packed scales are per-slot pairs ``(lo, hi)``, each
# [X, T, Y] — a trailing slot axis of size 2 would lane-pad 64x.
# ---------------------------------------------------------------------------


def pack_z2(x: jnp.ndarray) -> jnp.ndarray:
    """[X, Z, Y, C] (xzy) -> [X, Z//2, Y, 2C]; lanes [z even | z odd]."""
    X, Z, Y, C = x.shape
    return (
        x.reshape(X, Z // 2, 2, Y, C)
        .transpose(0, 1, 3, 2, 4)
        .reshape(X, Z // 2, Y, 2 * C)
    )


def unpack_z2(x: jnp.ndarray) -> jnp.ndarray:
    """[X, T, Y, 2C] -> [X, 2T, Y, C] (xzy)."""
    X, T, Y, C2 = x.shape
    return (
        x.reshape(X, T, Y, 2, C2 // 2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(X, 2 * T, Y, C2 // 2)
    )


def pack_mask_z2(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[X, Z, Y] -> (lo, hi) slot masks, each [X, Z//2, Y]."""
    return mask[:, 0::2], mask[:, 1::2]


def unpack_mask_z2(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """(lo, hi) [X, T, Y] -> [X, 2T, Y]."""
    X, T, Y = lo.shape
    return jnp.stack([lo, hi], axis=2).reshape(X, 2 * T, Y)


def mask_mul_z2(x, lo, hi):
    """Per-slot masking of a packed volume as ONE select on the full-width
    tensor: the slot mask broadcasts across each lane half, so XLA emits a
    single fusion over the tile-aligned [..., 2C] buffer.  The previous
    two-half-`where` + concat form materialised two [..., C] temps that
    each lane-pad 2x in HBM at C=64 (they were the top allocations of the
    train step's OOM dump)."""
    c = x.shape[-1] // 2
    m = jnp.stack([lo, hi], axis=-1)[..., None]          # [..., 2, 1]
    m = jnp.broadcast_to(m, x.shape[:-1] + (2, c))
    return jnp.where(m.reshape(x.shape), x, 0)


def blockdiag2_weight(w: jnp.ndarray) -> jnp.ndarray:
    """[Ci, Co] -> [2Ci, 2Co] block-diagonal (per-slot 1x1 conv)."""
    ci, co = w.shape
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [
            jnp.concatenate([w, z], axis=1),
            jnp.concatenate([z, w], axis=1),
        ],
        axis=0,
    )


def packed2_conv_weight(weight: jnp.ndarray) -> jnp.ndarray:
    """[27, Ci, Co] (z-fastest taps) -> [3, 2, 3, 2Ci, 2Co] packed kernel.

    The packed conv consumes the +1-z-shifted packed input Q
    (``Q[t] = (z=2t-1 | z=2t)``) with window {t, t+1}; output slot
    oz at pair t is z=2t+oz, input (pt, pz) is z=2(t+pt)-1+pz, so the
    logical tap is dz = 2*pt + pz - 1 - oz (6 of 8 blocks valid)."""
    ci, co = weight.shape[1], weight.shape[2]
    w3 = weight.reshape(3, 3, 3, ci, co)       # [dx, dy, dz+1, ci, co]
    wp = jnp.zeros((3, 2, 3, 2 * ci, 2 * co), weight.dtype)
    for pt in range(2):
        for pz in range(2):
            for oz in range(2):
                dz = 2 * pt + pz - 1 - oz
                if -1 <= dz <= 1:
                    wp = wp.at[
                        :, pt, :,
                        pz * ci : (pz + 1) * ci,
                        oz * co : (oz + 1) * co,
                    ].set(w3[:, :, dz + 1].transpose(0, 1, 2, 3))
    return wp


def conv3_packed_z2(
    x: jnp.ndarray,            # [X, T, Y, 2C] packed volume
    weight: jnp.ndarray,       # [27, Cin, Cout] sparse-layout kernel
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
    mask: Optional[jnp.ndarray] = None,   # logical [X, 2T, Y] input mask
) -> jnp.ndarray:
    """'Same' 3^3 conv on a z-pair-packed xzy volume (see module notes).

    ``mask`` (when given) zeroes invalid input cells *inside* the shifted-
    input build — the submanifold-masking pass rides the Q materialisation
    for free instead of costing its own HBM round trip."""
    X, T, Y, c2 = x.shape
    c = c2 // 2
    cd = compute_dtype or x.dtype
    x_hi, x_lo = x[..., c:], x[..., :c]
    if mask is not None:
        x_hi = jnp.where(mask[:, 1::2][..., None], x_hi, 0)
        x_lo = jnp.where(mask[:, 0::2][..., None], x_lo, 0)
    # Q[t] = (z=2t-1 | z=2t), t = 0..T: previous pair's hi slot, this
    # pair's lo slot.  One entry longer than x so the window {t, t+1}
    # covers z in [2t-1, 2t+2] including the top boundary's real value.
    prev_hi = jnp.pad(x_hi, ((0, 0), (1, 0), (0, 0), (0, 0)))
    lo_ext = jnp.pad(x_lo, ((0, 0), (0, 1), (0, 0), (0, 0)))
    q = jnp.concatenate([prev_hi, lo_ext], axis=-1)
    wp = packed2_conv_weight(weight).astype(cd)
    # Two batched 2D convs over (X, Y) with the pair axis as batch — the
    # measured-fastest formulation (XLA's 3D conv inserts relayout copies
    # around every call; the 2D pair runs ~12 ms/conv in-context at the
    # stride-1 shape vs ~22 ms for the 3D forms).
    dn = ("XNYC", "XYIO", "XNYC")
    qc = q.astype(cd)
    out = jax.lax.conv_general_dilated(
        qc[:, :-1], wp[:, 0], (1, 1), "SAME", dimension_numbers=dn
    ) + jax.lax.conv_general_dilated(
        qc[:, 1:], wp[:, 1], (1, 1), "SAME", dimension_numbers=dn
    )
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + jnp.concatenate([bias, bias]).astype(x.dtype)
    return out


def down2_packed_to_packed(
    x: jnp.ndarray,            # [X, T, Y, 2Ci] packed (e.g. s1p)
    weight: jnp.ndarray,       # [8, Ci, Co] (kernel_offsets(2) order)
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Stride-2 down conv, packed in -> packed out ([X/2, T/2, Y/2, 2Co]).

    Output pair slot oz2 draws from input pair t1 = 2*t2 + oz2 (both of
    whose slots are the z children); block-diagonal in (oz2, it)."""
    X, T, Y, c2 = x.shape
    ci = c2 // 2
    co = weight.shape[-1]
    cd = compute_dtype or x.dtype
    xr = (
        x.astype(cd)
        .reshape(X // 2, 2, T // 2, 2, Y // 2, 2, c2)
        .transpose(0, 2, 4, 1, 3, 5, 6)     # [X2, T2, Y2, ix, it, iy, 2Ci]
        .reshape(-1, 8 * c2)                # K = ix*it*iy*(2Ci)
    )
    w3 = weight.reshape(2, 2, 2, ci, co)    # [ix, iy, dz, ci, co]
    wk = jnp.zeros((2, 2, 2, 2 * ci, 2 * co), weight.dtype)
    for it in range(2):                     # input pair offset == out slot
        for pz in range(2):                 # input slot == z child
            wk = wk.at[
                :, it, :, pz * ci : (pz + 1) * ci, it * co : (it + 1) * co
            ].set(w3[:, :, pz])
    wk = wk.reshape(8 * c2, 2 * co).astype(cd)
    out = jnp.dot(xr, wk, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + jnp.concatenate([bias, bias])
    return out.reshape(X // 2, T // 2, Y // 2, 2 * co).astype(x.dtype)


def down2_packed_to_plain(
    x: jnp.ndarray,            # [X, T, Y, 2Ci] packed (e.g. s2p)
    weight: jnp.ndarray,       # [8, Ci, Co]
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Stride-2 down conv, packed in -> plain xzy out ([X/2, T, Y/2, Co]).

    Each output cell's two z children are exactly one packed input cell's
    slots, so the packed t axis maps 1:1 to the output z axis."""
    X, T, Y, c2 = x.shape
    ci = c2 // 2
    co = weight.shape[-1]
    cd = compute_dtype or x.dtype
    xr = (
        x.astype(cd)
        .reshape(X // 2, 2, T, Y // 2, 2, c2)
        .transpose(0, 2, 3, 1, 4, 5)        # [X2, T, Y2, ix, iy, 2Ci]
        .reshape(-1, 4 * c2)
    )
    w3 = weight.reshape(2, 2, 2, ci, co)
    # rows (ix, iy, dz, ci) match xr's (ix, iy, [slot | ci]) channel layout
    wk = w3.reshape(8 * ci, co)
    out = jnp.dot(xr, wk.astype(cd), preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.reshape(X // 2, T, Y // 2, co).astype(x.dtype)


def deconv2_plain_to_packed(
    x: jnp.ndarray,            # [X, Z, Y, Ci] plain xzy (e.g. s4)
    weight: jnp.ndarray,       # [8, Ci, Co]
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Generative stride-2 deconv, plain in -> packed out
    ([2X, Z, 2Y, 2Co]): a cell's two z children form one packed cell."""
    X, Z, Y, ci = x.shape
    co = weight.shape[-1]
    cd = compute_dtype or x.dtype
    w3 = weight.reshape(2, 2, 2, ci, co)
    # [ci, (ix, iy, dz*co)]
    wk = w3.transpose(3, 0, 1, 2, 4).reshape(ci, 2 * 2 * 2 * co).astype(cd)
    out = jnp.dot(
        x.astype(cd).reshape(-1, ci), wk, preferred_element_type=jnp.float32
    )
    if bias is not None:
        out = out + jnp.tile(bias, 8)
    out = out.astype(x.dtype).reshape(X, Z, Y, 2, 2, 2 * co)
    out = out.transpose(0, 3, 1, 2, 4, 5).reshape(2 * X, Z, 2 * Y, 2 * co)
    return out


def deconv2_packed_to_packed(
    x: jnp.ndarray,            # [X, T, Y, 2Ci] packed (e.g. s2p)
    weight: jnp.ndarray,       # [8, Ci, Co]
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Generative stride-2 deconv, packed in -> packed out
    ([2X, 2T, 2Y, 2Co]): slot pz's children land in output pair 2t+pz."""
    X, T, Y, c2 = x.shape
    ci = c2 // 2
    co = weight.shape[-1]
    cd = compute_dtype or x.dtype
    w3 = weight.reshape(2, 2, 2, ci, co)
    wk = jnp.zeros((2 * ci, 2, 2, 2, 2 * co), weight.dtype)
    for pz in range(2):  # input slot -> output pair offset (block diag)
        for dz in range(2):
            wk = wk.at[
                pz * ci : (pz + 1) * ci, :, pz, :, dz * co : (dz + 1) * co
            ].set(w3[:, :, dz].transpose(2, 0, 1, 3))
    wk = wk.reshape(c2, 16 * co).astype(cd)
    out = jnp.dot(
        x.astype(cd).reshape(-1, c2), wk, preferred_element_type=jnp.float32
    )
    if bias is not None:
        out = out + jnp.tile(jnp.concatenate([bias, bias]), 8)
    out = out.astype(x.dtype).reshape(X, T, Y, 2, 2, 2, 2 * co)
    #                      (x, t, y, ix, pt, iy, 2co)
    out = out.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
        2 * X, 2 * T, 2 * Y, 2 * co
    )
    return out


def maxpool2_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """[X, Y, Z] bool -> [X/2, Y/2, Z/2] any-child."""
    X, Y, Z = mask.shape
    return (
        mask.reshape(X // 2, 2, Y // 2, 2, Z // 2, 2).any(axis=(1, 3, 5))
    )


def upsample2_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """[X, Y, Z] bool -> [2X, 2Y, 2Z] broadcast-children."""
    X, Y, Z = mask.shape
    out = jnp.broadcast_to(
        mask[:, None, :, None, :, None], (X, 2, Y, 2, Z, 2)
    )
    return out.reshape(2 * X, 2 * Y, 2 * Z)


def bbox_mask(
    box: Box, stride: int, bbox_min: jnp.ndarray, bbox_max: jnp.ndarray,
    axis_order: str = "xyz",
) -> jnp.ndarray:
    """Volume-shaped bool of cells whose absolute coords lie in [min, max]."""
    ex, ey, ez = box.extent_at(stride)
    ax = box.minimum[0] + jnp.arange(ex) * stride
    ay = box.minimum[1] + jnp.arange(ey) * stride
    az = box.minimum[2] + jnp.arange(ez) * stride
    mx = (ax >= bbox_min[0]) & (ax <= bbox_max[0])
    my = (ay >= bbox_min[1]) & (ay <= bbox_max[1])
    mz = (az >= bbox_min[2]) & (az <= bbox_max[2])
    if axis_order == "xzy":
        return mx[:, None, None] & mz[None, :, None] & my[None, None, :]
    return mx[:, None, None] & my[None, :, None] & mz[None, None, :]


def cell_coords(box: Box, stride: int, axis_order: str = "xyz") -> jnp.ndarray:
    """Volume-shaped ``[..., 3]`` absolute stride-1 (x, y, z) coords."""
    ex, ey, ez = box.extent_at(stride)
    if axis_order == "xzy":
        gx, gz, gy = jnp.meshgrid(
            jnp.arange(ex), jnp.arange(ez), jnp.arange(ey), indexing="ij"
        )
    else:
        gx, gy, gz = jnp.meshgrid(
            jnp.arange(ex), jnp.arange(ey), jnp.arange(ez), indexing="ij"
        )
    rel = jnp.stack([gx, gy, gz], axis=-1).astype(jnp.int32) * stride
    return rel + box.minimum[None, None, None, :]


def compact_src(
    keep_f: jnp.ndarray,       # [n] bool, flattened keep
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(src, valid, total): ``src[j]`` = flat index of the j-th kept cell.

    TPU scatters are update-count bound (~100M updates/s), so the naive
    inverse — scatter each of n cell indices to its prefix-sum slot —
    cost ~42 ms at the 4M-cell scale-1 extraction.  Two-level form: cells
    group into blocks of 32; block-of-output-slot comes from a G-update
    boundary scatter (n/32 updates) + cumsum.  Each block's keep bits pack
    into ONE uint32 word, so the within-block position is "select the
    r-th set bit": a 5-step ``lax.population_count`` binary search, all
    fused elementwise over [capacity].  (The previous rank-comparison
    form gathered [capacity, 32] s32+pred block rows — ~64 MB of random
    row reads at the 4M-cell/400k-cap scale-1 extraction versus ~1.6 MB
    for the packed words.)
    """
    n = keep_f.shape[0]
    L = 32
    g = -(-n // L)
    pad = g * L - n
    k2 = jnp.pad(keep_f, (0, pad)).reshape(g, L)
    w = jnp.sum(
        k2.astype(jnp.uint32) << jnp.arange(L, dtype=jnp.uint32)[None],
        axis=1,
        dtype=jnp.uint32,
    )                                                   # [g] bit-packed keeps
    cnt = jax.lax.population_count(w).astype(jnp.int32)
    coff = jnp.cumsum(cnt)
    total = coff[-1]
    off = jnp.concatenate([jnp.zeros((1,), cnt.dtype), coff[:-1]])
    marks = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[jnp.minimum(off, capacity)].add(1, mode="drop")
    )
    blk = jnp.cumsum(marks[:capacity]) - 1              # covering block of j
    r = jnp.arange(capacity, dtype=jnp.int32) - off[blk]
    wb = w[blk]                                         # [cap] words
    # pos = index of the r-th (0-based) set bit of wb: binary search by
    # popcount of the low half at each width.
    pos = jnp.zeros((capacity,), jnp.int32)
    rem = r
    for width in (16, 8, 4, 2, 1):
        low = ((jnp.uint32(1) << jnp.uint32(width)) - jnp.uint32(1)) << pos.astype(
            jnp.uint32
        )
        c = jax.lax.population_count(wb & low).astype(jnp.int32)
        hi = rem >= c
        pos = pos + jnp.where(hi, width, 0)
        rem = rem - jnp.where(hi, c, 0)
    src = blk * L + pos
    valid = jnp.arange(capacity) < jnp.minimum(total, capacity)
    return src, valid, total


def extract_sparse_z2(
    feats_packed: jnp.ndarray,   # [X, T, Y, 2C] packed volume (xzy)
    keep: jnp.ndarray,           # [X, 2T, Y] bool, logical cells
    box: Box,
    stride: int,
    capacity: int,
    extra: Optional[jnp.ndarray] = None,   # [X, 2T, Y, E] logical
    #                              or PACKED [X, T, Y, 2E] (same X/T/Y as
    #                              feats): rides the SAME gather as feats
    extra_packed: bool = False,
    gather_feats: bool = True,   # False: the returned grid's feats are
    #                              zeros (no payload gather) — for grids
    #                              whose consumers only read coords/mask
    #                              (+extra), e.g. the dec sem extractions
    stream: bool = False,        # route the payload move through the
    #                              stream-compact Pallas kernel
    #                              (ops/pallas_extract.py) — TPU inference
    #                              only; output order becomes
    #                              (packed-row, slot) with interleaved
    #                              invalid pad rows, which every consumer
    #                              (coords/mask-driven) tolerates
) -> Tuple[SparseGrid, Optional[jnp.ndarray]]:
    """:func:`extract_sparse` for a z-pair-packed volume: gathers packed
    rows and selects the slot half per kept cell — no unpack relayout.

    Coordinates are computed arithmetically from the compacted source
    index (the gather of a coords volume cost ~5 ms/call at the scale-1
    shape — row gathers on this chip are per-row bound).  A packed
    ``extra`` is lane-concatenated with the features so the payload moves
    in ONE wide gather instead of two.
    """
    X, T, Y, c2 = feats_packed.shape
    c = c2 // 2
    Z = 2 * T
    n = X * Z * Y
    keep_f = keep.reshape(n)

    fused = extra is not None and extra_packed
    if stream and (fused or gather_feats):
        from pasco_tpu.ops.pallas_extract import stream_extract_z2

        if fused and not gather_feats:
            payload = extra
        elif fused:
            # slot-major lane order [C_lo|E_lo|C_hi|E_hi]: the kernel's
            # z-slot fold selects contiguous lane halves.
            e_half = extra.shape[-1] // 2
            payload = jnp.concatenate(
                [
                    feats_packed[..., :c],
                    extra[..., :e_half].astype(feats_packed.dtype),
                    feats_packed[..., c:],
                    extra[..., e_half:].astype(feats_packed.dtype),
                ],
                axis=-1,
            )
        else:
            payload = feats_packed
        v, src, mask, _ = stream_extract_z2(keep, capacity, payload)
        if fused and not gather_feats:
            extra_vals = v
            vals = jnp.zeros((capacity, c), feats_packed.dtype)
        elif fused:
            vals = v[:, :c]
            extra_vals = v[:, c:]
        else:
            vals = v
        sy = src % Y
        sz = (src // Y) % Z
        sx = src // (Y * Z)
        rel = jnp.stack([sx, sy, sz], axis=-1) * stride + box.minimum[None, :]
        out_coords = jnp.concatenate(
            [
                jnp.zeros((capacity, 1), jnp.int32),
                jnp.where(mask[:, None], rel.astype(jnp.int32), 0),
            ],
            axis=-1,
        )
        grid = SparseGrid(
            coords=out_coords, feats=vals.astype(feats_packed.dtype),
            mask=mask, stride=stride,
        )
        return grid, (extra_vals.astype(extra.dtype) if fused else None)

    src, mask, _ = compact_src(keep_f, capacity)

    sy = src % Y
    sz = (src // Y) % Z
    sx = src // (Y * Z)
    prow = (sx * T + sz // 2) * Y + sy
    odd = (sz % 2 == 1)[:, None]

    if fused and not gather_feats:
        e2 = extra.shape[-1]
        e = e2 // 2
        rows = extra.reshape(-1, e2)[prow]               # [cap, 2E]
        extra_vals = jnp.where(odd, rows[:, e:], rows[:, :e])
        vals = jnp.zeros((capacity, c), feats_packed.dtype)
    elif fused:
        e2 = extra.shape[-1]
        e = e2 // 2
        payload = jnp.concatenate(
            [feats_packed, extra.astype(feats_packed.dtype)], axis=-1
        )
        rows = payload.reshape(-1, c2 + e2)[prow]        # [cap, 2C + 2E]
        vals = jnp.where(odd, rows[:, c : 2 * c], rows[:, :c])
        extra_vals = jnp.where(
            odd, rows[:, c2 + e :], rows[:, c2 : c2 + e]
        )
    elif not gather_feats:
        vals = jnp.zeros((capacity, c), feats_packed.dtype)
    else:
        rows = feats_packed.reshape(-1, c2)[prow]        # [cap, 2C]
        vals = jnp.where(odd, rows[:, c:], rows[:, :c])

    # coords = box.min + stride * (x, y, z), straight from src.
    rel = jnp.stack([sx, sy, sz], axis=-1) * stride + box.minimum[None, :]
    out_coords = jnp.concatenate(
        [
            jnp.zeros((capacity, 1), jnp.int32),
            jnp.where(mask[:, None], rel.astype(jnp.int32), 0),
        ],
        axis=-1,
    )
    out_feats = jnp.where(mask[:, None], vals, 0)
    grid = SparseGrid(coords=out_coords, feats=out_feats, mask=mask, stride=stride)
    out_extra = None
    if fused:
        out_extra = jnp.where(mask[:, None], extra_vals, 0)
    elif extra is not None:
        e = extra.shape[-1]
        out_extra = jnp.where(mask[:, None], extra.reshape(n, e)[src], 0)
    return grid, out_extra


def cap_keep_gumbel(
    keep: jnp.ndarray,        # [X, Y, Z] bool
    score: jnp.ndarray,       # [X, Y, Z] sampling weight (>= 0)
    cap: int,
    rng: jnp.ndarray,
    iters: int = 24,
) -> jnp.ndarray:
    """Train-time occupancy capping on a dense keep mask.

    The reference caps the voxels surviving each decoder scale with
    weighted ``torch.multinomial`` sampling (``decoder_v3.py:347-377``);
    sampling-without-replacement ∝ score is exactly Gumbel-top-k on
    ``log score``.  A 4M-cell ``top_k`` is a full sort on TPU, so the
    k-th value is found by bisecting a threshold with counting passes
    (``iters`` halvings bound the count error to a handful of cells —
    statistically immaterial for a stochastic regulariser).  No-op when
    the keep count is already within ``cap``.
    """
    z = jnp.where(
        keep,
        jnp.log(jnp.maximum(score.astype(jnp.float32), 1e-20))
        + jax.random.gumbel(rng, keep.shape, jnp.float32),
        -jnp.inf,
    )
    n_keep = jnp.sum(keep)

    lo = jnp.float32(-60.0)   # log(1e-20) - gumbel tail
    hi = jnp.float32(60.0)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(z > mid)
        # too many kept -> raise threshold
        return jnp.where(cnt > cap, mid, lo), jnp.where(cnt > cap, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    capped = keep & (z > hi)
    return jnp.where(n_keep > cap, capped, keep)


def extract_sparse(
    feats: jnp.ndarray,        # [X, Y, Z, C]
    keep: jnp.ndarray,         # [X, Y, Z] bool
    box: Box,
    stride: int,
    capacity: int,
    extra: Optional[jnp.ndarray] = None,   # [X, Y, Z, E] carried along
    axis_order: str = "xyz",
    gather_feats: bool = True,
) -> Tuple[SparseGrid, Optional[jnp.ndarray]]:
    """Compact kept cells into a padded :class:`SparseGrid`.

    Source indices come from :func:`compact_src` (two-level blocked
    compaction — direct payload scatters ran at ~3.5 GB/s on this chip,
    a full-index scatter was update-count bound at ~42 ms, and the
    searchsorted inversion lowered to a 23-iteration while-loop); the
    payload then moves as pure gathers.  Surplus beyond ``capacity`` is
    dropped tail-first; the caps rarely bind at eval (the reference skips
    capping at test, ``decoder_v3.py:347``).
    """
    X, Y, Z, c = feats.shape
    n = X * Y * Z
    keep_f = keep.reshape(n)
    src, mask, _ = compact_src(keep_f, capacity)

    # coords arithmetically from the flat source index (no gather).
    if axis_order == "xzy":
        sy = src % Z          # [X, Z, Y, C]: dims are (X, z, y)
        sz = (src // Z) % Y
        sx = src // (Z * Y)
        rel = jnp.stack([sx, sy, sz], axis=-1)
    else:
        sz = src % Z
        sy = (src // Z) % Y
        sx = src // (Z * Y)
        rel = jnp.stack([sx, sy, sz], axis=-1)
    rel = rel * stride + box.minimum[None, :]
    out_coords = jnp.concatenate(
        [
            jnp.zeros((capacity, 1), jnp.int32),
            jnp.where(mask[:, None], rel.astype(jnp.int32), 0),
        ],
        axis=-1,
    )
    if gather_feats:
        out_feats = jnp.where(mask[:, None], feats.reshape(n, c)[src], 0)
    else:
        out_feats = jnp.zeros((capacity, c), feats.dtype)
    grid = SparseGrid(coords=out_coords, feats=out_feats, mask=mask, stride=stride)
    out_extra = None
    if extra is not None:
        e = extra.shape[-1]
        out_extra = jnp.where(mask[:, None], extra.reshape(n, e)[src], 0)
    return grid, out_extra


def scatter_max_rows(
    f: jnp.ndarray,            # [P, C] point features
    flat_idx: jnp.ndarray,     # [P] int32 destination row (== n_rows: dump)
    n_rows: int,
    neg,                       # fill value (-inf in the feature dtype)
) -> jnp.ndarray:
    """Per-channel scatter-max of ``f`` into a ``[n_rows + 1, C]`` table
    initialised to ``neg`` (same contract as
    ``full(...).at[flat_idx].max(f)``).

    XLA:TPU lowers a conflicting scatter-max to a serialised
    read-modify-write (profiled at 5 GB/s, ~12 ms/scan for the s1
    featurizer scatter).  This form makes every write conflict-free:
    sort points by destination row, run a segmented cumulative max
    (``associative_scan`` over (key, value) — O(log P) vector passes),
    and scatter only each run's LAST element with ``unique_indices``.
    Dump rows keep index ``n_rows + 1`` (out of bounds) so ``mode=drop``
    removes them before the scatter — the remaining indices are unique.
    """
    P, C = f.shape
    keys = flat_idx.astype(jnp.int32)
    order = jnp.argsort(keys)
    sk = keys[order]
    sf = jnp.take(f, order, axis=0)

    def comb(a, b):
        ka, va = a
        kb, vb = b
        return kb, jnp.where((ka == kb)[:, None], jnp.maximum(va, vb), vb)

    _, cm = jax.lax.associative_scan(comb, (sk, sf))
    last = jnp.concatenate(
        [sk[1:] != sk[:-1], jnp.ones((1,), bool)]
    )
    # n_rows is the caller's dump row; n_rows + 1 is OUT OF BOUNDS for the
    # (n_rows + 1)-row table -> dropped, so written indices are unique.
    rows = jnp.where(last & (sk < n_rows), sk, n_rows + 1)
    return (
        jnp.full((n_rows + 1, C), neg, f.dtype)
        .at[rows]
        .max(cm, mode="drop", unique_indices=True)
    )
