"""vmap batching of the scalar-prefetch Pallas kernels
(ops/pallas_batch.py custom_vmap rules), interpreter mode.

Round-4 verdict weak #5: batched throughput silently abandoned the Pallas
kernels because ``jax.vmap`` has no rule for scalar-prefetch
``pallas_call``s.  These tests pin the batching semantics: vmapping the
public kernel wrappers equals stacking per-element calls, with weights
shared (in_axes=None-like) and per-element active-tile sets respected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasco_tpu.ops.dense_ops import pack_z2


def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def test_sequential_vmap_mixed_batching():
    from pasco_tpu.ops.pallas_batch import sequential_vmap

    def base(a, b):
        return a * 2 + b.sum()

    f = sequential_vmap(base)
    a = jnp.arange(6.0).reshape(3, 2)
    b = jnp.ones((4,))
    out = jax.vmap(f, in_axes=(0, None))(a, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(a) * 2 + 4.0)
    # unbatched call passes through
    np.testing.assert_allclose(
        np.asarray(f(a[0], b)), np.asarray(a[0]) * 2 + 4.0
    )


def test_vmapped_packed_conv_matches_per_element():
    """vmap(block_sparse_packed_conv) == per-element calls; each element
    has its OWN mask (different active tiles)."""
    from pasco_tpu.ops.pallas_conv import block_sparse_packed_conv

    r = np.random.RandomState(3)
    B, X, Z, Y, C, D = 2, 16, 8, 32, 4, 6
    xs, masks = [], []
    for k in range(B):
        m = r.rand(X, Z, Y) > 0.6
        m[8:] = k == 1          # element 1 keeps extra tiles alive
        x = np.where(m[..., None], r.randn(X, Z, Y, C), 0).astype(np.float32)
        xs.append(pack_z2(jnp.asarray(x)))
        masks.append(m)
    w = jnp.asarray(r.randn(27, C, D).astype(np.float32) * 0.1)
    b = jnp.asarray(r.randn(D).astype(np.float32))
    xb = jnp.stack(xs)
    mb = jnp.stack([jnp.asarray(m) for m in masks])

    with _interpret():
        ref = [
            np.asarray(block_sparse_packed_conv(xs[k], w, masks[k], bias=b))
            for k in range(B)
        ]
        got = np.asarray(
            jax.vmap(
                lambda xi, mi: block_sparse_packed_conv(xi, w, mi, bias=b)
            )(xb, mb)
        )
    for k in range(B):
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-3, atol=2e-3)


def test_vmapped_fused_conv_matches_per_element():
    from pasco_tpu.ops.pallas_conv import (
        active_tiles, conv_plan, fused_packed_conv, pad_stage, stage_mask8)

    r = np.random.RandomState(4)
    B, X, Z, Y, C = 2, 8, 8, 32, 4
    plan = conv_plan(2 * C, 2 * C, Z // 2 + 2, fused=True)
    xw, yt, tb = plan[0], plan[1], plan[2]
    w = jnp.asarray(r.randn(27, C, C).astype(np.float32) * 0.1)
    a = jnp.asarray(1.0 + 0.1 * r.randn(2 * C).astype(np.float32))
    c = jnp.asarray(0.1 * r.randn(2 * C).astype(np.float32))
    bias = jnp.asarray(r.randn(C).astype(np.float32))

    xs, m8s, ids_l, n_l = [], [], [], []
    for k in range(B):
        m = r.rand(X, Z, Y) > (0.3 + 0.3 * k)
        x = np.where(m[..., None], r.randn(X, Z, Y, C), 0).astype(np.float32)
        xp = pad_stage(pack_z2(jnp.asarray(x)))
        m8 = stage_mask8(jnp.asarray(m), 2 * C)
        ids, n = active_tiles(jnp.asarray(m), xw, yt, tb, plan[5])
        xs.append(xp); m8s.append(m8); ids_l.append(ids); n_l.append(n)

    def call(xp, m8, ids, n):
        return fused_packed_conv(
            xp, w, m8, ids, n, affine=(a, c), relu=True, bias=bias,
            out_padded=False, compute_dtype=jnp.float32, plan=plan,
        )

    with _interpret():
        ref = [
            np.asarray(call(xs[k], m8s[k], ids_l[k], n_l[k]))
            for k in range(B)
        ]
        got = np.asarray(
            jax.vmap(call)(
                jnp.stack(xs), jnp.stack(m8s),
                jnp.stack(ids_l), jnp.stack(n_l),
            )
        )
    for k in range(B):
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-3, atol=2e-3)


def test_vmapped_stream_extract_matches_per_element():
    from pasco_tpu.ops.pallas_extract import stream_extract_z2

    r = np.random.RandomState(5)
    B, X, Z, Y, E, cap = 2, 4, 4, 32, 5, 128
    keeps, pays = [], []
    for k in range(B):
        keep = r.rand(X, Z, Y) > 0.7
        pay = r.randn(X, Z // 2, Y, 2 * E).astype(np.float32)
        keeps.append(jnp.asarray(keep)); pays.append(jnp.asarray(pay))

    with _interpret():
        ref = [
            [np.asarray(v) for v in stream_extract_z2(keeps[k], cap, pays[k])]
            for k in range(B)
        ]
        got = jax.vmap(lambda kk, pp: stream_extract_z2(kk, cap, pp))(
            jnp.stack(keeps), jnp.stack(pays)
        )
    for k in range(B):
        for gi, ri in zip([np.asarray(g[k]) for g in got], ref[k]):
            np.testing.assert_allclose(gi, ri, rtol=1e-5, atol=1e-5)
