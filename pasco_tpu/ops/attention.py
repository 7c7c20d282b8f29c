"""Masked attention ops for the mask transformer.

The reference uses ``nn.MultiheadAttention`` with a boolean ``attn_mask``
(Mask2Former masked cross-attention, ``pasco/models/transformer/blocks.py``).
On TPU the KV set is a padded voxel bucket of up to ~150k rows, so a naive
``[H, Q, N]`` score tensor is fine for FLOPs but heavy on HBM; we stream KV
in chunks with an online softmax (flash-attention style, simplified for the
tiny 100-query Q axis).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_cross_attention(
    q: jnp.ndarray,        # [Q, D]
    k: jnp.ndarray,        # [N, D]
    v: jnp.ndarray,        # [N, D]
    allowed: jnp.ndarray,  # [N, Q] bool — True where key n may attend query q
    num_heads: int,
    chunk: int = 8192,
) -> jnp.ndarray:
    """Multi-head attention with a per-(key, query) boolean mask.

    Queries whose allowed set is empty attend everything — the reference
    flips fully-masked rows to unmasked (``transformer_predictor_v2.py:164``)
    to avoid NaNs from all ``-inf`` rows.

    Returns ``[Q, D]`` (concatenated heads, no output projection).
    """
    nq, d = q.shape
    n = k.shape[0]
    dh = d // num_heads
    assert dh * num_heads == d

    # KV streams in bfloat16: the scan is HBM-bound on reading the chunks;
    # scores/softmax stay f32 via preferred_element_type.
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    qh = (
        q.astype(jnp.bfloat16).reshape(nq, num_heads, dh).transpose(1, 0, 2)
    )  # [H, Q, dh]
    scale = dh**-0.5

    # Degenerate-row fix: a query with zero allowed keys attends all keys.
    any_allowed = jnp.any(allowed, axis=0)  # [Q]
    allowed = jnp.where(any_allowed[None, :], allowed, True)

    # Never pad PAST the KV length: with N << chunk the single chunk would
    # otherwise process chunk/N x dead rows (the 8-device dryrun's 512-row
    # KV ran 64x padded at chunk=32768 — measured as ~12 of its 13 s/step).
    chunk = min(chunk, max(128, -(-n // 128) * 128))
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        k = jnp.pad(k, ((0, pad), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0)))
        allowed = jnp.pad(allowed, ((0, pad), (0, 0)))

    kc = k.reshape(n_chunks, chunk, d)
    vc = v.reshape(n_chunks, chunk, d)
    ac = allowed.reshape(n_chunks, chunk, nq)

    def body(carry, inp):
        m_prev, l_prev, acc = carry
        kb, vb, ab = inp
        kh = kb.reshape(chunk, num_heads, dh).transpose(1, 2, 0)  # [H, dh, c]
        vh = vb.reshape(chunk, num_heads, dh).transpose(1, 0, 2)  # [H, c, dh]
        s = (
            jnp.einsum(
                "hqd,hdc->hqc", qh, kh, preferred_element_type=jnp.float32
            )
            * scale
        )  # [H, Q, c]
        s = jnp.where(ab.transpose(1, 0)[None, :, :], s, NEG_INF)  # [H, Q, c]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "hqc,hcd->hqd", p.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc), None

    init = (
        jnp.full((num_heads, nq), NEG_INF, jnp.float32),
        jnp.zeros((num_heads, nq), jnp.float32),
        jnp.zeros((num_heads, nq, dh), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, (kc, vc, ac))
    # Safe divide: a query whose keys are ALL masked has l == 0 exactly,
    # and a max(l, 1e-20) floor overflows in backward (1/l^2 = 1e40 >
    # f32max -> inf * 0 = NaN).  Valid rows have l >= 1 (the running max
    # contributes exp(0)), so where(l>0) changes nothing for them.
    out = acc / jnp.where(l > 0, l, 1.0)[..., None]
    return out.transpose(1, 0, 2).reshape(nq, d).astype(q.dtype)


def self_attention(
    q: jnp.ndarray,  # [Q, D] projected queries
    k: jnp.ndarray,  # [Q, D] projected keys
    v: jnp.ndarray,  # [Q, D] projected values
    num_heads: int,
) -> jnp.ndarray:
    """Dense self-attention over the (small) query set."""
    nq, d = q.shape
    dh = d // num_heads
    qh = q.reshape(nq, num_heads, dh).transpose(1, 0, 2)
    kh = k.reshape(nq, num_heads, dh).transpose(1, 0, 2)
    vh = v.reshape(nq, num_heads, dh).transpose(1, 0, 2)
    s = jnp.einsum(
        "hqd,hkd->hqk", qh, kh, preferred_element_type=jnp.float32
    ) * (dh**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "hqk,hkd->hqd", p.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    return out.transpose(1, 0, 2).reshape(nq, d).astype(q.dtype)
