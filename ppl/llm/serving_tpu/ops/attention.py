"""Attention over the paged KV cache — XLA reference implementations.

These are the correctness-reference implementations used by CPU tests and
as the fallback attention path; the Pallas TPU kernels in
:mod:`.pallas.paged_attention` implement the same contracts without
materializing gathered KV (the TPU replacement for the reference's CUDA
decoding-attention kernel family, ``resource_manager.cc:74-112``).

Contracts (per layer):

- decode: one new query token per row, attends to cache[0:context_len).
- prefill: ``new_len`` new query tokens per row starting at absolute
  position ``start`` (start > 0 == prefix-cache-hit continuation, the
  reference's ``ENGINE_CONF_CACHE_PREFILL`` path, ``llm_engine.cc:114``);
  causal within the new tokens, full visibility of the cached prefix.
  This step's K/V must already be appended to the cache.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .kv_cache import CacheSpec, gather_pages

_NEG_INF = -1e30


def alibi_slopes(num_heads: int) -> jax.Array:
    """Per-head ALiBi slopes (Press et al.), f32[num_heads].

    Power-of-two head counts use the geometric sequence 2^(-8h/n); other
    counts interleave the next power's odd terms (the standard published
    recipe, matching HF/Baichuan).
    """
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        s = pow2_slopes(num_heads)
    else:
        closest = 2 ** int(math.floor(math.log2(num_heads)))
        s = pow2_slopes(closest)
        extra = pow2_slopes(2 * closest)[0::2]
        s += extra[: num_heads - closest]
    return jnp.asarray(s, jnp.float32)


def _alibi_bias(slopes: jax.Array, kv_len: int) -> jax.Array:
    """[H, KV] bias ``slope_h * k_pos``.

    The canonical ALiBi penalty is ``-slope * (q_pos - k_pos)``; adding
    the per-query constant ``slope * q_pos`` (softmax-invariant) reduces
    it to ``slope * k_pos``, which needs no query positions at all.
    """
    k_pos = jnp.arange(kv_len, dtype=jnp.float32)
    return slopes[:, None] * k_pos[None, :]


def _gqa_expand(x: jax.Array, num_q_heads: int) -> jax.Array:
    """[..., kv_heads, d] -> [..., q_heads, d] by group repetition."""
    kv_heads = x.shape[-2]
    if kv_heads == num_q_heads:
        return x
    reps = num_q_heads // kv_heads
    return jnp.repeat(x, reps, axis=-2)


def decode_attention_ref(
    q: jax.Array,                # [B, q_heads, head_dim]
    cache: jax.Array,            # [kv_heads, L*num_slots, 2*shd] stacked
    scale: Optional[jax.Array],
    page_table: jax.Array,       # i32[B, P]
    context_len: jax.Array,      # i32[B] (kv length incl. this token)
    spec: CacheSpec,
    alibi: Optional[jax.Array] = None,   # f32[q_heads] slopes
    layer: int = 0,
    fresh_k: Optional[jax.Array] = None,  # [B, kv_heads, hd] deferred-append
    fresh_v: Optional[jax.Array] = None,
) -> jax.Array:                  # [B, q_heads, head_dim]
    """One new query token per row over cache[layer].

    Deferred-append mode (``fresh_k/v`` given): the current token's K/V
    has NOT been scattered yet — the cache holds ``context_len - 1``
    tokens and the fresh vectors enter as an explicit self-term (the
    decode fast path batches the cache write across all layers after the
    forward, ops.kv_cache.append_kv_block)."""
    b, num_q_heads, head_dim = q.shape
    k, v = gather_pages(cache, scale, page_table, spec,
                        dtype=q.dtype, layer=layer)  # [B, KV, kv_heads, hd]
    cached_len = context_len
    if fresh_k is not None:
        cached_len = context_len - 1
        k = jnp.concatenate([k, fresh_k.astype(q.dtype)[:, None]], axis=1)
        v = jnp.concatenate([v, fresh_v.astype(q.dtype)[:, None]], axis=1)
    k = _gqa_expand(k, num_q_heads)
    v = _gqa_expand(v, num_q_heads)
    kv_len = k.shape[1]
    scores = jnp.einsum("bhd,bkhd->bhk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(head_dim).astype(jnp.float32)
    if alibi is not None:
        if fresh_k is not None:
            # the self-term column sits at each row's own position
            # (= cached_len), not at a fixed column index
            bias = jnp.concatenate([
                jnp.broadcast_to(jnp.arange(kv_len - 1, dtype=jnp.float32),
                                 (b, kv_len - 1)),
                jnp.maximum(cached_len, 0).astype(jnp.float32)[:, None],
            ], axis=1)                                        # [B, KV]
            scores = scores + alibi[None, :, None] * bias[:, None, :]
        else:
            scores = scores + _alibi_bias(alibi, kv_len)[None]
    if fresh_k is not None:
        mask = jnp.concatenate([
            jnp.arange(kv_len - 1)[None, :] < cached_len[:, None],
            jnp.ones((b, 1), bool),
        ], axis=1)                                            # [B, KV]
    else:
        mask = jnp.arange(kv_len)[None, :] < context_len[:, None]
    scores = jnp.where(mask[:, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhk,bkhd->bhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def prefill_attention_ref(
    q: jax.Array,                # [Bp, Qp, q_heads, head_dim]
    cache: jax.Array,            # [kv_heads, L*num_slots, 2*shd] stacked
    scale: Optional[jax.Array],
    page_table: jax.Array,       # i32[Bp, P]
    start: jax.Array,            # i32[Bp] absolute pos of first new token
    new_len: jax.Array,          # i32[Bp] valid new tokens per row
    spec: CacheSpec,
    alibi: Optional[jax.Array] = None,   # f32[q_heads] slopes
    layer: int = 0,
    fresh_k: Optional[jax.Array] = None,  # [Bp, Qp, kv_heads, hd] deferred
    fresh_v: Optional[jax.Array] = None,
) -> jax.Array:                  # [Bp, Qp, q_heads, head_dim]
    """Deferred-append mode (``fresh_k/v`` given): this step's K/V is not
    in the cache; positions >= start read the fresh tensors instead
    (position p of row b maps to fresh[b, p - start[b]])."""
    bp, qp, num_q_heads, head_dim = q.shape
    k, v = gather_pages(cache, scale, page_table, spec,
                        dtype=q.dtype, layer=layer)  # [Bp, KV, kv_heads, hd]
    if fresh_k is not None:
        kv_len_g = k.shape[1]
        pos = jnp.arange(kv_len_g, dtype=jnp.int32)[None, :]     # [1, KV]
        fidx = jnp.clip(pos - start[:, None], 0, qp - 1)         # [Bp, KV]
        is_fresh = pos >= start[:, None]                         # [Bp, KV]
        fk = jnp.take_along_axis(
            fresh_k.astype(q.dtype), fidx[..., None, None], axis=1)
        fv = jnp.take_along_axis(
            fresh_v.astype(q.dtype), fidx[..., None, None], axis=1)
        k = jnp.where(is_fresh[..., None, None], fk, k)
        v = jnp.where(is_fresh[..., None, None], fv, v)
    k = _gqa_expand(k, num_q_heads)
    v = _gqa_expand(v, num_q_heads)
    kv_len = k.shape[1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(head_dim).astype(jnp.float32)
    if alibi is not None:
        scores = scores + _alibi_bias(alibi, kv_len)[None, :, None, :]
    # query i sits at absolute position start + i; it sees keys [0, start+i]
    q_pos = start[:, None] + jnp.arange(qp)[None, :]            # [Bp, Qp]
    k_idx = jnp.arange(kv_len)[None, None, :]                   # [1, 1, KV]
    causal = k_idx <= q_pos[:, :, None]                         # [Bp, Qp, KV]
    valid_q = jnp.arange(qp)[None, :] < new_len[:, None]        # [Bp, Qp]
    mask = causal & valid_q[:, :, None]
    scores = jnp.where(mask[:, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # fully-masked (padding) query rows: make output zeros, not NaN
    probs = jnp.where(valid_q[:, None, :, None], probs, 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
