"""Paged KV-cache device layout and in-place update ops.

TPU-native replacement for the reference's four CUDA cache layouts
(``llm_engine.cc:122-162``): ONE canonical paged layout chosen for TPU
gather/scatter efficiency (SURVEY.md section 7.3 "pick one"):

    cache:  [num_layers, 2, num_kv_heads, num_slots, head_dim]
    scale:  [num_layers, 2, num_kv_heads, num_slots, head_dim // group]

where ``num_slots = (num_pages + 1) * page_size`` — flat token slots, so a
(page, offset) pair addresses slot ``page * page_size + offset``. With the
head axis OUTSIDE the slot axis, one (head, page) tile is a contiguous
``[page_size, head_dim]`` block — the Pallas attention kernels stream
pages HBM->VMEM with single contiguous DMAs (this is the TPU analog of
the reference's cache_layout knob; layout chosen for the kernel, not
ported). The extra page at index ``num_pages`` is the *trash page*:
writes from padding tokens land there, which keeps every step's scatter
fully dense (no predication) at the cost of one wasted page.

KV heads are the tensor-parallel sharding axis (reference shards
``num_kv_heads / tp`` in every cache shape, ``llm_engine.cc:122-162``).

INT8 KV quantization matches the reference scheme (cache_quant_bit=8,
cache_quant_group=8, ``llm_generator.cc:131-137``): symmetric per-group
absmax scales over groups of 8 elements along head_dim.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CacheSpec:
    num_layers: int
    num_pages: int  # usable pages (excludes the trash page)
    page_size: int
    num_kv_heads: int
    head_dim: int
    quant_bit: int = 0  # 0 (= dtype below) or 8 (int8 + per-group scales)
    quant_group: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    # Physical minor-dim of the cache. TPU HBM layouts tile the minor dim
    # to 128 lanes regardless, so padding head_dim<128 up to 128 costs no
    # extra memory and is REQUIRED for the Pallas kernels' page DMAs
    # (Mosaic rejects sub-128 minor-dim HBM slices). None = head_dim.
    storage_head_dim: Optional[int] = None

    @property
    def shd(self) -> int:
        return self.storage_head_dim or self.head_dim

    @property
    def num_slots(self) -> int:
        return (self.num_pages + 1) * self.page_size

    @property
    def trash_page(self) -> int:
        return self.num_pages

    @property
    def quantized(self) -> bool:
        return self.quant_bit == 8

    @property
    def scale_groups(self) -> int:
        return max(self.head_dim // self.quant_group, 1)

    @property
    def scale_lane_stride(self) -> int:
        """Lanes per kv head in the packed scale row: k then v groups."""
        return 2 * self.scale_groups

    @property
    def scale_lanes(self) -> int:
        """Packed scale-row width, padded to the 128-lane tile."""
        return -(-self.num_kv_heads * self.scale_lane_stride // 128) * 128


def init_cache(spec: CacheSpec):
    """Allocate the (cache, scale) pair as PER-LAYER LISTS of
    [2, kv_heads, num_slots, head_dim] arrays; scale is None when
    unquantized.

    Per-layer arrays (not one stacked [L, ...] array scanned over) are
    load-bearing for performance: carrying a stacked cache through
    ``lax.scan`` makes XLA assemble a fresh ys buffer every step — a
    full multi-GB cache copy per layer per step. Separate donated arrays
    update truly in place.

    Scales use a PACKED-ROW layout [num_slots, scale_lanes]: one row per
    token slot holding every head's k+v group scales in lane order
    (head, k|v, group), zero-padded to a 128-lane multiple. Two reasons:

    - The per-step scale WRITE is then the same dense row scatter as the
      values (flat-view trick below). The previous slot-minor layout
      [2, KVH, groups, slots] made XLA run every scale scatter in a
      transposed operand layout and insert a full relayout copy of the
      scale array per layer per step — traced at ~75% of int8-KV decode
      device time (~12 ms/step on TinyLlama/v5e).
    - The kernels' per-page scale DMA slices rows [page*ps : +ps, :],
      whose minor dim is the full 128-aligned lane axis (Mosaic rejects
      sub-128 minor-dim HBM slices, so a [.., slots, groups] layout with
      groups minor is not DMA-able).
    """
    kv_dtype = jnp.int8 if spec.quantized else spec.dtype
    cache = [jnp.zeros(
        (2, spec.num_kv_heads, spec.num_slots, spec.shd), dtype=kv_dtype)
        for _ in range(spec.num_layers)]
    scale = None
    if spec.quantized:
        scale = [jnp.zeros(
            (spec.num_slots, spec.scale_lanes),
            dtype=jnp.bfloat16) for _ in range(spec.num_layers)]
    return cache, scale


def quantize_kv(x: jax.Array, group: int) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-group int8 quantization along the last dim.

    x: [..., head_dim] -> (int8 values [..., head_dim],
                           scales [..., head_dim // group])
    """
    shape = x.shape
    g = x.reshape(*shape[:-1], shape[-1] // group, group).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(g), axis=-1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-8), 0.0)
    q = jnp.clip(jnp.round(g * inv[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(shape), scale.astype(jnp.bfloat16)


def dequantize_kv(q: jax.Array, scale: jax.Array, group: int,
                  dtype=jnp.bfloat16) -> jax.Array:
    """Inverse of :func:`quantize_kv`."""
    shape = q.shape
    g = q.reshape(*shape[:-1], shape[-1] // group, group).astype(jnp.float32)
    out = g * scale.astype(jnp.float32)[..., None]
    return out.reshape(shape).astype(dtype)


def token_slots(page_table: jax.Array, positions: jax.Array,
                rows: jax.Array, page_size: int) -> jax.Array:
    """Flat cache slots for tokens at ``positions`` of batch ``rows``.

    page_table: i32[B, PMAX]; positions/rows: i32[T] -> slots i32[T].
    Out-of-range positions must have been pointed at the trash page by the
    host-side page table fill.
    """
    page_idx = positions // page_size
    offset = positions % page_size
    pages = page_table[rows, page_idx]
    return pages * page_size + offset


def append_kv(cache_layer: jax.Array, scale_layer: Optional[jax.Array],
              k: jax.Array, v: jax.Array, slots: jax.Array,
              spec: CacheSpec) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scatter this step's new K/V into one layer's cache at ``slots``.

    cache_layer: [2, kv_heads, num_slots, head_dim] (int8 or dtype)
    k, v: [T, kv_heads, head_dim] in compute dtype
    slots: i32[T] (padding tokens -> trash-page slots)
    """
    # FLAT-VIEW row scatter: scatter into a [2*KVH*S, head_dim] reshape
    # with computed row indices. A multi-axis `.at[0, :, slots]` scatter
    # makes XLA prefer a non-default operand layout and insert a FULL
    # cache-layer relayout copy per call (~1.2 ms per 262 MB layer on
    # v5e, traced) — the dominant cost of a decode step. The flat form
    # scatters whole rows in the native layout (reshape is a bitcast).
    kvh = spec.num_kv_heads
    s_slots = cache_layer.shape[2]
    t = slots.shape[0]

    def row_ids():
        # [2, KVH, T]: row (c, h, t) = ((c * KVH) + h) * S + slots[t]
        ch = jnp.arange(2 * kvh, dtype=slots.dtype)[:, None] * s_slots
        return (ch + slots[None, :]).reshape(-1)

    def pack(a, b):
        # k [T, KVH, shd], v [T, KVH, shd] -> [2*KVH*T, shd] in row order
        return jnp.stack([a, b]).transpose(0, 2, 1, 3).reshape(-1,
                                                               a.shape[-1])

    if spec.quantized:
        qk, sk = quantize_kv(k, spec.quant_group)
        qv, sv = quantize_kv(v, spec.quant_group)
        if spec.shd != spec.head_dim:
            pad = ((0, 0), (0, 0), (0, spec.shd - spec.head_dim))
            qk = jnp.pad(qk, pad)
            qv = jnp.pad(qv, pad)
        flat = cache_layer.reshape(2 * kvh * s_slots, spec.shd)
        flat = flat.at[row_ids()].set(pack(qk, qv))
        cache_layer = flat.reshape(cache_layer.shape)
        # packed-row scale layout: one [scale_lanes] row per slot in lane
        # order (head, k|v, group) — a dense row scatter, exactly like the
        # value scatter above (anything else relayouts; see init_cache)
        packed = jnp.stack([sk, sv], axis=2).reshape(
            t, kvh * spec.scale_lane_stride)      # [T, KVH*2*G]
        if packed.shape[1] != spec.scale_lanes:
            packed = jnp.pad(
                packed, ((0, 0), (0, spec.scale_lanes - packed.shape[1])))
        scale_layer = scale_layer.at[slots].set(packed)
    else:
        if spec.shd != spec.head_dim:
            pad = ((0, 0), (0, 0), (0, spec.shd - spec.head_dim))
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        dt = cache_layer.dtype
        flat = cache_layer.reshape(2 * kvh * s_slots, spec.shd)
        flat = flat.at[row_ids()].set(pack(k.astype(dt), v.astype(dt)))
        cache_layer = flat.reshape(cache_layer.shape)
    return cache_layer, scale_layer


def gather_pages(cache_layer: jax.Array, scale_layer: Optional[jax.Array],
                 page_table: jax.Array, spec: CacheSpec,
                 dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Densify rows' KV from the paged pool (XLA reference path only; the
    Pallas kernels read pages in place).

    page_table: i32[B, P] -> k, v: [B, P * page_size, kv_heads, head_dim]
    """
    b, p = page_table.shape
    base = page_table[..., None] * spec.page_size + jnp.arange(
        spec.page_size, dtype=page_table.dtype)
    slots = base.reshape(b, p * spec.page_size)
    # [2, KVH, S, shd][0, :, slots[B, KV]]: scalar + array advanced indices
    # broadcast and land first -> [B, KV, KVH, shd]; slice off storage pad
    k = cache_layer[0, :, slots][..., :spec.head_dim]
    v = cache_layer[1, :, slots][..., :spec.head_dim]
    if spec.quantized:
        # packed-row scale layout [S, lanes]: gather rows, unpack lane
        # order (head, k|v, group) -> [B, KV, KVH, 2, G]
        rows = scale_layer[slots][
            ..., : spec.num_kv_heads * spec.scale_lane_stride]
        rows = rows.reshape(b, p * spec.page_size, spec.num_kv_heads, 2,
                            spec.scale_groups)
        k = dequantize_kv(k, rows[..., 0, :], spec.quant_group, dtype)
        v = dequantize_kv(v, rows[..., 1, :], spec.quant_group, dtype)
    else:
        k = k.astype(dtype)
        v = v.astype(dtype)
    return k, v
