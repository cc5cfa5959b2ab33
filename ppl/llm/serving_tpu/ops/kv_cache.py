"""Paged KV-cache device layout and in-place update ops.

TPU-native replacement for the reference's four CUDA cache layouts
(``llm_engine.cc:122-162``): ONE canonical paged layout chosen for TPU
gather/scatter efficiency (SURVEY.md section 7.3 "pick one"):

    cache:  per layer [num_kv_heads, num_slots, 2 * shd]   (k|v PACKED)
    scale:  per layer [num_slots, scale_lanes]             (packed rows)

where ``num_slots = (num_pages + 1) * page_size`` — flat token slots, so
a (page, offset) pair addresses slot ``page * page_size + offset``. Each
slot row packs that token's K vector in lanes ``[0, shd)`` and its V
vector in lanes ``[shd, 2*shd)`` (``shd`` = head_dim rounded up to 64
lanes so the packed row is a 128-lane multiple). Three wins over a
separate-K/V padded layout (all traced on v5e):

- zero lane padding for head_dim 64 (k|v fill the 128-lane tile exactly;
  a 128-padded separate layout DOUBLES attention DMA bytes with zeros),
- ONE page DMA fetches both K and V (half the DMA count / latency),
- the per-step scatter writes one row per (head, token) instead of two.

With the head axis OUTSIDE the slot axis, one (head, page) tile is a
contiguous ``[page_size, 2*shd]`` block — the Pallas attention kernels
stream pages HBM->VMEM with single strided-slab DMAs (this is the TPU
analog of the reference's cache_layout knob; layout chosen for the
kernel, not ported). The extra page at index ``num_pages`` is the
*trash page*: writes from padding tokens land there, which keeps every
step's scatter fully dense (no predication) at the cost of one wasted
page.

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
    # Storage lanes per K (or V) half of the packed row. The packed row
    # is [k(shd) | v(shd)] = 2*shd lanes, which must be a 128-multiple
    # for the Pallas kernels' page DMAs (Mosaic rejects sub-128 /
    # unaligned minor-dim HBM slices) -> shd = head_dim rounded up to a
    # 64-lane multiple. None = head_dim (XLA reference path, any value).
    storage_head_dim: Optional[int] = None

    @property
    def shd(self) -> int:
        return self.storage_head_dim or self.head_dim

    @property
    def row_lanes(self) -> int:
        """Packed k|v row width."""
        return 2 * self.shd

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
        (spec.num_kv_heads, spec.num_slots, spec.row_lanes), dtype=kv_dtype)
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


def pack_kv_rows(k: jax.Array, v: jax.Array, spec: CacheSpec) -> jax.Array:
    """[T, KVH, hd] k and v -> packed rows [T, KVH, 2*shd] = [k | v],
    each half zero-padded to ``shd`` lanes."""
    pad = spec.shd - k.shape[-1]
    if pad:
        padding = ((0, 0),) * (k.ndim - 1) + ((0, pad),)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
    return jnp.concatenate([k, v], axis=-1)


def append_kv(cache_layer: jax.Array, scale_layer: Optional[jax.Array],
              k: jax.Array, v: jax.Array, slots: jax.Array,
              spec: CacheSpec) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scatter this step's new K/V into one layer's cache at ``slots``.

    cache_layer: [kv_heads, num_slots, 2*shd] packed k|v rows
    k, v: [T, kv_heads, head_dim] in compute dtype
    slots: i32[T] (padding tokens -> trash-page slots)
    """
    # FLAT-VIEW row scatter: scatter into a [KVH*S, 2*shd] reshape with
    # computed row indices. A multi-axis `.at[:, slots]` scatter makes
    # XLA prefer a non-default operand layout and insert a FULL
    # cache-layer relayout copy per call (~1.2 ms per 262 MB layer on
    # v5e, traced) — the dominant cost of a decode step. The flat form
    # scatters whole rows in the native layout (reshape is a bitcast).
    kvh = spec.num_kv_heads
    s_slots = cache_layer.shape[1]

    def row_ids():
        # [KVH, T]: row (h, t) = h * S + slots[t]
        h = jnp.arange(kvh, dtype=slots.dtype)[:, None] * s_slots
        return (h + slots[None, :]).reshape(-1)

    t = slots.shape[0]
    if spec.quantized:
        qk, sk = quantize_kv(k, spec.quant_group)
        qv, sv = quantize_kv(v, spec.quant_group)
        rows = pack_kv_rows(qk, qv, spec)          # [T, KVH, 2*shd] int8
        flat = cache_layer.reshape(kvh * s_slots, spec.row_lanes)
        flat = flat.at[row_ids()].set(
            rows.transpose(1, 0, 2).reshape(-1, spec.row_lanes))
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
        dt = cache_layer.dtype
        rows = pack_kv_rows(k.astype(dt), v.astype(dt), spec)
        flat = cache_layer.reshape(kvh * s_slots, spec.row_lanes)
        flat = flat.at[row_ids()].set(
            rows.transpose(1, 0, 2).reshape(-1, spec.row_lanes))
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
    # [KVH, S, 2*shd][:, slots[B, KV]] -> advanced index on axis 1 with a
    # leading basic slice lands the gathered axes after KVH; transpose to
    # [B, KV, KVH, lanes] and unpack the k|v halves
    rows_kv = cache_layer[:, slots]                  # [KVH, B, KV, 2*shd]
    rows_kv = rows_kv.transpose(1, 2, 0, 3)
    k = rows_kv[..., :spec.head_dim]
    v = rows_kv[..., spec.shd:spec.shd + spec.head_dim]
    if spec.quantized:
        # packed-row scale layout [S, lanes]: gather rows, unpack lane
        # order (head, k|v, group) -> [B, KV, KVH, 2, G]
        srows = scale_layer[slots][
            ..., : spec.num_kv_heads * spec.scale_lane_stride]
        srows = srows.reshape(b, p * spec.page_size, spec.num_kv_heads, 2,
                              spec.scale_groups)
        k = dequantize_kv(k, srows[..., 0, :], spec.quant_group, dtype)
        v = dequantize_kv(v, srows[..., 1, :], spec.quant_group, dtype)
    else:
        k = k.astype(dtype)
        v = v.astype(dtype)
    return k, v
