"""Paged KV-cache device layout and in-place update ops.

TPU-native replacement for the reference's four CUDA cache layouts
(``llm_engine.cc:122-162``): ONE canonical paged layout chosen for TPU
gather/scatter efficiency (SURVEY.md section 7.3 "pick one"):

    cache:  stacked [num_kv_heads, L * num_slots, 2 * shd] (k|v PACKED)
    scale:  stacked [L * num_slots, scale_lanes]           (packed rows)

The layer axis lives INSIDE the slot axis (layer ``l``'s slot ``s`` is
row ``l * num_slots + s``), head-major. Head-major-with-layer-inner is
load-bearing twice over: (1) the fused all-layer decode scatter flattens
to ``[KVH * L * num_slots, lanes]`` with the tensor-parallel-sharded
head axis MAJOR, so GSPMD can still express the kv-head sharding on the
merged axis (a layer-major stack puts the sharded axis mid-merge and
XLA silently all-gathers the whole cache to replicated); (2) the
attention kernels' page DMA is the same 3-D ``[KVH, ps, lanes]`` slab
as a per-layer cache, just offset by ``l * num_slots``.

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
    """Allocate the (cache, scale) pair as STACKED arrays
    ``[kv_heads, num_layers * num_slots, 2*shd]`` /
    ``[num_layers * num_slots, scale_lanes]`` (layer inner — see module
    docstring); scale is None when unquantized.

    One stacked array (vs per-layer lists) lets decode-only steps write
    ALL layers' new K/V with a single fused row scatter (measured 3.8x
    faster than 22 per-layer scatters on v5e) and shrinks the donated
    buffer count per dispatch from 2*L to 2. The layer axis must NOT be
    carried through ``lax.scan`` — a scanned carry ping-pongs the whole
    multi-GB cache through fresh buffers each step; the step functions
    are Python-unrolled and update the donated array in place.

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
    cache = jnp.zeros(
        (spec.num_kv_heads, spec.num_layers * spec.num_slots,
         spec.row_lanes), dtype=kv_dtype)
    scale = None
    if spec.quantized:
        scale = jnp.zeros(
            (spec.num_layers * spec.num_slots, spec.scale_lanes),
            dtype=jnp.bfloat16)
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


def _pack_scale_rows(sk: jax.Array, sv: jax.Array, spec: CacheSpec
                     ) -> jax.Array:
    """k/v group scales [..., KVH, G] -> packed rows [..., scale_lanes]
    in lane order (head, k|v, group), zero-padded to the 128 tile."""
    lead = sk.shape[:-2]
    packed = jnp.stack([sk, sv], axis=-2).reshape(
        *lead, spec.num_kv_heads * spec.scale_lane_stride)
    used = packed.shape[-1]
    if used != spec.scale_lanes:
        pad = [(0, 0)] * (packed.ndim - 1) + [(0, spec.scale_lanes - used)]
        packed = jnp.pad(packed, pad)
    return packed


def append_kv(cache: jax.Array, scale: Optional[jax.Array],
              k: jax.Array, v: jax.Array, slots: jax.Array,
              spec: CacheSpec, layer: int = 0
              ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scatter this step's new K/V for ONE layer into the stacked cache.

    cache: [kv_heads, L * num_slots, 2*shd] packed k|v rows
    k, v: [T, kv_heads, head_dim] in compute dtype
    slots: i32[T] (padding tokens -> trash-page slots)

    Used by the prefill path, where layer ``l``'s K/V must be resident
    before its own chunked-causal attention runs. Decode-only steps use
    :func:`append_kv_block` instead (one scatter for all layers).
    """
    # FLAT-VIEW row scatter: scatter into a [KVH * L*S, 2*shd] reshape
    # with computed row indices. A multi-axis `.at[:, slots]` scatter
    # makes XLA prefer a non-default operand layout and insert a FULL
    # cache relayout copy per call (~1.2 ms per 262 MB layer on
    # v5e, traced) — the dominant cost of a decode step. The flat form
    # scatters whole rows in the native layout (reshape is a bitcast),
    # and the head-major flatten keeps the tp-sharded axis GSPMD-visible.
    kvh, ls_slots, _ = cache.shape
    lslots = layer * spec.num_slots + slots

    def row_ids():
        # [KVH, T]: row (h, t) = h * L*S + l*S + slots[t]
        h = jnp.arange(kvh, dtype=slots.dtype)[:, None] * ls_slots
        return (h + lslots[None, :]).reshape(-1)

    if spec.quantized:
        qk, sk = quantize_kv(k, spec.quant_group)
        qv, sv = quantize_kv(v, spec.quant_group)
        rows = pack_kv_rows(qk, qv, spec)          # [T, KVH, 2*shd] int8
        flat = cache.reshape(kvh * ls_slots, spec.row_lanes)
        flat = flat.at[row_ids()].set(
            rows.transpose(1, 0, 2).reshape(-1, spec.row_lanes))
        cache = flat.reshape(cache.shape)
        # packed-row scale layout: one [scale_lanes] row per slot in lane
        # order (head, k|v, group) — a dense row scatter, exactly like the
        # value scatter above (anything else relayouts; see init_cache)
        packed = _pack_scale_rows(sk, sv, spec)    # [T, scale_lanes]
        scale = scale.at[lslots].set(packed)
    else:
        dt = cache.dtype
        rows = pack_kv_rows(k.astype(dt), v.astype(dt), spec)
        flat = cache.reshape(kvh * ls_slots, spec.row_lanes)
        flat = flat.at[row_ids()].set(
            rows.transpose(1, 0, 2).reshape(-1, spec.row_lanes))
        cache = flat.reshape(cache.shape)
    return cache, scale


def append_kv_block(cache: jax.Array, scale: Optional[jax.Array],
                    ks: jax.Array, vs: jax.Array, slots: jax.Array,
                    spec: CacheSpec
                    ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scatter ALL layers' new K/V in one fused row scatter.

    ks, vs: [L, T, kv_heads, head_dim]; slots: i32[T].

    The decode fast path: a decode step's attention handles the current
    token's k/v as an explicit self-term (the deferred-append contract of
    the attention kernels), so the cache write can be batched across the
    whole layer stack after the forward — one scatter instead of L
    (measured 3.8x faster per step on v5e, and the scatter sits off the
    layer-to-layer critical path).
    """
    if spec.quantized:
        qk, sk = quantize_kv(ks, spec.quant_group)
        qv, sv = quantize_kv(vs, spec.quant_group)
        rows = pack_kv_rows(qk, qv, spec)       # [L, T, KVH, 2*shd] int8
        srows = _pack_scale_rows(sk, sv, spec)     # [L, T, scale_lanes]
    else:
        dt = cache.dtype
        rows = pack_kv_rows(ks.astype(dt), vs.astype(dt), spec)
        srows = None
    return append_kv_rows_block(cache, scale, rows, srows, slots, spec)


def append_kv_rows_block(cache: jax.Array, scale: Optional[jax.Array],
                         rows: jax.Array, srows: Optional[jax.Array],
                         slots: jax.Array, spec: CacheSpec,
                         unique: bool = False
                         ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scatter ALL layers' PRE-PACKED new-KV rows in one fused scatter.

    rows: [L, T, KVH, 2*shd] already in the cache dtype (int8 quantized
    when the cache is quantized); srows: [L, T, scale_lanes] packed scale
    rows (None when unquantized).

    The packed-row form is exactly what the layer loop already builds as
    the deferred-prefill attention input, so carrying IT across the layer
    stack (instead of bf16 k/v pairs quantized here at the end) keeps the
    per-step live set at 1 byte/elem: at 7B prefill tiles (T=4128, 32 MHA
    heads) the bf16 form alone was ~2 GB of HLO temps plus a ~1 GB remat
    copy — the difference between fitting and OOM on one v5e.
    """
    kvh, ls_slots, _ = cache.shape
    n_layers = spec.num_layers
    # [L, T] layer-offset slots, flattened in (l, t) order
    lslots = (jnp.arange(n_layers, dtype=slots.dtype)[:, None]
              * spec.num_slots + slots[None, :])

    def row_ids():
        # [KVH, L*T]: row (h, l, t) = h * L*S + l*S + slots[t]
        h = jnp.arange(kvh, dtype=slots.dtype)[:, None] * ls_slots
        return (h + lslots.reshape(-1)[None, :]).reshape(-1)

    # ``unique`` (caller-guaranteed distinct slots, incl. spread trash
    # rows): the hints let XLA use the sparse in-place scatter path. At
    # 7B geometry the unhinted scatter lowered as a full 4.3 GB cache
    # select-sweep per step (traced 2.6 ms vs 0.03 ms sparse).
    kw = (dict(unique_indices=True, mode="promise_in_bounds")
          if unique else {})
    flat = cache.reshape(kvh * ls_slots, spec.row_lanes)
    flat = flat.at[row_ids()].set(
        rows.transpose(2, 0, 1, 3).reshape(-1, spec.row_lanes), **kw)
    cache = flat.reshape(cache.shape)
    if spec.quantized:
        scale = scale.at[lslots.reshape(-1)].set(
            srows.reshape(-1, spec.scale_lanes), **kw)
    return cache, scale


def gather_pages(cache: jax.Array, scale: Optional[jax.Array],
                 page_table: jax.Array, spec: CacheSpec,
                 dtype=jnp.bfloat16, layer: int = 0
                 ) -> Tuple[jax.Array, jax.Array]:
    """Densify rows' KV for one layer from the paged pool (XLA reference
    path only; the Pallas kernels read pages in place).

    cache: stacked [KVH, L * S, 2*shd] (layer inner);
    page_table: i32[B, P] -> k, v: [B, P * page_size, kv_heads, head_dim]
    """
    b, p = page_table.shape
    base = page_table[..., None] * spec.page_size + jnp.arange(
        spec.page_size, dtype=page_table.dtype)
    slots = layer * spec.num_slots + base.reshape(b, p * spec.page_size)
    # [KVH, L*S, 2*shd][:, slots[B, KV]] -> advanced index on axis 1 with
    # a leading basic slice lands the gathered axes after KVH; transpose
    # to [B, KV, KVH, lanes] and unpack the k|v halves
    rows_kv = cache[:, slots]                        # [KVH, B, KV, 2*shd]
    rows_kv = rows_kv.transpose(1, 2, 0, 3)
    k = rows_kv[..., :spec.head_dim]
    v = rows_kv[..., spec.shd:spec.shd + spec.head_dim]
    if spec.quantized:
        # packed-row scale layout [L*S, lanes]: gather rows, unpack lane
        # order (head, k|v, group) -> [B, KV, KVH, 2, G]
        srows = scale[slots][
            ..., : spec.num_kv_heads * spec.scale_lane_stride]
        srows = srows.reshape(b, p * spec.page_size, spec.num_kv_heads, 2,
                              spec.scale_groups)
        k = dequantize_kv(k, srows[..., 0, :], spec.quant_group, dtype)
        v = dequantize_kv(v, srows[..., 1, :], spec.quant_group, dtype)
    else:
        k = k.astype(dtype)
        v = v.astype(dtype)
    return k, v
