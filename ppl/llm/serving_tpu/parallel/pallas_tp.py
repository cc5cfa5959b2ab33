"""shard_map islands for the Pallas kernels under tensor parallelism.

GSPMD has no partitioning rule for a ``pallas_call``: inside a jitted
program over a mesh it would replicate the call — all-gathering the
KV cache and the quantized weights, destroying the sharding the rest of
the program carries. Every Pallas kernel therefore runs inside an
explicit ``jax.shard_map`` island whose specs mirror the engine's
GSPMD shardings (parallel/shardings.py):

- attention: kv heads shard; each device runs the identical kernel on
  its ``KVH/tp`` heads of q / cache / fresh K,V / scales — attention is
  embarrassingly parallel across kv heads, no collective.
- quantized matmuls: column-parallel weights (wqkv, w_gate_up, lm_head)
  shard the out-channel axis with no collective; row-parallel weights
  (wo, w_down) shard the contraction axis and ``psum`` the f32 partials
  over "tp" — the same collective placement GSPMD picks for the float
  path, so XLA's latency-hiding scheduler can overlap it identically.

Numerics note (i8i8/w4a8 row-parallel): the per-token activation scale
is computed over each shard's slice of the contraction axis instead of
globally — a strictly finer-grained quantization. Logits therefore
differ from the single-chip kernel at the act-quant noise level (the
XLA composition path has the same property under GSPMD only for the
dot, not the absmax). Covered by tests/test_pallas_tp.py tolerances.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.kv_cache import CacheSpec


def _tp_size(mesh: Mesh) -> int:
    return mesh.shape["tp"]


def local_cache_spec(spec: CacheSpec, mesh: Mesh) -> CacheSpec:
    """Per-shard CacheSpec (kv heads divided by tp)."""
    tp = _tp_size(mesh)
    if spec.num_kv_heads % tp:
        raise ValueError(f"num_kv_heads {spec.num_kv_heads} not divisible "
                         f"by tp {tp}")
    return dataclasses.replace(spec, num_kv_heads=spec.num_kv_heads // tp)


def _check_scale_shardable(spec: CacheSpec, tp: int) -> None:
    if not spec.quantized:
        return
    lanes_per_shard = (spec.num_kv_heads // tp) * spec.scale_lane_stride
    if (lanes_per_shard % 128
            or spec.num_kv_heads * spec.scale_lane_stride
            != spec.scale_lanes):
        raise ValueError(
            "int8-KV scale rows cannot be head-sharded at this geometry "
            f"(per-shard lanes {lanes_per_shard} must be a 128 multiple "
            "with no tail padding); use attention_impl=xla for this "
            "tp size or pad kv heads")


def sharded_decode_attention(mesh: Mesh, q, cache, scale, page_table,
                             context_len, spec: CacheSpec, *, layer: int,
                             fresh_k, fresh_v, seq_block: int = 4,
                             interpret: bool = False,
                             alibi: Optional[jax.Array] = None,
                             tail_kv=None, tail_scale=None,
                             tail_len=None):
    """paged_decode_attention over a kv-head-sharded mesh."""
    from ..ops.pallas import paged_attention as pallas_attn

    tp = _tp_size(mesh)
    _check_scale_shardable(spec, tp)
    spec_l = local_cache_spec(spec, mesh)
    quant = spec.quantized
    has_alibi = alibi is not None
    tail = tail_kv is not None

    def inner(q, cache, scale, pt, ctx, fk, fv, al, tkv, ts, tl):
        return pallas_attn.paged_decode_attention(
            q, cache, scale if quant else None, pt, ctx, spec_l,
            layer=layer, fresh_k=fk, fresh_v=fv, seq_block=seq_block,
            interpret=interpret, alibi=al if has_alibi else None,
            tail_kv=tkv if tail else None,
            tail_scale=(ts if tail and quant else None),
            tail_len=tl if tail else None)

    if scale is None or getattr(scale, "ndim", 0) != 2:
        scale = jnp.zeros((1, 128), jnp.bfloat16)
        scale_spec = P(None, None)
    else:
        scale_spec = P(None, "tp")
    if alibi is None:
        alibi = jnp.zeros((q.shape[1],), jnp.float32)
    if tail:
        # rows [L, B, KVH, J, lanes]: kv heads shard; scale rows'
        # lane order is head-major, so the lane axis shards like the
        # main packed scale rows
        tkv_spec = P(None, None, "tp", None, None)
        ts_spec = P(None, None, None, "tp")
        if tail_scale is None:
            tail_scale = jnp.zeros((1, 1, 1, 128), jnp.bfloat16)
            ts_spec = P(None, None, None, None)
        tl = jnp.asarray(tail_len, jnp.int32).reshape(1)
    else:
        tail_kv = jnp.zeros((1, 1, 1, 1, 128), cache.dtype)
        tail_scale = jnp.zeros((1, 1, 1, 128), jnp.bfloat16)
        tkv_spec = P(None, None, None, None, None)
        ts_spec = P(None, None, None, None)
        tl = jnp.zeros((1,), jnp.int32)
    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, "tp", None), P("tp", None, None), scale_spec,
                  P(None, None), P(None), P(None, "tp", None),
                  P(None, "tp", None), P("tp"), tkv_spec, ts_spec,
                  P(None)),
        out_specs=P(None, "tp", None),
        check_vma=False,  # pallas_call carries no vma info
    )(q, cache, scale, page_table, context_len, fresh_k, fresh_v, alibi,
      tail_kv, tail_scale, tl)


def sharded_prefill_attention(mesh: Mesh, q, cache, scale, page_table,
                              start, new_len, spec: CacheSpec, *,
                              layer: int, fresh_kv=None, fresh_scale=None,
                              interpret: bool = False,
                              alibi: Optional[jax.Array] = None):
    """paged_prefill_attention over a kv-head-sharded mesh."""
    import jax.numpy as jnp

    from ..ops.pallas import paged_attention as pallas_attn

    tp = _tp_size(mesh)
    _check_scale_shardable(spec, tp)
    spec_l = local_cache_spec(spec, mesh)
    quant = spec.quantized
    has_alibi = alibi is not None
    deferred = fresh_kv is not None

    def inner(q, cache, scale, pt, st, nl, fkv, fs, al):
        return pallas_attn.paged_prefill_attention(
            q, cache, scale if quant else None, pt, st, nl, spec_l,
            layer=layer, fresh_kv=fkv if deferred else None,
            fresh_scale=(fs if deferred and quant else None),
            interpret=interpret, alibi=al if has_alibi else None)

    if scale is None or getattr(scale, "ndim", 0) != 2:
        scale = jnp.zeros((1, 128), jnp.bfloat16)
        scale_spec = P(None, None)
    else:
        scale_spec = P(None, "tp")
    if fresh_kv is None:
        fresh_kv = jnp.zeros((1, spec.num_kv_heads, spec.page_size,
                              spec.row_lanes), cache.dtype)
    if fresh_scale is None:
        fresh_scale = jnp.zeros((1, spec.page_size, 128), jnp.bfloat16)
        fscale_spec = P(None, None, None)
    else:
        fscale_spec = P(None, None, "tp")
    if alibi is None:
        alibi = jnp.zeros((q.shape[2],), jnp.float32)
    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, None, "tp", None), P("tp", None, None),
                  scale_spec, P(None, None), P(None), P(None),
                  P(None, "tp", None, None), fscale_spec, P("tp")),
        out_specs=P(None, None, "tp", None),
        check_vma=False,
    )(q, cache, scale, page_table, start, new_len, fresh_kv, fresh_scale,
      alibi)


# (w_spec, s_spec, out_spec, h_spec, psum_over_tp) per transformer matmul.
# Mirrors _LAYER_SPECS in shardings.py: wqkv/w_gate_up/lm_head are
# column-parallel (no collective), wo/w_down row-parallel (psum).
_W_SPECS = {
    "wqkv": (P(None, "tp", None, None), P("tp", None, None),
             P(None, "tp", None, None), P(None, None), False),
    "wo": (P("tp", None), P(None), P(None, None), P(None, "tp"), True),
    "w_gate_up": (P(None, None, "tp"), P(None, "tp"),
                  P(None, None, "tp"), P(None, None), False),
    "w_down": (P("tp", None), P(None), P(None, None), P(None, "tp"), True),
    "lm_head": (P(None, "tp"), P("tp"), P(None, "tp"), P(None, None),
                False),
}


def make_sharded_quant_matmul(mesh: Mesh, quant_method: str,
                              interpret: bool = False):
    """The fused-Pallas quantized matmul closure for a TP mesh (drop-in
    for _make_matmul's pallas branch in models/llama.py)."""
    from ..ops.pallas import quant_matmul as pallas_quant

    if quant_method == "online_w4a8":
        # int4 nibble pairing strides D/2 over the FULL contraction axis;
        # per-shard repacking hasn't landed (config validation enforces
        # tp == 1 for w4a8)
        raise ValueError("online_w4a8 does not support tensor parallelism")
    kernel = pallas_quant.i8i8_matmul_pallas

    def matmul(h, p, name, out_dtype=jnp.float32):
        w_spec, s_spec, out_spec, h_spec, reduce_tp = _W_SPECS[name]

        def inner(hh, wq, ws):
            # row-parallel matmuls psum in the kernel's output dtype —
            # reference parity: the CUDA engine all-reduces fp16 partials
            # (NCCL inside ppl.nn RowParallel ops)
            out = kernel(hh, wq, ws, interpret=interpret,
                         out_dtype=out_dtype)
            if reduce_tp:
                out = jax.lax.psum(out, "tp")
            return out

        return jax.shard_map(
            inner, mesh=mesh, in_specs=(h_spec, w_spec, s_spec),
            out_specs=out_spec, check_vma=False,
        )(h, p[name + "_q"], p[name + "_s"])

    return matmul
