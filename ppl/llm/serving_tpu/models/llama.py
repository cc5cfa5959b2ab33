"""LLaMA-family decoder as a single fused serving step.

TPU-native replacement for the reference's ppl.nn ONNX/PMX graph + CUDA
engine (SURVEY.md E1/E2): the whole transformer + sampling is ONE jitted
program per shape bucket. The step processes a mixed continuous batch —
the reference's fused prefill+decode step (``llm_engine.h:40-95``'s
11-tensor contract) re-expressed with static shapes:

    flat tokens  = [ Bd decode tokens | Bp x Qp padded prefill tokens ]

- Dense matmuls (qkv / o / mlp / lm_head) run on the flat [T, D] layout,
  so padding waste is only bucket rounding — MXU-friendly.
- Attention splits into a decode part ([Bd, 1] queries) and a prefill part
  ([Bp, Qp] queries), both reading the paged KV cache, so decode rows
  never pay prefill-length attention compute.
- New K/V are scattered into the paged cache before attention; prefix-hit
  prefill (start > 0) needs no special engine flag, unlike the reference's
  ``ENGINE_CONF_CACHE_PREFILL`` (``llm_engine.cc:114``).
- Sampling + penalties run in the same program; the sampled tokens are the
  only per-step device->host traffic.

Weights are PER-LAYER pytree lists, the KV cache is ONE stacked
[L, ...] array, and the layer loop is unrolled: the donated cache
updates truly in place (a stacked cache scanned with ``lax.scan`` would
force XLA to assemble a fresh multi-GB ys buffer every step — measured
~80 ms/step of pure copy on v5e), and decode-only steps write all
layers' K/V in one fused scatter with the current token entering
attention as a self-term. QKV and gate/up are pre-fused into single
matmuls (the reference
gets this from ppl.pmx's --fused_qkv export, ``docs/llama_guide.md:14-36``)
but laid out so tensor-parallel sharding splits cleanly WITHOUT
resharding:

    wqkv:      [D, KVH, G+2, hd]   (G = q heads per kv head; per kv
               head the G q columns, the k column and the v column sit
               together, so sharding the KVH axis gives each chip whole
               GQA groups — the reference's kv-head TP split,
               llm_engine.cc:122-162)
    w_gate_up: [D, 2, I]           (axis 2 sharding keeps gate/up halves
               aligned per chip; a flat [D, 2I] concat would straddle
               shard boundaries)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import attention as attn_ops
from ..ops import kv_cache as kv_ops
from ..ops import sampling as sampling_ops
from ..ops.kv_cache import CacheSpec


class StepInput(NamedTuple):
    """Device inputs for one continuous-batching step.

    Rows 0..Bd-1 are decode-mode requests (one new token each); rows
    Bd..Bd+Bp-1 are prefill-mode requests (up to Qp new tokens each).
    Padding rows have context_len == 0 and trash-page page-table entries.
    """

    decode_tokens: jax.Array    # i32[Bd]
    decode_pos: jax.Array       # i32[Bd] absolute position of the token
    prefill_tokens: jax.Array   # i32[Bp, Qp]
    prefill_start: jax.Array    # i32[Bp] first new token's absolute position
    prefill_len: jax.Array      # i32[Bp] valid new tokens
    page_table: jax.Array       # i32[Bd+Bp, KVP]
    context_len: jax.Array      # i32[Bd+Bp] kv length after this step
    batch_slots: jax.Array      # i32[Bd+Bp] persistent penalty slots
    sampling: sampling_ops.SamplingParams  # each [Bd+Bp]


def init_params(cfg: ModelConfig, key: jax.Array,
                dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Random-initialized weights (tests/benchmarks; real checkpoints come
    from models.loader)."""
    d, hd = cfg.hidden_dim, cfg.head_dim
    n_q, n_kv, l = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
    g = n_q // n_kv
    keys = jax.random.split(key, 6)

    def w(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    s = d ** -0.5
    layer_keys = jax.random.split(keys[1], l)

    def make_layer(lk):
        k1, k2, k3, k4 = jax.random.split(lk, 4)
        layer = {
            "attn_norm": jnp.ones((d,), dtype),
            "ffn_norm": jnp.ones((d,), dtype),
            "wqkv": w(k1, (d, n_kv, g + 2, hd), s),
            "wo": w(k2, (n_q * hd, d), (n_q * hd) ** -0.5),
            "w_gate_up": w(k3, (d, 2, cfg.intermediate_dim), s),
            "w_down": w(k4, (cfg.intermediate_dim, d),
                        cfg.intermediate_dim ** -0.5),
        }
        if cfg.attn_bias:
            k5, k6 = jax.random.split(k4)
            layer["bqkv"] = w(k5, (n_kv, g + 2, hd), 0.02)
            layer["bo"] = w(k6, (d,), 0.02)
        return layer

    # ONE jitted program for the whole init: per-weight dispatches cost
    # ~0.8 s each through the axon tunnel (~92 of them = minutes of
    # engine startup); a single fused program is one dispatch and its
    # compile is disk-cached
    def build_all(key0, key5, lkeys):
        return {
            "embedding": w(key0, (cfg.vocab_size, d), 1.0),
            # one dict per layer: the layer loop is UNROLLED (the
            # donated cache updates in place; a scanned stacked cache
            # would be copied wholesale every step — see
            # ops.kv_cache.init_cache)
            "layers": [make_layer(lk) for lk in lkeys],
            "final_norm": jnp.ones((d,), dtype),
            "lm_head": w(key5, (d, cfg.vocab_size), s),
        }

    params = jax.jit(build_all)(keys[0], keys[5], list(layer_keys))
    return params


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(dtype) * weight


def apply_rope(x: jax.Array, pos: jax.Array, theta: float) -> jax.Array:
    """HF rotate-half RoPE. x: [T, heads, head_dim], pos: i32[T]."""
    head_dim = x.shape[-1]
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = pos.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, half]
    cos = jnp.cos(angles)[:, None, :]  # [T, 1, half]
    sin = jnp.sin(angles)[:, None, :]
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :half], x32[..., half:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _make_matmul(quant_method, quant_impl: str = "xla"):
    """Build the transformer-matmul closure: float einsum/dot, or dynamic
    per-token i8i8 / groupwise w4a8 via XLA composition or the fused
    Pallas kernels (ops/pallas/quant_matmul.py — stream quantized
    weights once, quantize the activation block in VMEM, int8 MXU
    contraction, scale epilogue). Accepts the legacy bool for i8i8."""
    from ..ops import quant as quant_ops
    if quant_method is True:
        quant_method = "online_i8i8"
    use_i8i8 = quant_method == "online_i8i8"
    use_w4 = quant_method == "online_w4a8"
    interp = quant_impl == "pallas_interpret"
    if quant_impl in ("pallas", "pallas_interpret"):
        from ..ops.pallas import quant_matmul as pallas_quant
        # ``out_dtype``: the Pallas kernels write the consumer's dtype
        # straight from the VMEM epilogue — returning f32 and converting
        # outside the kernel costs an HBM round-trip + convert pass that
        # XLA cannot fuse into a custom call (at 7B prefill tiles ~50 GB
        # of pure convert traffic per step). XLA paths ignore it: their
        # converts fuse for free.
        if use_i8i8:
            def matmul(h, p, name, out_dtype=jnp.float32):
                return pallas_quant.i8i8_matmul_pallas(
                    h, p[name + "_q"], p[name + "_s"], interpret=interp,
                    out_dtype=out_dtype)
            return matmul
        if use_w4:
            def matmul(h, p, name, out_dtype=jnp.float32):
                return pallas_quant.w4a8_matmul_pallas(
                    h, p[name + "_q"], p[name + "_s"], interpret=interp,
                    out_dtype=out_dtype)
            return matmul
    if use_i8i8:
        def matmul(h, p, name, out_dtype=None):
            return quant_ops.i8i8_matmul(h, p[name + "_q"], p[name + "_s"])
        return matmul
    if use_w4:
        def matmul(h, p, name, out_dtype=None):
            return quant_ops.w4a8_matmul(h, p[name + "_q"], p[name + "_s"])
        return matmul

    def matmul(h, p, name, out_dtype=None):
        if p[name].ndim == 2:
            return jnp.dot(h, p[name], preferred_element_type=jnp.float32)
        letters = "kcmn"[: p[name].ndim - 1]
        return jnp.einsum(f"td,d{letters}->t{letters}", h, p[name],
                          preferred_element_type=jnp.float32)
    return matmul


def _make_gate_up_act(matmul, quantized: bool):
    """silu(gate) * up from the fused [D, 2, I] weight.

    Float path: the einsum is written output-layout ``cti`` ([2, T, I])
    — a ``tci`` output makes XLA produce the dot in layout {2,0,1} and
    insert a relayout copy of the full [T, 2, I] activation per layer
    per step (traced at ~25% of decode-block device time at b64). With
    the steps axis leading, ``gu[0]``/``gu[1]`` are layout-free slices,
    and axis 2 (the TP-sharded I axis) is untouched so sharding rules
    are identical."""
    if quantized:
        def gate_up_act(h, p, out_dtype=jnp.float32):
            # fused quantized weight is stored C-leading [2, D, I]; the
            # matmul returns C-leading [2, T, I] (see ops/quant)
            gu = matmul(h, p, "w_gate_up", out_dtype=out_dtype)
            return jax.nn.silu(gu[0]) * gu[1]
        return gate_up_act

    def gate_up_act(h, p, out_dtype=None):
        gu = jnp.einsum("td,dci->cti", h, p["w_gate_up"],
                        preferred_element_type=jnp.float32)
        return jax.nn.silu(gu[0]) * gu[1]
    return gate_up_act


class StepOutput(NamedTuple):
    tokens: jax.Array     # i32[B]
    logprobs: jax.Array   # f32[B]
    kv_cache: jax.Array
    kv_scale: jax.Array   # dummy when unquantized
    count_map: jax.Array  # dummy when penalties disabled
    logits: Optional[jax.Array] = None  # [B, V]; tests only


def quantize_model_params(params: Dict[str, Any],
                          method: str = "online_i8i8",
                          quantize_lm_head: bool = False,
                          free_originals: bool = False) -> Dict[str, Any]:
    """Convert bf16/f32 layer weights to a quantized format: each big
    matmul weight becomes (<name>_q, <name>_s) — int8 + f32
    per-out-channel scales for ``online_i8i8`` (the reference's
    QUANT_METHOD_ONLINE_I8I8), or packed int4 + f32 group-128 scales
    for ``online_w4a8`` (TPU extension; RTN groupwise, AWQ-style).
    Embedding / lm_head / norms stay in the float dtype (matching the
    reference, which quantizes the transformer matmuls via the engine
    and leaves embeddings alone).

    ``free_originals=True`` deletes each float weight's device buffer as
    soon as its quantized copy exists — without it, the full bf16 model
    and the int8 copy coexist in HBM (13.5 GB + 7 GB for LLaMA-2-7B on a
    16 GB v5e: RESOURCE_EXHAUSTED). Only safe when the caller owns the
    input pytree and discards it (create_engine does)."""
    from ..ops import quant as quant_ops

    import numpy as np

    def _free(x):
        if free_originals and hasattr(x, "delete"):
            x.delete()

    new_layers = []
    for lp in params["layers"]:
        nl = {k: v for k, v in lp.items()
              if k not in ("wqkv", "wo", "w_gate_up", "w_down")}
        for name in ("wqkv", "wo", "w_gate_up", "w_down"):
            if method == "online_w4a8":
                q, s = quant_ops.quantize_weight_int4(lp[name])
                if q.ndim == 3:
                    # fused gate|up packed [D/2, 2, I] + scales [G, 2, I]
                    # go C-LEADING for the same Mosaic block-rule reason
                    # as the int8 path below
                    q = q.transpose(1, 0, 2)
                    s = s.transpose(1, 0, 2)
                nl[name + "_q"] = jnp.asarray(np.asarray(q))
                nl[name + "_s"] = jnp.asarray(np.asarray(s))
                _free(lp[name])
                continue
            q, s = quant_ops.quantize_weight(lp[name], contract_axis=0)
            if q.ndim == 3:
                # fused gate|up [D, 2, I] is stored C-LEADING [2, D, I]:
                # the Pallas matmul blocks it as [1, D, bn] slabs (Mosaic
                # constrains only the last two block dims) and no operand
                # reshape is needed, so XLA keeps the default layout
                q = q.transpose(1, 0, 2)
            # host round-trip pins the DEFAULT (row-major) device layout:
            # the quantize computation may hand back a transposed layout
            # (traced: s8 w_gate_up stored {0,1}), and the Pallas matmul's
            # operand layout constraint then forces a full relayout copy
            # of the weight EVERY step (~0.5 ms per 22 MB on v5e)
            nl[name + "_q"] = jnp.asarray(np.asarray(q))
            nl[name + "_s"] = jnp.asarray(np.asarray(s))
            _free(lp[name])
        new_layers.append(nl)
    out = dict(params)
    out["layers"] = new_layers
    if quantize_lm_head:
        # optional beyond-reference extension: at b64 decode the bf16
        # lm_head streams 131 MB/step (24% of all weight bytes in the
        # w4 config); the step fn dispatches on the _q key's presence
        if method == "online_w4a8":
            q, s = quant_ops.quantize_weight_int4(params["lm_head"])
        else:
            q, s = quant_ops.quantize_weight(params["lm_head"],
                                             contract_axis=0)
        out["lm_head_q"] = jnp.asarray(np.asarray(q))
        out["lm_head_s"] = jnp.asarray(np.asarray(s))
        _free(params["lm_head"])
        del out["lm_head"]
    return out


def make_step_fn(cfg: ModelConfig, spec: CacheSpec,
                 enable_penalty: bool = False,
                 return_logits: bool = False,
                 quant_method: str = "none",
                 attn_impl: str = "xla",
                 quant_impl: str = "xla",
                 top_k_cap: int = 0,
                 seq_block: int = 4,
                 greedy_only: bool = False,
                 mesh=None):
    """Build the fused forward+sample step for one model configuration.

    The returned function is pure and jittable; the engine jits it with
    buffer donation for kv_cache / kv_scale / count_map.

    ``attn_impl``: "xla" (gather-based reference), "pallas" (paged DMA
    kernels, TPU), or "pallas_interpret" (kernels in interpreter mode,
    for CPU integration tests). This is the TPU analog of the reference's
    decoding-attention kernel-variant knobs (resource_manager.cc:74-112).

    ``mesh``: tensor-parallel Mesh. GSPMD has no partitioning rule for a
    ``pallas_call`` (it would replicate the call, all-gathering cache and
    weights), so with a mesh every Pallas kernel runs inside a
    ``shard_map`` island (parallel/pallas_tp.py); the XLA paths are left
    to GSPMD unchanged.
    """
    from ..ops.pallas import paged_attention as pallas_attn

    n_q, n_kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps, theta = cfg.norm_eps, cfg.rope_theta
    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    quantized_w = quant_method in ("online_i8i8", "online_w4a8")
    use_pallas = attn_impl in ("pallas", "pallas_interpret")
    interpret = attn_impl == "pallas_interpret"
    if (mesh is not None and quantized_w
            and quant_impl in ("pallas", "pallas_interpret")):
        from ..parallel import pallas_tp
        matmul = pallas_tp.make_sharded_quant_matmul(
            mesh, quant_method if quant_method is not True
            else "online_i8i8",
            interpret=quant_impl == "pallas_interpret")
    else:
        matmul = _make_matmul(quant_method, quant_impl)
    if mesh is not None and use_pallas:
        from functools import partial as _partial

        from ..parallel import pallas_tp
        decode_attn = _partial(pallas_tp.sharded_decode_attention, mesh)
        prefill_attn = _partial(pallas_tp.sharded_prefill_attention, mesh)
    else:
        decode_attn = pallas_attn.paged_decode_attention
        prefill_attn = pallas_attn.paged_prefill_attention
    use_alibi = cfg.position_encoding == "alibi"
    slopes = attn_ops.alibi_slopes(n_q) if use_alibi else None
    attn_bias = cfg.attn_bias
    gate_up_act = _make_gate_up_act(matmul, quantized_w)

    def step(params, kv_cache, kv_scale, count_map,
             inp: StepInput, rng: jax.Array, tail=None,
             defer_scatter: bool = False):
        """One fused forward+sample step.

        ``tail``: (tail_rows [L,B,KVH,J,2*shd], tail_scale_rows
        [L,B,J,lanes] | None, tail_len i32[1]) — block-tail mode for
        multi-step decode blocks (pallas attention only): the paged
        cache is tail_len tokens behind and the block's own K/V streams
        from the side buffer. ``defer_scatter``: skip the cache scatter
        and return (out, rows_l, srows_l, slots) so the caller (the
        decode block) can land ONE scatter per block.
        """
        bd = inp.decode_tokens.shape[0]
        bp, qp = inp.prefill_tokens.shape
        b = bd + bp
        assert tail is None or (use_pallas and bp == 0)

        # ---- flat token metadata ------------------------------------------
        prefill_pos = (inp.prefill_start[:, None]
                       + jnp.arange(qp, dtype=jnp.int32)[None, :])  # [Bp, Qp]
        flat_pos = jnp.concatenate(
            [inp.decode_pos, prefill_pos.reshape(-1)])              # i32[T]
        flat_rows = jnp.concatenate([
            jnp.arange(bd, dtype=jnp.int32),
            bd + jnp.repeat(jnp.arange(bp, dtype=jnp.int32), qp),
        ])                                                          # i32[T]
        flat_tokens = jnp.concatenate(
            [inp.decode_tokens, inp.prefill_tokens.reshape(-1)])
        # Padding prefill tokens may carry positions beyond the page table's
        # columns; XLA's clamping gather would then alias them onto a REAL
        # page and clobber live KV. Route every invalid token's write to the
        # trash page explicitly.
        valid_flat = jnp.concatenate([
            jnp.ones(bd, bool),
            (jnp.arange(qp, dtype=jnp.int32)[None, :]
             < inp.prefill_len[:, None]).reshape(-1),
        ])
        slots = kv_ops.token_slots(inp.page_table, flat_pos, flat_rows,
                                   spec.page_size)                  # i32[T]
        # spread padding rows across the trash page so decode-step slot
        # vectors (T <= page_size) are strictly UNIQUE — that lets the
        # fused scatter claim unique_indices, without which XLA lowered
        # it as a full-cache select sweep at 7B geometry (2.6 ms/step on
        # a 4.3 GB pool, traced 2026-08-19; 0.03 ms as a sparse scatter)
        t_flat = flat_tokens.shape[0]
        trash = (spec.trash_page * spec.page_size
                 + jnp.arange(t_flat, dtype=jnp.int32) % spec.page_size)
        slots = jnp.where(valid_flat, slots, trash)
        slots_unique = t_flat <= spec.page_size

        pt_decode = inp.page_table[:bd]
        pt_prefill = inp.page_table[bd:]
        ctx_decode = inp.context_len[:bd]

        x = params["embedding"][flat_tokens].astype(compute_dtype)  # [T, D]

        # EVERY step DEFERS the cache write: decode rows enter attention
        # as an explicit self-term, prefill rows stream this step's K/V
        # from dense fresh inputs (page-aligned source split inside the
        # kernel), and ALL layers' K/V land in one fused scatter after
        # the forward — measured 3.8x cheaper than per-layer scatters
        # and off the layer-to-layer critical path.
        cache_dt = jnp.int8 if spec.quantized else spec.dtype

        def prep_new_kv(k, v):
            """Full-T packed new-KV rows in the CACHE dtype — the same
            bytes the end-of-step fused scatter writes, built once per
            layer so the layer stack carries 1-byte rows instead of bf16
            k/v pairs (at 7B prefill tiles the bf16 layer stack alone was
            ~2 GB of HLO temps + a ~1 GB remat copy -> HBM OOM on v5e).
            Returns (rows [T, KVH, 2*shd], scale rows [T, scale_lanes] or
            None, (qk, sk, qv, sv) quantized parts for the XLA reference
            path's dequant or None)."""
            if spec.quantized:
                qk, sk = kv_ops.quantize_kv(k, spec.quant_group)
                qv, sv = kv_ops.quantize_kv(v, spec.quant_group)
                rows = kv_ops.pack_kv_rows(qk, qv, spec)
                srows = kv_ops._pack_scale_rows(sk, sv, spec)
                return rows, srows, (qk, sk, qv, sv)
            rows = kv_ops.pack_kv_rows(
                k.astype(cache_dt), v.astype(cache_dt), spec)
            return rows, None, None

        def layer(x, p, li, kv_cache, kv_scale):
            h = rms_norm(x, p["attn_norm"], eps)
            t = x.shape[0]
            g = n_q // n_kv
            qkv = matmul(h, p, "wqkv",
                         out_dtype=compute_dtype).astype(compute_dtype)
            if attn_bias:
                qkv = qkv + p["bqkv"].astype(compute_dtype)
            # [T, KVH, G+2, hd]
            q = qkv[:, :, :g, :].reshape(t, n_q, hd)
            k = qkv[:, :, g, :]                    # [T, KVH, hd]
            v = qkv[:, :, g + 1, :]
            if not use_alibi:
                q = apply_rope(q, flat_pos, theta)
                k = apply_rope(k, flat_pos, theta)

            rows, srows, qparts = prep_new_kv(k, v)
            new_kv = (rows, srows)
            sl = kv_scale if spec.quantized else None
            if use_pallas:
                tail_kw = ({} if tail is None else dict(
                    tail_kv=tail[0], tail_scale=tail[1],
                    tail_len=tail[2]))
                attn_d = (decode_attn(
                    q[:bd], kv_cache, sl, pt_decode, ctx_decode, spec,
                    layer=li, fresh_k=k[:bd], fresh_v=v[:bd],
                    seq_block=seq_block,
                    interpret=interpret, alibi=slopes,
                    **tail_kw) if bd else
                    jnp.zeros((0, n_q, hd), compute_dtype))
                if bp:
                    # the deferred-prefill attention input is a slice of
                    # the same packed rows the scatter will write
                    fslab = rows[bd:].reshape(
                        bp, qp, n_kv, -1).transpose(0, 2, 1, 3)
                    fscale = (srows[bd:].reshape(bp, qp, -1)
                              if spec.quantized else None)
                    attn_p = prefill_attn(
                        q[bd:].reshape(bp, qp, n_q, hd), kv_cache, sl,
                        pt_prefill, inp.prefill_start, inp.prefill_len,
                        spec, layer=li, fresh_kv=fslab,
                        fresh_scale=fscale,
                        interpret=interpret, alibi=slopes)
                else:
                    attn_p = jnp.zeros((0, qp, n_q, hd), compute_dtype)
            else:
                attn_d = attn_ops.decode_attention_ref(
                    q[:bd], kv_cache, kv_scale, pt_decode, ctx_decode,
                    spec, layer=li, fresh_k=k[:bd], fresh_v=v[:bd],
                    alibi=slopes)
                if bp:
                    if spec.quantized:
                        # the reference path sees the same int8 roundtrip
                        # the kernel dequantizes — bit-comparable paths
                        qk, sk, qv, sv = qparts
                        kp = kv_ops.dequantize_kv(
                            qk[bd:].reshape(bp, qp, n_kv, hd),
                            sk[bd:].reshape(bp, qp, n_kv, -1),
                            spec.quant_group, compute_dtype)
                        vp = kv_ops.dequantize_kv(
                            qv[bd:].reshape(bp, qp, n_kv, hd),
                            sv[bd:].reshape(bp, qp, n_kv, -1),
                            spec.quant_group, compute_dtype)
                    else:
                        kp = k[bd:].reshape(bp, qp, n_kv, hd)
                        vp = v[bd:].reshape(bp, qp, n_kv, hd)
                    attn_p = attn_ops.prefill_attention_ref(
                        q[bd:].reshape(bp, qp, n_q, hd), kv_cache,
                        kv_scale, pt_prefill, inp.prefill_start,
                        inp.prefill_len, spec, layer=li,
                        fresh_k=kp, fresh_v=vp, alibi=slopes)
                else:
                    attn_p = jnp.zeros((0, qp, n_q, hd), compute_dtype)
            attn = jnp.concatenate(
                [attn_d.reshape(bd, n_q * hd),
                 attn_p.reshape(bp * qp, n_q * hd)])
            o = matmul(attn, p, "wo", out_dtype=compute_dtype)
            if attn_bias:
                o = o + p["bo"].astype(o.dtype)
            x = x + o.astype(compute_dtype)

            h = rms_norm(x, p["ffn_norm"], eps)
            act = gate_up_act(h, p, compute_dtype)
            down = matmul(act.astype(compute_dtype), p, "w_down",
                          out_dtype=compute_dtype)
            x = x + down.astype(compute_dtype)
            return x, kv_cache, kv_scale, new_kv

        new_kvs = []
        for li, p in enumerate(params["layers"]):
            x, kv_cache, kv_scale, new_kv = layer(
                x, p, li, kv_cache, kv_scale)
            new_kvs.append(new_kv)

        rows_l = jnp.stack([kv[0] for kv in new_kvs])  # [L,T,KVH,2*shd]
        srows_l = (jnp.stack([kv[1] for kv in new_kvs])
                   if spec.quantized else None)
        if not defer_scatter:
            kv_cache, kv_scale = kv_ops.append_kv_rows_block(
                kv_cache, kv_scale, rows_l, srows_l, slots, spec,
                unique=slots_unique)

        x = rms_norm(x, params["final_norm"], eps)

        # ---- logits at each row's last new token --------------------------
        last_idx = jnp.concatenate([
            jnp.arange(bd, dtype=jnp.int32),
            bd + jnp.arange(bp, dtype=jnp.int32) * qp
            + jnp.maximum(inp.prefill_len - 1, 0),
        ])                                                          # i32[B]
        hidden = x[last_idx]                                        # [B, D]
        if "lm_head_q" in params:
            logits = matmul(hidden, params, "lm_head")              # [B, V]
        else:
            logits = jnp.dot(hidden, params["lm_head"],
                             preferred_element_type=jnp.float32)    # [B, V]

        if enable_penalty:
            # padding rows carry the trash batch slot (host-side fill), so
            # the scatter-add needs no masking
            count_map = sampling_ops.update_count_map(
                count_map, flat_tokens, inp.batch_slots[flat_rows])
            logits = sampling_ops.apply_penalties(
                logits, count_map, inp.batch_slots, inp.sampling)

        tokens, logprobs = sampling_ops.sample_top_k_top_p(
            logits, inp.sampling, rng, top_k_cap=top_k_cap,
            greedy_only=greedy_only)
        out = StepOutput(tokens, logprobs, kv_cache, kv_scale, count_map,
                         logits if return_logits else None)
        if defer_scatter:
            return out, rows_l, srows_l, slots
        return out

    return step


def make_nll_fn(cfg: ModelConfig, spec: CacheSpec,
                quant_method: str = "none", attn_impl: str = "xla",
                quant_impl: str = "xla", return_logprobs: bool = False):
    """Teacher-forced token NLLs for perplexity evaluation.

    The accuracy harness behind the <=0.1 perplexity-delta target
    (BASELINE.md): runs the SAME serving forward (one prefill row over the
    paged cache, same kernels/quantization paths as serving) but computes
    logits at every position. Returns per-position NLL of the next token
    and a validity mask; with ``return_logprobs`` also the full [L-1, V]
    log-softmax (the accuracy harness computes per-position
    KL(fp32 || quantized) from it — the distortion probe that cannot be
    confounded by regularization effects on a small probe model).
    """
    from ..ops.pallas import paged_attention as pallas_attn

    n_q, n_kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps, theta = cfg.norm_eps, cfg.rope_theta
    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    quantized_w = quant_method in ("online_i8i8", "online_w4a8")
    use_pallas = attn_impl in ("pallas", "pallas_interpret")
    interpret = attn_impl == "pallas_interpret"
    matmul = _make_matmul(quant_method, quant_impl)
    use_alibi = cfg.position_encoding == "alibi"
    slopes = attn_ops.alibi_slopes(n_q) if use_alibi else None
    attn_bias = cfg.attn_bias
    gate_up_act = _make_gate_up_act(matmul, quantized_w)

    def nll(params, kv_cache, kv_scale, tokens, n_valid, page_table):
        """tokens i32[L] (padded), n_valid i32[], page_table i32[1, P] ->
        (nll f32[L-1], mask bool[L-1])."""
        L = tokens.shape[0]
        pos = jnp.arange(L, dtype=jnp.int32)
        rows = jnp.zeros(L, jnp.int32)
        slots = kv_ops.token_slots(page_table, pos, rows, spec.page_size)
        slots = jnp.where(pos < n_valid, slots,
                          spec.trash_page * spec.page_size)
        x = params["embedding"][tokens].astype(compute_dtype)
        start = jnp.zeros(1, jnp.int32)
        new_len = jnp.asarray(n_valid)[None]
        for li, p in enumerate(params["layers"]):
            h = rms_norm(x, p["attn_norm"], eps)
            g = n_q // n_kv
            qkv = matmul(h, p, "wqkv").astype(compute_dtype)
            if attn_bias:
                qkv = qkv + p["bqkv"].astype(compute_dtype)
            q = qkv[:, :, :g, :].reshape(L, n_q, hd)
            k = qkv[:, :, g, :]
            v = qkv[:, :, g + 1, :]
            if not use_alibi:
                q = apply_rope(q, pos, theta)
                k = apply_rope(k, pos, theta)
            kv_cache, kv_scale = kv_ops.append_kv(
                kv_cache, kv_scale if spec.quantized else None,
                k, v, slots, spec, layer=li)
            sl = kv_scale if spec.quantized else None
            if use_pallas:
                attn = pallas_attn.paged_prefill_attention(
                    q[None], kv_cache, sl, page_table, start, new_len,
                    spec, layer=li, interpret=interpret, alibi=slopes)[0]
            else:
                attn = attn_ops.prefill_attention_ref(
                    q[None], kv_cache, sl, page_table, start, new_len,
                    spec, layer=li, alibi=slopes)[0]
            o = matmul(attn.reshape(L, n_q * hd), p, "wo")
            if attn_bias:
                o = o + p["bo"].astype(o.dtype)
            x = x + o.astype(compute_dtype)
            h = rms_norm(x, p["ffn_norm"], eps)
            act = gate_up_act(h, p)
            down = matmul(act.astype(compute_dtype), p, "w_down")
            x = x + down.astype(compute_dtype)
        x = rms_norm(x, params["final_norm"], eps)
        if "lm_head_q" in params:
            logits = matmul(x, params, "lm_head")                # [L, V]
        else:
            logits = jnp.dot(x, params["lm_head"],
                             preferred_element_type=jnp.float32)  # [L, V]
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        targets = tokens[1:]
        nll_all = -jnp.take_along_axis(
            logprobs[:-1], targets[:, None], axis=-1)[:, 0]
        mask = jnp.arange(L - 1) < (n_valid - 1)
        if return_logprobs:
            return nll_all, mask, logprobs[:-1].astype(jnp.float32)
        return nll_all, mask

    return nll


def make_multi_step_fn(cfg: ModelConfig, spec: CacheSpec, num_steps: int,
                       block_tail: str = "auto", **step_kwargs):
    """N decode steps in ONE jitted program (``lax.scan``), sampled tokens
    feeding back on device.

    The reference's loop is one kernel launch bundle + one D2H sync per
    token (``llm_engine.cc:171-236``); on TPU the dispatch+fetch round
    trip is the decode bottleneck long before the MXU is, so decode-only
    phases run in blocks of ``num_steps`` and the host observes tokens
    once per block. Stop-token checks lag by up to ``num_steps - 1``
    steps (bounded waste, chosen by the scheduler); requests that finish
    mid-block keep writing into their own (already reserved) pages, which
    are never read again.

    Only decode rows participate (prefill shapes must be the empty
    bucket). Returns (tokens [N, B], logprobs [N, B], cache, scale, cm).
    """
    step = make_step_fn(cfg, spec, **step_kwargs)
    attn_impl = step_kwargs.get("attn_impl", "xla")
    # "auto" = per-step scatters: hardware A/B (BASELINE.md round 3)
    # showed block-tail LOSES 5.3% at 7B b32 and ~3% at TinyLlama b64 —
    # the per-step fused scatter it replaces costs 0.02-0.09 ms/step
    # (microbench_scatter_7b.py), less than the tail phase + side-buffer
    # updates. "on" keeps the mode for explicit experiments.
    use_tail = (attn_impl in ("pallas", "pallas_interpret")
                and block_tail == "on")
    assert block_tail != "on" or use_tail, (
        "block_tail='on' requires pallas attention")

    def multi_step(params, kv_cache, kv_scale, count_map,
                   inp: StepInput, rng: jax.Array):
        assert inp.prefill_tokens.shape[0] == 0, (
            "multi-step blocks are decode-only")

        # PYTHON-unrolled, not lax.scan: a scanned carry holding the KV
        # cache ping-pongs between two buffers, costing a full cache copy
        # per iteration (measured: block step time scales with pool size,
        # 35 ms/step at a 6 GB pool vs 0.6 ms at 1 GB). Straight-line
        # scatters on donated buffers update in place.
        tokens, pos, ctx = inp.decode_tokens, inp.decode_pos, inp.context_len
        toks_list, lps_list = [], []
        if not use_tail:
            # XLA-attention path: per-step scatter (reference behavior)
            for i in range(num_steps):
                it = inp._replace(decode_tokens=tokens, decode_pos=pos,
                                  context_len=ctx)
                out = step(params, kv_cache, kv_scale, count_map, it,
                           jax.random.fold_in(rng, i))
                kv_cache, kv_scale, count_map = (out.kv_cache,
                                                 out.kv_scale,
                                                 out.count_map)
                tokens = out.tokens
                pos, ctx = pos + 1, ctx + 1
                toks_list.append(out.tokens)
                lps_list.append(out.logprobs)
            return (jnp.stack(toks_list), jnp.stack(lps_list),
                    kv_cache, kv_scale, count_map)

        # BLOCK-TAIL mode (pallas attention): the block's own K/V lives
        # in a dense side buffer the attention kernels read as an extra
        # online-softmax phase, and the paged cache takes ONE fused
        # scatter at block end. Per-step scatters lowered as full-cache
        # select sweeps at 7B geometry (2.6 ms/step on a 4.3 GB pool,
        # traced 2026-08-19) — once per block amortizes that 16x
        # regardless of XLA's scatter lowering choice.
        b = tokens.shape[0]
        n_kv_l = cfg.num_kv_heads
        cache_dt = jnp.int8 if spec.quantized else spec.dtype
        tkv = jnp.zeros((cfg.num_layers, b, n_kv_l, num_steps,
                         spec.row_lanes), cache_dt)
        tsr = (jnp.zeros((cfg.num_layers, b, num_steps,
                          spec.scale_lanes), jnp.bfloat16)
               if spec.quantized else None)
        slots_list = []
        for i in range(num_steps):
            it = inp._replace(decode_tokens=tokens, decode_pos=pos,
                              context_len=ctx)
            tail = (None if i == 0 else
                    (tkv, tsr, jnp.full((1,), i, jnp.int32)))
            out, rows_l, srows_l, slots_i = step(
                params, kv_cache, kv_scale, count_map, it,
                jax.random.fold_in(rng, i), tail=tail,
                defer_scatter=True)
            count_map = out.count_map
            # rows_l [L, B, KVH, 2*shd] -> tail slot i (static index:
            # a linear DUS chain XLA keeps in place)
            tkv = tkv.at[:, :, :, i, :].set(rows_l)
            if spec.quantized:
                tsr = tsr.at[:, :, i, :].set(srows_l)
            slots_list.append(slots_i)
            tokens = out.tokens
            pos, ctx = pos + 1, ctx + 1
            toks_list.append(out.tokens)
            lps_list.append(out.logprobs)

        # one fused scatter for the whole block, step-major to match the
        # concatenated slots (trash-padding slots repeat across steps,
        # so no unique claim here)
        rows_cat = tkv.transpose(0, 3, 1, 2, 4).reshape(
            cfg.num_layers, num_steps * b, n_kv_l, spec.row_lanes)
        srows_cat = (tsr.transpose(0, 2, 1, 3).reshape(
            cfg.num_layers, num_steps * b, spec.scale_lanes)
            if spec.quantized else None)
        kv_cache, kv_scale = kv_ops.append_kv_rows_block(
            kv_cache, kv_scale, rows_cat, srows_cat,
            jnp.concatenate(slots_list), spec)
        return (jnp.stack(toks_list), jnp.stack(lps_list),
                kv_cache, kv_scale, count_map)

    return multi_step
